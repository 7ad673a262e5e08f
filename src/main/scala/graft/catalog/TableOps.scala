package graft.catalog

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, MetadataBuilder, StructField, StructType}

/** Table-level operations over the [[FsStore]]: create / load / commit
  * / snapshot append & overwrite / time-travel resolution.
  *
  * Layout per table (all under the catalog warehouse):
  * {{{
  *   <ns...>/<table>/metadata/v<N>.metadata.json    — versioned states
  *   <ns...>/<table>/metadata/version-hint.text     — best-effort hint
  *   <ns...>/<table>/metadata/manifest-<snap>.json  — data-file list
  *   <ns...>/<table>/data/w-<uuid>/part-*.parquet   — one dir per write
  * }}}
  * Every write lands in a fresh `w-<uuid>` directory, so the new-file
  * set of a commit is exactly that directory's listing — concurrent
  * writers never observe each other's files, and failed writes leave
  * orphans that no manifest references (cleanable later, never read).
  */
final class TableOps(private[graft] val store: FsStore) {

  def metadataDir(tableDir: Path): Path = new Path(tableDir, "metadata")
  def dataDir(tableDir: Path): Path = new Path(tableDir, "data")

  /** Data-file format of a table (`graft.format` property): "parquet"
    * (default) or "orc" (C58). Delete files are always parquet —
    * graft-internal state, not user data. */
  def dataFormat(meta: TableMetadata): String =
    meta.properties.getOrElse("graft.format", "parquet")
  private def dataFormat(tableDir: Path): String =
    load(tableDir).map(m => dataFormat(m._2)).getOrElse("parquet")
  private def isDataFile(name: String): Boolean =
    name.endsWith(".parquet") || name.endsWith(".orc")

  def exists(tableDir: Path): Boolean = store.currentVersion(metadataDir(tableDir)).isDefined

  def load(tableDir: Path): Option[(Int, TableMetadata)] =
    store.currentVersion(metadataDir(tableDir)).map { case (v, json) =>
      (v, MetadataJson.fromJson(json))
    }

  def create(tableDir: Path, meta: TableMetadata): TableMetadata = {
    if (exists(tableDir))
      throw new CommitFailedException(s"table already exists at $tableDir")
    // bucket-hash version marker: every __pt_ value this table will
    // hold comes from the current Iceberg-spec hash; unmarked tables
    // (created by older builds) keep hash-dependent optimizations off
    // — see Transforms.BucketHashProp
    val stamped =
      if (Transforms.anyBucket(meta.specs) &&
          !meta.properties.contains(Transforms.BucketHashProp))
        meta.copy(properties =
          meta.properties + (Transforms.BucketHashProp -> Transforms.BucketHashCurrent))
      else meta
    if (!store.publish(metadataDir(tableDir), 0, MetadataJson.toJson(stamped)))
      throw new CommitFailedException(s"concurrent create of table at $tableDir")
    stamped
  }

  /** The commit protocol (reference: denali routes/tables.go updateTable
    * → logic/tx.go): check every requirement against the CURRENT state,
    * apply the updates, publish v+1 with a CAS; a lost race surfaces as
    * CommitFailedException for the caller to retry on fresh state. */
  def commit(
      tableDir: Path,
      requirements: Seq[Requirement],
      updates: Seq[MetadataUpdate]): TableMetadata = {
    val current = load(tableDir)
    requirements.foreach { r =>
      r.check(current.map(_._2)).foreach(msg => throw new CommitFailedException(msg))
    }
    val (v, meta) = current.getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val updated = updates.foldLeft(meta)((m, u) => u.apply(m))
    val (withLog, fullLog) = appendMetadataLog(tableDir, v, meta, updated)
    if (!store.publish(metadataDir(tableDir), v + 1, MetadataJson.toJson(withLog)))
      throw new CommitFailedException(
        s"concurrent commit on $tableDir: version ${v + 1} already published")
    // Optionally reclaim the metadata files that just fell off the log
    // (only after the new version is durably published; readers resolve
    // the CURRENT version, so dropped historical files are only served
    // to metadata-log queries, which see the trimmed log).
    if (meta.properties.get("graft.metadata.delete-after-commit").contains("true"))
      fullLog.dropRight(maxLogEntries(meta)).foreach(e =>
        scala.util.Try(store.delete(new Path(e.metadataFile))))
    withLog
  }

  private def maxLogEntries(meta: TableMetadata): Int =
    meta.properties.get("graft.metadata.log.max-entries")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(100)

  /** Stamp `updated` with now + the metadata-log entry for the version
    * being superseded, trimmed per table property (metadata-log
    * compaction: at high commit rates an unbounded log makes every
    * subsequent metadata file larger — O(commits) growth per commit;
    * Iceberg: write.metadata.previous-versions-max). Returns the
    * stamped metadata and the untrimmed log (for delete-after-commit).
    */
  private[catalog] def appendMetadataLog(
      tableDir: Path,
      fromVersion: Int,
      prev: TableMetadata,
      updated: TableMetadata): (TableMetadata, Seq[MetadataLogEntry]) = {
    val prevFile = store.versionPath(metadataDir(tableDir), fromVersion).toString
    val stamped = updated.copy(lastUpdatedMs = System.currentTimeMillis())
    val fullLog = stamped.metadataLog :+ MetadataLogEntry(prevFile, prev.lastUpdatedMs)
    (stamped.copy(metadataLog = fullLog.takeRight(maxLogEntries(prev))), fullLog)
  }

  /** Raw CAS publish of `meta` as version `fromVersion + 1` — the
    * transaction coordinator's primitive ([[Transactions]]); regular
    * single-table commits go through [[commit]]. */
  private[catalog] def publishVersion(
      tableDir: Path, fromVersion: Int, meta: TableMetadata): Boolean =
    store.publish(metadataDir(tableDir), fromVersion + 1, MetadataJson.toJson(meta))

  /** Build the updates of a snapshot commit (manifest written as a
    * side effect) against an already-read state — the per-attempt
    * body [[Transactions.appendAll]] runs inside its commit loop. */
  private[catalog] def buildSnapshotUpdates(
      tableDir: Path,
      meta: TableMetadata,
      newFiles: Seq[String],
      operation: String): Seq[MetadataUpdate] = {
    val parent = meta.currentSnapshot
    val newSeq = meta.lastSequenceNumber + 1
    val (newRel, lineageUpd) = stampRowIds(meta, collectStats(tableDir, newFiles)
      .map(e => e.copy(path = relativize(tableDir, e.path), seq = Some(newSeq)))
      .filterNot(_.rows.contains(0L))) // empty range partitions write 0-row files: pure metadata waste
    val snapId = newSnapshotId()
    val (manifestName, total) = operation match {
      case "append" =>
        writeManifestFor(tableDir, meta, snapId, parent, Some(newRel),
          parent.map(rawSnapshotFiles(tableDir, _)).getOrElse(Seq.empty) ++ newRel)
      case "overwrite" =>
        writeManifestFor(tableDir, meta, snapId, parent, None, newRel)
      case other => throw new IllegalArgumentException(s"unknown snapshot operation: $other")
    }
    val snap = Snapshot(
      snapshotId = snapId,
      parentSnapshotId = parent.map(_.snapshotId),
      sequenceNumber = newSeq,
      timestampMs = System.currentTimeMillis(),
      operation = operation,
      manifest = manifestName,
      summary = Map(
        "added-data-files" -> newFiles.size.toString,
        "total-data-files" -> total.toString),
      schemaId = meta.currentSchemaId)
    Seq(
      MetadataUpdate.AddSnapshot(snap),
      MetadataUpdate.SetSnapshotRef("main", snapId, "branch")) ++ lineageUpd
  }

  // ---------- snapshots ----------

  private def newSnapshotId(): Long = math.abs(UUID.randomUUID().getMostSignificantBits)

  /** Manifests store paths RELATIVE to the table dir, so table rename
    * (a directory move) never invalidates them; anything outside the
    * table dir (e.g. register of external files) stays absolute. */
  private def relativize(tableDir: Path, file: String): String = {
    val base = tableDir.toUri.getPath
    val fp = new Path(file).toUri.getPath
    if (fp.startsWith(base + "/")) fp.substring(base.length + 1) else file
  }

  private def absolutize(tableDir: Path, entry: String): String =
    if (entry.startsWith("/") || entry.contains(":/")) entry
    else new Path(tableDir, entry).toString

  /** Commit data files as a new snapshot. `operation` is "append"
    * (files add to the current snapshot's) or "overwrite" (files
    * replace). Footer stats are collected here, on the handful of NEW
    * files only — O(new files) driver work per commit, never a
    * re-scan of the table. */
  def commitFiles(
      tableDir: Path,
      newFiles: Seq[String],
      operation: String,
      requirements: Seq[Requirement] = Seq.empty,
      maxRetries: Int = 20): TableMetadata = {
    // Snapshot commits COMMUTE with concurrent snapshot commits (an
    // append re-applies cleanly on the winner's state; an overwrite is
    // last-writer-wins by definition), so a lost CAS race is retried
    // against fresh state — same client-retry behavior the reference's
    // REST protocol prescribes on 409. Explicit requirements are
    // re-checked each attempt and still fail the commit if violated.
    var attempt = 0
    while (true) {
      try return commitFilesOnce(tableDir, newFiles, operation, requirements)
      catch {
        case e: CommitFailedException if attempt < maxRetries &&
            (e.getMessage.contains("concurrent commit") ||
             e.getMessage.contains("assert-ref-snapshot-id")) =>
          attempt += 1
          // linear backoff de-synchronizes N-way contenders; losers of
          // round k wait progressively longer than fresh winners
          Thread.sleep(15L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write-audit-publish: commit snapshots to a side branch (main
    * untouched), audit via `read(ref=branch)`, then [[fastForward]]
    * main onto the branch head. */
  def commitFilesToBranch(
      tableDir: Path,
      newFiles: Seq[String],
      operation: String,
      branch: String,
      maxRetries: Int = 20): TableMetadata = {
    var attempt = 0
    while (true) {
      try return commitFilesOnce(tableDir, newFiles, operation, Seq.empty, branch)
      catch {
        case e: CommitFailedException if attempt < maxRetries &&
            (e.getMessage.contains("concurrent commit") ||
             e.getMessage.contains("assert-ref-snapshot-id")) =>
          attempt += 1
          Thread.sleep(15L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Point `toRef` at `fromRef`'s head (fast-forward publish; moving
    * "main" also moves the current snapshot + log). */
  def fastForward(tableDir: Path, toRef: String, fromRef: String): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val head = meta.snapshotByRef(fromRef).getOrElse(
      throw new CommitFailedException(s"ref '$fromRef' has no snapshot"))
    commit(tableDir,
      Seq(Requirement.AssertRefSnapshotId(fromRef, Some(head.snapshotId))),
      Seq(MetadataUpdate.SetSnapshotRef(toRef, head.snapshotId, "branch")))
  }

  /** C87 — atomic REPLACE TABLE AS SELECT: ONE CAS commit installs a
    * new current schema (fresh field ids above the table's
    * lastColumnId — prior snapshots keep reading through THEIR schema
    * ids, so the whole history stays time-travelable across the
    * replace), a new default partition spec, the new table
    * properties, and the staged query result as an overwrite
    * snapshot. Readers see the old table or the complete new one,
    * never the dropped/partial window a non-atomic drop+create
    * exposes. Composed entirely from the reference's commit
    * vocabulary (add-schema / set-current-schema / add-spec /
    * set-default-spec / set-properties / add-snapshot /
    * set-snapshot-ref applied in one transaction — logic/updates.go
    * semantics); pending MOR deletes die with the data they masked. */
  def replaceTableData(
      tableDir: Path,
      sparkSchema: org.apache.spark.sql.types.StructType,
      specPairs: Seq[(String, String)],
      newProps: Map[String, String],
      newFiles: Seq[String],
      maxRetries: Int = 20): TableMetadata = {
    var attempt = 0
    while (true) {
      try {
        val (_, meta) = load(tableDir).getOrElse(
          throw new CommitFailedException(s"table does not exist at $tableDir"))
        val newSchema = SchemaBridge.fromSpark(sparkSchema, meta.lastColumnId + 1)
          .copy(schemaId = meta.schemas.map(_.schemaId).max + 1)
        val newSpecFields = specPairs.zipWithIndex.map { case ((cn, tr), i) =>
          val src = newSchema.fields.find(_.name == cn).getOrElse(
            throw new IllegalArgumentException(s"partition column $cn not in schema"))
          PartitionField(src.id, meta.lastPartitionId + 1 + i, cn, tr)
        }
        val newSpec = PartitionSpec(meta.specs.map(_.specId).max + 1, newSpecFields)
        val newSeq = meta.lastSequenceNumber + 1
        // C70: stamp row-lineage id blocks against the POST-replace
        // property set (SetProperties merges, so lineage enabled
        // before the replace stays enabled unless newProps unsets it).
        // Skipping this — as commitFilesOnce never does — would commit
        // files with no firstRowId and no next-row-id advance,
        // breaking _row_id reads after the replace.
        val postMeta = meta.copy(properties = meta.properties ++ newProps)
        val (entries, lineageUpd) = stampRowIds(postMeta, collectStats(tableDir, newFiles)
          .map(e => e.copy(path = relativize(tableDir, e.path), seq = Some(newSeq)))
          .filterNot(_.rows.contains(0L)))
        val snapId = newSnapshotId()
        val parent = meta.currentSnapshot
        val (manifestName, total) =
          writeManifestFor(tableDir, meta, snapId, parent, None, entries)
        val snap = Snapshot(
          snapshotId = snapId,
          parentSnapshotId = parent.map(_.snapshotId),
          sequenceNumber = newSeq,
          timestampMs = System.currentTimeMillis(),
          operation = "overwrite",
          manifest = manifestName,
          summary = Map(
            "added-data-files" -> newFiles.size.toString,
            "total-data-files" -> total.toString,
            "replace" -> "true"),
          schemaId = newSchema.schemaId)
        return commit(tableDir,
          Seq(Requirement.AssertRefSnapshotId("main",
            meta.refs.get("main").map(_.snapshotId))),
          Seq(
            MetadataUpdate.AddSchema(newSchema),
            MetadataUpdate.SetCurrentSchema(newSchema.schemaId),
            MetadataUpdate.AddSpec(newSpec),
            MetadataUpdate.SetDefaultSpec(newSpec.specId),
            MetadataUpdate.SetProperties(newProps),
            MetadataUpdate.AddSnapshot(snap),
            MetadataUpdate.SetSnapshotRef("main", snapId, "branch"))
            // next-row-id advance last so it wins over newProps
            ++ lineageUpd)
      } catch {
        case e: CommitFailedException if attempt < maxRetries &&
            (e.getMessage.contains("concurrent commit") ||
             e.getMessage.contains("assert-ref-snapshot-id")) =>
          attempt += 1
          Thread.sleep(15L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** C86 — cherry-pick: re-apply the file-level additions of
    * `snapshotId` (typically a snapshot staged on a write-audit-publish
    * branch) onto the CURRENT main head as a fresh append commit. This
    * publishes exactly one audited snapshot without moving main onto
    * the branch lineage ([[fastForward]] would take everything on the
    * branch) — the Iceberg `cherrypick_snapshot` semantics. Only
    * append snapshots qualify: an append's effect is position- and
    * order-independent (its files can land on any newer base), whereas
    * replaying an overwrite or row-level delete against a diverged
    * head could resurrect or double-delete rows. Re-picking a snapshot
    * whose files are already live is refused rather than silently
    * duplicating rows. */
  def cherryPick(tableDir: Path, snapshotId: Long, maxRetries: Int = 20): TableMetadata = {
    var attempt = 0
    while (true) {
      val (_, meta) = load(tableDir).getOrElse(
        throw new CommitFailedException(s"table does not exist at $tableDir"))
      val snap = meta.snapshots.find(_.snapshotId == snapshotId).getOrElse(
        throw new IllegalArgumentException(s"snapshot $snapshotId not found"))
      if (snap.operation != "append")
        throw new IllegalArgumentException(
          s"cherry-pick supports append snapshots only; $snapshotId is '${snap.operation}'")
      val byId = meta.snapshots.map(s => s.snapshotId -> s).toMap
      // The snapshot's own additions = its files minus its PARENT's.
      // If the parent has been expired we cannot reconstruct that
      // delta — the cumulative list would re-append (and resurrect)
      // every inherited file — so refuse rather than guess.
      val parentPaths = snap.parentSnapshotId match {
        case None => Set.empty[String]
        case Some(pid) => byId.get(pid) match {
          case Some(p) => snapshotFiles(tableDir, p).toSet
          case None => throw new IllegalArgumentException(
            s"cannot cherry-pick $snapshotId: its parent $pid has been expired, " +
              "so the snapshot's own file additions cannot be determined")
        }
      }
      val added = snapshotEntries(tableDir, snap)
        .filter(e => e.isData && !parentPaths.contains(e.path))
      if (added.isEmpty)
        throw new IllegalArgumentException(
          s"snapshot $snapshotId adds no data files — nothing to cherry-pick")
      val live = meta.currentSnapshot
        .map(s => snapshotFiles(tableDir, s).toSet).getOrElse(Set.empty[String])
      val dup = added.map(_.path).filter(live.contains)
      if (dup.nonEmpty)
        throw new CommitFailedException(
          s"cherry-pick of $snapshotId would double-apply ${dup.size} file(s) " +
            s"already in the current state (e.g. ${dup.head})")
      // Tie the dup check to the commit: assert main is STILL the head
      // the check ran against. A lost race re-runs the whole
      // check-and-append from fresh state (a concurrent fast_forward
      // or second pick of this snapshot then trips the dup refusal)
      // instead of blindly re-appending onto the winner.
      try return commitFiles(tableDir, added.map(_.path), "append",
        Seq(Requirement.AssertRefSnapshotId("main",
          meta.refs.get("main").map(_.snapshotId))),
        maxRetries = 0)
      catch {
        case e: CommitFailedException if attempt < maxRetries &&
            (e.getMessage.contains("concurrent commit") ||
             e.getMessage.contains("assert-ref-snapshot-id")) =>
          attempt += 1
          Thread.sleep(15L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** C70 — row lineage commit protocol: when the table property
    * `graft.row-lineage.enabled` is set, every committed data file is
    * stamped with the table-unique id of its first row, and the SAME
    * commit advances `graft.row-lineage.next-row-id` past the block —
    * the CAS parent guard makes the (stamp, advance) pair atomic, and
    * a lost race restamps from fresh state in the retry loop, so ids
    * are never reused across concurrent committers. O(new files)
    * driver work; ids for individual rows are only ever computed
    * executor-side as `firstRowId + ordinal`. */
  private def stampRowIds(meta: TableMetadata, entries: Seq[DataFileEntry])
      : (Seq[DataFileEntry], Seq[MetadataUpdate]) = {
    if (!lineageEnabled(meta) || !entries.exists(_.isData)) return (entries, Seq.empty)
    var next = meta.properties.getOrElse(NextRowIdProp, "0").toLong
    val stamped = entries.map { e =>
      if (!e.isData) e
      // a rewritten file carrying the materialized __row_id column
      // already has its ids — allocating a block would only burn id
      // space (the physical column wins on read anyway)
      else if (e.stats.contains(RowLineage.PhysCol)) e
      else {
        val rows = e.rows.getOrElse(throw new IllegalStateException(
          s"row lineage requires a footer row count for ${e.path}"))
        val s = e.copy(firstRowId = Some(next)); next += rows; s
      }
    }
    if (next == meta.properties.getOrElse(NextRowIdProp, "0").toLong)
      (stamped, Seq.empty)
    else
      (stamped, Seq(MetadataUpdate.SetProperties(Map(NextRowIdProp -> next.toString))))
  }

  def lineageEnabled(meta: TableMetadata): Boolean =
    meta.properties.get(RowLineage.EnabledProp).contains("true")
  private def NextRowIdProp = RowLineage.NextIdProp

  /** C70 — lineage-preserving compaction: rewrites the current
    * snapshot like [[compact]], but first MATERIALIZES every row's
    * `_row_id` into the hidden physical [[RowLineage.PhysCol]] column
    * of the new files, so ids survive the row permutation (and every
    * later rewrite that keeps physical columns). One distributed read
    * + one write — the id column adds 8 bytes/row. */
  def compactLineage(spark: SparkSession, tableDir: Path, numFiles: Int = 0): TableMetadata = {
    import org.apache.spark.sql.functions.col
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    require(lineageEnabled(meta), "compactLineage requires graft.row-lineage.enabled=true")
    val table = new GraftTable(tableDir.toString, tableDir, meta, this, None)
    val df = org.apache.spark.sql.execution.datasources.GraftBridge.ofRows(spark, table)
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    val withIds = df.select(
      schema.fieldNames.toIndexedSeq.map(col) :+ col("_row_id").as(RowLineage.PhysCol): _*)
    write(tableDir, withIds, "overwrite", if (numFiles > 0) Some(numFiles) else None)
  }

  private def commitFilesOnce(
      tableDir: Path,
      newFiles: Seq[String],
      operation: String,
      requirements: Seq[Requirement],
      branch: String = "main"): TableMetadata = {
    val cm = sys.env.get("GRAFT_COMMIT_MARKS").contains("1")
    var cmT = System.nanoTime()
    def cmark(p: String): Unit = if (cm) {
      val t = System.nanoTime()
      System.err.println(f"[commitOnce] $p%-12s ${(t - cmT) / 1e9}%.3f")
      cmT = t
    }
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    cmark("load")
    val parent =
      if (branch == "main") meta.currentSnapshot
      else meta.snapshotByRef(branch).orElse(meta.currentSnapshot)
    val newSeq = meta.lastSequenceNumber + 1
    val (newRel, lineageUpd) = stampRowIds(meta, collectStats(tableDir, newFiles)
      .map(e => e.copy(path = relativize(tableDir, e.path), seq = Some(newSeq)))
      .filterNot(_.rows.contains(0L))) // empty range partitions write 0-row files: pure metadata waste
    cmark("stats")
    val snapId = newSnapshotId()
    val (manifestName, total) = operation match {
      case "append" =>
        writeManifestFor(tableDir, meta, snapId, parent, Some(newRel),
          parent.map(rawSnapshotFiles(tableDir, _)).getOrElse(Seq.empty) ++ newRel)
      case "overwrite" =>
        writeManifestFor(tableDir, meta, snapId, parent, None, newRel)
      case other => throw new IllegalArgumentException(s"unknown snapshot operation: $other")
    }
    cmark("manifest")
    val snap = Snapshot(
      snapshotId = snapId,
      parentSnapshotId = parent.map(_.snapshotId),
      sequenceNumber = meta.lastSequenceNumber + 1,
      timestampMs = System.currentTimeMillis(),
      operation = operation,
      manifest = manifestName,
      summary = Map(
        "added-data-files" -> newFiles.size.toString,
        "total-data-files" -> total.toString),
      schemaId = meta.currentSchemaId)
    // The manifest's cumulative file list was computed from the state
    // read above; assert that state is STILL current at commit time,
    // or a concurrent snapshot's files would silently drop out of the
    // new manifest. A violation aborts this attempt and the retry in
    // [[commitFiles]] recomputes from fresh state.
    val parentGuard =
      if (branch == "main")
        Requirement.AssertRefSnapshotId("main", parent.map(_.snapshotId))
      else // side branch: guard on the branch head only (may be absent)
        Requirement.AssertRefSnapshotId(branch,
          meta.refs.get(branch).map(_.snapshotId))
    val res = commit(tableDir, requirements :+ parentGuard, Seq(
      MetadataUpdate.AddSnapshot(snap),
      MetadataUpdate.SetSnapshotRef(branch, snapId, "branch")) ++ lineageUpd)
    cmark("commit")
    res
  }

  /** Manifest cache: a manifest file is named by its snapshot id and
    * NEVER rewritten after publish, so caching by path is sound for
    * the table's whole lifetime (rename moves the table dir → new
    * keys; expiration deletes manifests → stale entries are harmless
    * immutable content). Bounds repeated snapshot resolution — every
    * scan, time travel, stream delta and maintenance pass — to one
    * read per manifest per JVM instead of one per operation. With
    * segmented manifests (C66) the leaf SEGMENTS are what's cached
    * hot: sibling snapshots share unchanged segments, so resolving a
    * new snapshot re-reads only its one new segment. */
  private val manifestCache =
    new java.util.LinkedHashMap[String, Seq[DataFileEntry]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[DataFileEntry]]): Boolean = size > 1024
    }
  // path → Some(segments) for list manifests, None for leaf manifests
  private val segmentListCache =
    new java.util.LinkedHashMap[String, Option[Seq[String]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[Seq[String]]]): Boolean = size > 1024
    }

  // ---------- commit-time footer stats ----------

  /** Footer-stat cache keyed by absolute file path. Every write lands
    * in a unique `w-<uuid>` directory and data files are NEVER
    * mutated after that, so path-keyed caching is sound for the
    * table's lifetime — and it is what makes a lost CAS race cheap: a
    * commit retry re-checks requirements against fresh state but
    * never re-opens a footer it already read. */
  private val statsCache =
    new java.util.LinkedHashMap[String, DataFileEntry](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFileEntry]): Boolean = size > 65536
    }

  /** File-count threshold above which footer stats are collected by a
    * distributed Spark job instead of a driver loop. Below it the job
    * overhead (task scheduling, closure ship) exceeds the footer
    * reads themselves. */
  private val distributedStatsThreshold = 16

  /** Collect footer stats for `files` (absolute paths), each footer
    * read AT MOST ONCE per process: cached entries are reused; misses
    * are read by ONE distributed Spark job over the file list when a
    * session is active and the miss set is large (a 100-TB commit
    * adds 10⁴–10⁵ files; at 10–100 ms per object-store footer open, a
    * sequential driver loop would serialize minutes-to-hours into
    * EVERY commit — the scrape belongs on the executors, the way
    * Iceberg writers return DataFile stats from tasks), else read
    * sequentially on the driver (metadata-only and small commits).
    * Unreadable files degrade to stat-less entries, never fail the
    * commit. Returned entries carry absolute paths and no seq. */
  private[catalog] def collectStats(tableDir: Path, files: Seq[String]): Seq[DataFileEntry] = {
    val cached: Map[String, Option[DataFileEntry]] =
      statsCache.synchronized(files.map(f => f -> Option(statsCache.get(f))).toMap)
    val misses = files.filter(f => cached(f).isEmpty)
    val conf = store.fs(tableDir).getConf
    def sequential(): Map[String, DataFileEntry] =
      misses.map(f => f -> scala.util.Try(Stats.collect(conf, f))
        .getOrElse(DataFileEntry(f))).toMap
    val fresh: Map[String, DataFileEntry] =
      if (misses.isEmpty) Map.empty
      // getActiveSession is thread-local; fall through to the
      // process-wide default so commits issued from pool threads
      // still take the distributed path.
      else SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
        case Some(spark) if misses.size >= distributedStatsThreshold =>
          val sconf = new SerializableHadoopConf(conf)
          val slices = math.min(misses.size, spark.sparkContext.defaultParallelism)
          // Per-file read failures degrade to stat-less entries inside
          // the task; a JOB-level failure (stage abort, executor loss)
          // must not fail the commit either — retry on the driver.
          scala.util.Try {
            spark.sparkContext.parallelize(misses, slices)
              .map(f => f -> scala.util.Try(Stats.collect(sconf.value, f))
                .getOrElse(DataFileEntry(f)))
              .collect().toMap
          }.getOrElse(sequential())
        case other =>
          if (other.isEmpty && misses.size >= distributedStatsThreshold)
            System.err.println(s"[graft] collectStats: no SparkSession visible from " +
              s"this thread; reading ${misses.size} footers sequentially on the driver")
          sequential()
      }
    // Cache only successful reads (rows populated): a transiently
    // unreadable footer must be retried by the NEXT commit, not pinned
    // stat-less for the process lifetime (that would silently disable
    // C82/C83 metadata pushdown for the file forever).
    statsCache.synchronized(fresh.foreach { case (k, v) =>
      if (v.rows.isDefined) statsCache.put(k, v)
    })
    files.map(f => cached(f).getOrElse(fresh(f)))
  }

  // ---------- segmented manifests (C66) ----------

  /** Segmented layout is the default: per-commit metadata cost is
    * O(added files), the property that keeps a 1M-file table's append
    * path from rewriting a 1M-entry manifest every commit. Settable
    * per table for byte-stable legacy layouts. */
  private def segmentedEnabled(meta: TableMetadata): Boolean =
    meta.properties.getOrElse("graft.manifest.segments", "true").toBoolean
  /** Entries per segment when a full manifest (overwrite / rewrite) is
    * chunked — bounds both single-segment read size and rewrite
    * parallelism. */
  private def segmentSize(meta: TableMetadata): Int =
    meta.properties.getOrElse("graft.manifest.segment-size", "5000").toInt
  /** Append auto-merge threshold: once a snapshot references this many
    * segments, the next append folds them into balanced segments
    * instead of chaining (Iceberg's merge-append). Keeps read
    * amplification bounded at O(maxSegments) small reads without
    * requiring explicit maintenance; cost is amortized O(total/max)
    * per commit. */
  private def maxSegments(meta: TableMetadata): Int =
    meta.properties.getOrElse("graft.manifest.max-segments", "64").toInt

  /** Parse a manifest file's segment list (cached): Some for list
    * manifests, None for leaf entry manifests. */
  /** Manifest names are metadata-dir-relative for graft-written
    * snapshots; an externally-committed (REST add-snapshot) snapshot
    * references its spec-Iceberg Avro manifest list by FULL path. */
  private def manifestPath(tableDir: Path, name: String): Path =
    if (name.startsWith("/") || name.contains(":/")) new Path(name)
    else new Path(metadataDir(tableDir), name)

  private def segmentsOf(tableDir: Path, name: String): Option[Seq[String]] = {
    if (name.endsWith(".avro")) return None // spec Avro list = one leaf
    val key = manifestPath(tableDir, name).toString
    segmentListCache.synchronized(Option(segmentListCache.get(key))).getOrElse {
      val parsed = MetadataJson.manifestSegments(
        store.readString(manifestPath(tableDir, name)))
      segmentListCache.synchronized(segmentListCache.put(key, parsed))
      parsed
    }
  }

  /** The leaf segment names a manifest resolves to (itself if leaf) —
    * public introspection (specs, `$manifests`-style tooling). */
  def segmentsOrSelf(tableDir: Path, name: String): Seq[String] =
    segmentsOf(tableDir, name).getOrElse(Seq(name))

  /** Entries of one segment, table-relative paths ([[MetaTables]]
    * `$manifests`, diagnostics). */
  def segmentEntries(tableDir: Path, name: String): Seq[DataFileEntry] =
    leafEntries(tableDir, name)

  /** Entries of one LEAF manifest/segment file, cached by path.
    *
    * Spec Avro leaves additionally key the cache on the table's
    * CURRENT schema id: their equality-delete entries resolve
    * `equality_ids` to column NAMES through that schema, so a schema
    * evolution (rename) must invalidate the cached resolution — a
    * forever-cached entry would keep masking on the pre-rename names.
    * Graft JSON leaves store names as written and never re-resolve,
    * so their key stays the immutable path. */
  private def leafEntries(tableDir: Path, name: String): Seq[DataFileEntry] = {
    val p = manifestPath(tableDir, name)
    val key =
      if (name.endsWith(".avro"))
        p.toString + "#schema-" +
          load(tableDir).map(_._2.currentSchemaId).getOrElse(-1)
      else p.toString
    manifestCache.synchronized(Option(manifestCache.get(key))).getOrElse {
      // C56 data plane: a leaf ending in .avro is a spec-Iceberg Avro
      // manifest list (externally committed via REST add-snapshot) —
      // resolve it through the import parser so the snapshot is
      // scannable in place, no full import. Avro manifests are as
      // immutable as graft ones, so they share the manifest LRU, and
      // they chain as ordinary segments: a graft append on top of an
      // external snapshot just references the Avro leaf verbatim.
      val parsed =
        if (name.endsWith(".avro")) IcebergImport.manifestListEntries(this, tableDir, p)
        else MetadataJson.manifestFromJson(store.readString(p))
      manifestCache.synchronized(manifestCache.put(key, parsed))
      parsed
    }
  }

  private def rawSnapshotFiles(tableDir: Path, snap: Snapshot): Seq[DataFileEntry] =
    segmentsOrSelf(tableDir, snap.manifest).flatMap(leafEntries(tableDir, _))

  /** Central manifest writer for a new snapshot; returns
    * (manifestName, totalFiles).
    *
    *  - `appendEntries = Some(added)` asserts the new file set is
    *    exactly the parent's plus `added`: in segmented mode the
    *    parent's segments are referenced VERBATIM and only `added` is
    *    written — O(added) metadata, no parent manifest read (total
    *    comes from the parent summary). Past `max-segments` the chain
    *    folds into balanced segments instead (merge-append).
    *  - otherwise `fullList` (lazy) is materialized and written —
    *    chunked into segments when segmented, one legacy manifest
    *    when not. */
  private def writeManifestFor(
      tableDir: Path,
      meta: TableMetadata,
      snapId: Long,
      parent: Option[Snapshot],
      appendEntries: Option[Seq[DataFileEntry]],
      fullList: => Seq[DataFileEntry]): (String, Long) = {
    val manifestName = s"manifest-$snapId.json"
    val mPath = new Path(metadataDir(tableDir), manifestName)
    def writeChunked(list: Seq[DataFileEntry]): (String, Long) = {
      val segNames = list.grouped(segmentSize(meta)).zipWithIndex.map { case (c, i) =>
        val n = s"seg-$snapId-$i.json"
        store.writeString(new Path(metadataDir(tableDir), n), MetadataJson.manifestToJson(c))
        n
      }.toSeq
      store.writeString(mPath, MetadataJson.manifestListToJson(segNames))
      (manifestName, list.size.toLong)
    }
    if (!segmentedEnabled(meta)) {
      val list = fullList
      store.writeString(mPath, MetadataJson.manifestToJson(list))
      (manifestName, list.size.toLong)
    } else (appendEntries, parent) match {
      case (Some(added), Some(p)) =>
        val baseSegs = segmentsOrSelf(tableDir, p.manifest)
        if (baseSegs.size >= maxSegments(meta)) writeChunked(fullList)
        else {
          val segs =
            if (added.isEmpty) baseSegs
            else {
              val segName = s"seg-$snapId.json"
              store.writeString(new Path(metadataDir(tableDir), segName),
                MetadataJson.manifestToJson(added))
              baseSegs :+ segName
            }
          store.writeString(mPath, MetadataJson.manifestListToJson(segs))
          val parentTotal = p.summary.get("total-data-files")
            .orElse(p.summary.get("total-files")).map(_.toLong)
            .getOrElse(rawSnapshotFiles(tableDir, p).size.toLong)
          (manifestName, parentTotal + added.size)
        }
      case _ => writeChunked(fullList)
    }
  }

  def snapshotEntries(tableDir: Path, snap: Snapshot): Seq[DataFileEntry] =
    rawSnapshotFiles(tableDir, snap).map(e => e.copy(path = absolutize(tableDir, e.path)))

  def snapshotFiles(tableDir: Path, snap: Snapshot): Seq[String] =
    snapshotEntries(tableDir, snap).map(_.path)

  /** Write `df` as parquet into a fresh write directory and commit it
    * as a snapshot. The DataFrame write is fully distributed; only the
    * file listing, footer-stat reads and metadata commit run on the
    * driver. When the table's default spec has identity fields that
    * exist in `df`, rows are range-clustered on them first so each
    * file covers a tight value range — that is what makes manifest
    * min/max skipping effective at scan time. */
  def write(tableDir: Path, df: DataFrame, operation: String,
      numFiles: Option[Int] = None): TableMetadata = {
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    val metaOpt = load(tableDir).map(_._2)
    val specFields = metaOpt.toSeq.flatMap { m =>
      m.specs.find(_.specId == m.defaultSpecId).toSeq.flatMap(_.fields)
    }.filter(f => df.columns.contains(f.name))
    // C65 hidden partitioning: bucket fields materialize their value
    // as a hidden __pt_ column — its parquet footer stats land in the
    // manifest (Stats.collect reads every file column), which is what
    // lets equality/IN predicates on the SOURCE column prune files
    // through the hash. Order-preserving transforms need nothing:
    // clustering alone gives files tight source-column ranges.
    // Derived on EVERY write, so compaction/rewrites regenerate it.
    val ptCols = Transforms.materialized(specFields)
    val dfPt = ptCols.foldLeft(df) { (d, f) =>
      val dt = d.schema(f.name).dataType
      d.withColumn(Transforms.ptColName(f),
        Transforms.clusterExpr(f.transform, f.name, dt))
    }
    val specCols = specFields.map { f =>
      if (Transforms.parse(f.transform).kind == "bucket") Transforms.ptColName(f)
      else f.name
    }
    // Default sort order (reference: add-sort-order / set-default-
    // sort-order): drives range clustering when the table is
    // unpartitioned — each file then covers a tight sort-key range, so
    // manifest min/max skipping works on the sort column exactly as it
    // does on partition columns — and always drives within-file row
    // order (row-group/page skipping + better compression).
    val sortCols = metaOpt.toSeq.flatMap { m =>
      m.sortOrders.find(_.orderId == m.defaultSortOrderId).toSeq.flatMap(_.fields)
        .flatMap(f => m.currentSchema.fields.find(_.id == f.sourceId)
          .map(nf => (nf.name, f.direction == "desc")))
    }.filter { case (n, _) => df.columns.contains(n) }
    // Range-clustering on the RAW column is enough for the
    // order-preserving transforms (contiguous raw ranges = contiguous
    // transform cells); bucket fields cluster on their __pt_ column.
    val clusterCols = if (specCols.nonEmpty) specCols else sortCols.map(_._1)
    // C77 — write distribution mode (`graft.write.distribution-mode`,
    // Iceberg's write.distribution-mode): `range` (default) gives each
    // file a tight value range — best pruning, but costs a sampling
    // pass over the input to compute range bounds; `hash` co-locates
    // each key's rows in one shuffle with NO sampling pass — the right
    // call for high-frequency writers (streaming micro-batches) where
    // the extra job per commit dominates; `none` writes the incoming
    // partitioning as-is, zero shuffle — for inputs already shaped
    // upstream (a shuffle-bearing agg/join directly before the write).
    val distMode = metaOpt.flatMap(_.properties.get("graft.write.distribution-mode"))
      .getOrElse("range")
    val shaped = (distMode, clusterCols, numFiles) match {
      // an explicit file-count request (compaction) still binds under
      // `none`, via a shuffle-free coalesce
      case ("none", _, Some(n)) => dfPt.coalesce(n)
      case ("none", _, None) => dfPt
      case ("hash", cols, Some(n)) if cols.nonEmpty => dfPt.repartition(n, cols.map(dfPt.col): _*)
      case ("hash", cols, None) if cols.nonEmpty => dfPt.repartition(cols.map(dfPt.col): _*)
      case (_, cols, Some(n)) if cols.nonEmpty => dfPt.repartitionByRange(n, cols.map(dfPt.col): _*)
      case (_, cols, None) if cols.nonEmpty => dfPt.repartitionByRange(cols.map(dfPt.col): _*)
      case (_, _, Some(n)) => dfPt.repartition(n)
      case _ => dfPt
    }
    val ordered =
      if (sortCols.isEmpty) shaped
      else shaped.sortWithinPartitions(
        sortCols.map { case (n, desc) =>
          if (desc) shaped.col(n).desc else shaped.col(n).asc }: _*)
    // Timestamps must land as INT64 micros: Spark's default INT96
    // carries NO footer statistics (parquet-mr refuses the corrupt
    // INT96 ordering) and no predicate pushdown — which would make
    // every timestamp column invisible to manifest skipping and C65
    // temporal transforms.
    val ss = df.sparkSession
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prevTs = ss.conf.getOption(tsKey)
    ss.conf.set(tsKey, "TIMESTAMP_MICROS")
    // C67: parquet bloom filters on the columns named by the
    // `graft.bloom.columns` table property — the point-lookup lever
    // manifest min/max stats DON'T give: high-cardinality identifier
    // equality (needle-in-haystack id = X) skips row groups through
    // the bloom even when files aren't clustered on the column, at
    // ~1 byte/distinct-value of footer. parquet-mr consults blooms
    // during row-group filtering under Spark's pushed filters, so the
    // read side needs no changes. Every rewrite (compaction, COW)
    // funnels through this path, so blooms regenerate with the data.
    val bloomCols = metaOpt.toSeq.flatMap(_.properties.get("graft.bloom.columns"))
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      .filter(df.columns.contains)
    val writer = bloomCols.foldLeft(
      ordered.write.format(metaOpt.map(dataFormat).getOrElse("parquet"))) {
      (w, c) => w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
    try writer.save(writeDir.toString)
    finally prevTs match {
      case Some(v) => ss.conf.set(tsKey, v)
      case None => ss.conf.unset(tsKey)
    }
    val files = store.listFilesRec(writeDir)
      .filter(f => isDataFile(f.getName)).map(_.toString)
    commitFiles(tableDir, files, operation)
  }

  // ---------- size-gated driver-side commits (r16, guide §1.2/§6) ----------

  /** Parquet MessageType for the driver-side direct writer. Only the
    * primitive shapes the small-commit path needs; anything else must
    * take the distributed [[write]]. */
  private def localParquetType(schema: StructType): org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types => PTypes}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.spark.sql.types._
    val b = PTypes.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType => b.optional(INT64).named(f.name)
        case IntegerType => b.optional(INT32).named(f.name)
        case DoubleType => b.optional(DOUBLE).named(f.name)
        case FloatType => b.optional(FLOAT).named(f.name)
        case BooleanType => b.optional(BOOLEAN).named(f.name)
        case StringType =>
          b.optional(BINARY).as(LogicalTypeAnnotation.stringType()).named(f.name)
        case other => throw new IllegalArgumentException(
          s"local write supports primitive columns only, got ${other.sql} for ${f.name}")
      }
    }
    b.named("spark_schema")
  }

  /** Write already-collected `rows` as ONE parquet file under a fresh
    * `w-<uuid>` write dir, straight through parquet-mr on the driver —
    * no Spark job, no FileFormatWriter commit-protocol round. Footer
    * carries the same row count + min/max stats the distributed writer
    * produces, so [[collectStats]]/manifest skipping see an identical
    * entry. Returns the absolute file path. */
  private def writeLocalParquetFile(
      tableDir: Path, schema: StructType,
      rows: Seq[org.apache.spark.sql.Row]): String = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.spark.sql.types._
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    val file = new Path(writeDir, s"part-00000-${UUID.randomUUID()}.parquet")
    val conf = store.fs(tableDir).getConf
    val mt = localParquetType(schema)
    // file:// writes bypass Hadoop's RawLocalFileSystem (it forks a
    // `chmod` per created file without the native lib — the very fixed
    // cost this path exists to avoid) via parquet's java.nio OutputFile.
    val fileUri = file.toUri
    val outFile =
      if (Option(fileUri.getScheme).forall(_ == "file") &&
          Option(fileUri.getAuthority).isEmpty) {
        val np = java.nio.file.Paths.get(fileUri.getPath)
        java.nio.file.Files.createDirectories(np.getParent)
        new org.apache.parquet.io.LocalOutputFile(np)
      } else HadoopOutputFile.fromPath(file, conf)
    val writer = ExampleParquetWriter.builder(outFile)
      .withConf(conf)
      .withType(mt)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val gf = new SimpleGroupFactory(mt)
    val types = schema.fields.map(_.dataType)
    try rows.foreach { r =>
      val g = gf.newGroup()
      var i = 0
      while (i < types.length) {
        if (!r.isNullAt(i)) types(i) match {
          case LongType => g.add(i, r.getLong(i))
          case IntegerType => g.add(i, r.getInt(i))
          case DoubleType => g.add(i, r.getDouble(i))
          case FloatType => g.add(i, r.getFloat(i))
          case BooleanType => g.add(i, r.getBoolean(i))
          case _ => g.add(i, r.getString(i))
        }
        i += 1
      }
      writer.write(g)
    } finally writer.close()
    file.toString
  }

  /** Size-gated driver-side append (guide §1.2/§6): commit
    * already-collected, churn-sized `rows` as ONE parquet data file,
    * bypassing Spark's per-write execution setup (planning +
    * FileFormatWriter job + commit protocol, ~1 s of fixed cost per
    * KB-scale commit), through the exact same
    * [[commitFiles]] manifest/CAS path as [[write]]. The CALLER gates
    * on a measured row count — an unbounded input must take [[write]]
    * with full write parallelism. Unpartitioned/unsorted parquet
    * tables with primitive columns only. */
  def writeLocalSmall(
      tableDir: Path, schema: StructType,
      rows: Seq[org.apache.spark.sql.Row],
      operation: String): TableMetadata = {
    val meta = load(tableDir).map(_._2)
    require(meta.forall(m => dataFormat(m) == "parquet"),
      "local write path is parquet-only")
    require(meta.forall(m =>
      m.specs.find(_.specId == m.defaultSpecId).forall(_.fields.isEmpty) &&
      m.sortOrders.find(_.orderId == m.defaultSortOrderId).forall(_.fields.isEmpty)),
      "local write path supports unpartitioned, unsorted tables only")
    require(rows.nonEmpty, "local write of zero rows is a no-op commit")
    val marksOn = sys.env.get("GRAFT_COMMIT_MARKS").contains("1")
    val t0 = System.nanoTime()
    val f = writeLocalParquetFile(tableDir, schema, rows)
    val t1 = System.nanoTime()
    val m = commitFiles(tableDir, Seq(f), operation)
    if (marksOn) System.err.println(
      f"[commit] pq=${(t1 - t0) / 1e9}%.3f commit=${(System.nanoTime() - t1) / 1e9}%.3f")
    m
  }

  /** Size-gated driver-side equality delete: the local-commit twin of
    * [[mergeOnReadDelete]] for churn-sized key sets the caller has
    * already counted. Identical manifest entry (content, equality
    * columns, footer stats, sequence) — only the file write moves from
    * a Spark job to the driver. */
  def mergeOnReadDeleteLocal(
      tableDir: Path, keySchema: StructType,
      keys: Seq[org.apache.spark.sql.Row]): TableMetadata = {
    require(keySchema.fields.nonEmpty, "merge-on-read delete needs key columns")
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    keySchema.fieldNames.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"key column $c not in table schema"))
      import org.apache.spark.sql.types._
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType | BooleanType => ()
        case other => throw new IllegalArgumentException(
          s"unsupported equality-delete key type ${other.sql} for $c")
      }
    }
    val f = writeLocalParquetFile(tableDir, keySchema, keys.distinct)
    val statted = collectStats(tableDir, Seq(f))
    commitDeleteEntries(tableDir, seq => statted.map(e => e.copy(
      path = relativize(tableDir, e.path), content = "eq-deletes",
      equalityColumns = keySchema.fieldNames.toSeq, seq = Some(seq))), "eq-delete")
  }

  /** Write `df` split into one file set PER PARTITION VALUE of the
    * table's identity spec columns — every data file is single-valued
    * on every spec column, which is exactly what activates key-grouped
    * (storage-partitioned-join) scan reporting. One bulk write instead
    * of per-key inserts: the physical layout comes from the parquet
    * writer's dynamic partitioning, with each spec column duplicated
    * into a `__p_`-prefixed directory column so the data files retain
    * the real column (directory-encoded values never round-trip
    * through graft's path-list reads). */
  def writeValuePartitioned(tableDir: Path, df: DataFrame,
      operation: String = "append"): TableMetadata = {
    val specFields = load(tableDir).toSeq.flatMap { case (_, m) =>
      m.specs.find(_.specId == m.defaultSpecId).toSeq.flatMap(_.fields)
    }.filter(f => df.columns.contains(f.name))
      .filter(f => Seq("identity", "bucket").contains(Transforms.parse(f.transform).kind))
    require(specFields.nonEmpty,
      s"writeValuePartitioned needs identity/bucket partition columns present in the frame")
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    // identity fields duplicate the raw value; bucket fields (C74)
    // FIRST materialize the hidden __pt_ column (so the files carry
    // its footer stats) and partition on its value — one file set per
    // bucket, which is exactly what activates bucket-transform SPJ
    val dup = specFields.foldLeft(df) { (d, f) =>
      if (Transforms.parse(f.transform).kind == "bucket") {
        val pt = Transforms.ptColName(f)
        val d2 = d.withColumn(pt,
          Transforms.clusterExpr(f.transform, f.name, d.schema(f.name).dataType))
        d2.withColumn(s"__p_$pt", d2.col(pt))
      } else d.withColumn(s"__p_${f.name}", d.col(f.name))
    }
    val dirCols = specFields.map { f =>
      if (Transforms.parse(f.transform).kind == "bucket")
        s"__p_${Transforms.ptColName(f)}"
      else s"__p_${f.name}"
    }
    dup.write.partitionBy(dirCols: _*)
      .format(dataFormat(tableDir)).save(writeDir.toString)
    val files = store.listFilesRec(writeDir)
      .filter(f => isDataFile(f.getName)).map(_.toString)
    commitFiles(tableDir, files, operation)
  }

  /** Overwrite commit that KEEPS already-stat'ed entries as-is and
    * stat-collects only the newly written files — the commit step of
    * copy-on-write DELETE and of compaction. `keep` entries carry
    * absolute paths (as returned by [[resolveEntries]]). */
  def overwriteWith(
      tableDir: Path,
      keep: Seq[DataFileEntry],
      newFiles: Seq[String],
      operation: String = "overwrite"): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val parent = meta.currentSnapshot
    val newSeq = meta.lastSequenceNumber + 1
    val keptRel = keep.map(e => e.copy(path = relativize(tableDir, e.path)))
    val (newRel, lineageUpd) = stampRowIds(meta, collectStats(tableDir, newFiles)
      .map(e => e.copy(path = relativize(tableDir, e.path), seq = Some(newSeq)))
      .filterNot(_.rows.contains(0L))) // empty range partitions write 0-row files: pure metadata waste
    val all = keptRel ++ newRel
    val snapId = newSnapshotId()
    val (manifestName, total) =
      writeManifestFor(tableDir, meta, snapId, parent, None, all)
    val snap = Snapshot(
      snapshotId = snapId,
      parentSnapshotId = parent.map(_.snapshotId),
      sequenceNumber = meta.lastSequenceNumber + 1,
      timestampMs = System.currentTimeMillis(),
      operation = operation,
      manifest = manifestName,
      summary = Map(
        "added-data-files" -> newRel.size.toString,
        "kept-data-files" -> keptRel.size.toString,
        "total-data-files" -> total.toString),
      schemaId = meta.currentSchemaId)
    // `keep` was derived from the state read above — same stale-read
    // guard as commitFiles, but NOT retried: a conflicting concurrent
    // commit means the caller's keep-set is invalid and the operation
    // (delete/compact) must be recomputed by the caller.
    commit(tableDir,
      Seq(Requirement.AssertRefSnapshotId("main", parent.map(_.snapshotId))),
      Seq(
        MetadataUpdate.AddSnapshot(snap),
        MetadataUpdate.SetSnapshotRef("main", snapId, "branch")) ++ lineageUpd)
  }

  /** Rewrite the current snapshot into `numFiles` files (small-file
    * compaction). History is preserved — the old snapshot and its
    * files stay readable until expiration + orphan cleanup. */
  def compact(spark: SparkSession, tableDir: Path, numFiles: Int): TableMetadata =
    write(tableDir, read(spark, tableDir), "overwrite", Some(numFiles))

  /** Z-ordered write: cluster `df` on the Morton interleave of two
    * columns so every file covers a compact rectangle of the
    * (colA, colB) space — manifest min/max skipping then prunes files
    * for predicates on EITHER column, which a single-column sort
    * cannot do ([[ZOrder]]). The multi-dimensional layout lever for
    * point-lookup-heavy tables at 100 TB. */
  def writeZOrdered(
      tableDir: Path,
      df: DataFrame,
      cols: Seq[String],
      numFiles: Int,
      operation: String = "append"): TableMetadata = {
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    import org.apache.spark.sql.functions.{col, shiftright}
    // exact tiling on the z-value's top bits (numFiles rounded to a
    // power of two): every output file is one compact z-tile, so the
    // per-dimension file ranges are deterministic — range-partition
    // sampling would smear tile boundaries
    val bits = math.max(1, (math.log(numFiles.toDouble) / math.log(2.0)).round.toInt)
    val tiles = 1 << bits
    df.withColumn("__z", ZOrder.zValue(df, cols))
      .withColumn("__zp", shiftright(col("__z"), ZOrder.totalBits(cols.size) - bits))
      .repartition(tiles, col("__zp"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.partitionBy("__zp").format(dataFormat(tableDir)).save(writeDir.toString)
    val files = store.listFilesRec(writeDir)
      .filter(f => isDataFile(f.getName)).map(_.toString)
    commitFiles(tableDir, files, operation)
  }

  /** C47 — Hilbert-curve clustered write: z-order's locality upgrade
    * (no Morton diagonal jumps — consecutive curve positions are
    * always adjacent grid cells), so each file tile spans an even
    * tighter hyper-rectangle and min/max pruning on EITHER clustered
    * column drops more files. Same exact-tiling commit shape as
    * [[writeZOrdered]]: tiles = top curve bits, one file per tile. */
  def writeHilbertClustered(
      tableDir: Path,
      df: DataFrame,
      cols: Seq[String],
      numFiles: Int,
      operation: String = "append"): TableMetadata = {
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    import org.apache.spark.sql.functions.{col, shiftright}
    val bits = math.max(1, (math.log(numFiles.toDouble) / math.log(2.0)).round.toInt)
    val tiles = 1 << bits
    ZOrder.withHilbert(df, cols, "__h")
      .withColumn("__hp",
        shiftright(col("__h"), ZOrder.hilbertTotalBits(cols.size) - bits))
      .repartition(tiles, col("__hp"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.partitionBy("__hp").format(dataFormat(tableDir)).save(writeDir.toString)
    val files = store.listFilesRec(writeDir)
      .filter(f => isDataFile(f.getName)).map(_.toString)
    commitFiles(tableDir, files, operation)
  }

  /** Bin-pack compaction: rewrite ONLY files smaller than
    * `smallBytes`, packed toward `targetBytes` outputs; right-sized
    * files are kept verbatim with their stats. This is the form of
    * compaction that scales — a 100 TB table with a long small-file
    * tail rewrites the tail, not the table ([[compact]] rewrites
    * everything). Requires no pending MOR deletes (it re-reads raw
    * files). */
  def compactSmallFiles(
      spark: SparkSession,
      tableDir: Path,
      smallBytes: Long,
      targetBytes: Long): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    requireNoPendingDeletes(tableDir, meta, "compactSmallFiles")
    val entries = resolveEntries(tableDir, meta)
    val (small, big) = entries.partition(_.bytes.exists(_ < smallBytes))
    if (small.size < 2) return meta
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    val totalBytes = small.flatMap(_.bytes).sum
    val outFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    spark.read.schema(schema).format(dataFormat(meta)).load(small.map(_.path): _*)
      .repartition(outFiles)
      .write.format(dataFormat(meta)).save(writeDir.toString)
    val newFiles = store.listFilesRec(writeDir)
      .filter(f => isDataFile(f.getName)).map(_.toString)
    overwriteWith(tableDir, big, newFiles, operation = "compact-files")
  }

  /** C80 — targeted compaction (Iceberg's `rewrite_data_files` with a
    * where clause): rewrite ONLY the data files whose manifest stats
    * OVERLAP `predicateSql`; provably-disjoint files are kept verbatim
    * with their stats. Row-preserving — selected files are read whole
    * (through the evolution-aware path) and re-clustered, never
    * filtered — so this is the hot-partition maintenance move: a
    * streaming table's freshest day compacts without paying a
    * full-table rewrite. Lineage-enabled tables must use
    * [[compactLineage]] (id blocks don't survive a row-permuting
    * partial rewrite). */
  def compactWhere(
      spark: SparkSession,
      tableDir: Path,
      predicateSql: String,
      numFiles: Int): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    requireNoPendingDeletes(tableDir, meta, "compactWhere")
    if (lineageEnabled(meta))
      throw new UnsupportedOperationException(
        "compactWhere on a row-lineage table would reassign ids — use compactLineage")
    val entries = resolveEntries(tableDir, meta)
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    // parse + resolve the predicate against the table schema, then
    // translate to the sources.Filter vocabulary the stats pruner speaks
    // ConstantFolding over the analyzed plan: implicit literal casts
    // (`id >= CAST(3000 AS BIGINT)`) must collapse to literals before
    // the sources.Filter translation will accept them — but the full
    // optimizer would erase the Filter over an empty relation entirely
    val analyzedPlan = spark
      .createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .filter(org.apache.spark.sql.functions.expr(predicateSql))
      .queryExecution.analyzed
    val cond = org.apache.spark.sql.catalyst.optimizer.ConstantFolding(analyzedPlan)
      .collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }
      .getOrElse(throw new IllegalArgumentException(s"cannot parse predicate: $predicateSql"))
    val filter = org.apache.spark.sql.execution.datasources.GraftBridge.translateFilter(cond)
      .getOrElse(throw new IllegalArgumentException(
        s"predicate not stats-translatable: $predicateSql"))
    // no pending deletes (guarded above) ⇒ every entry is a data file
    val (hit, keep) = entries.partition(e =>
      Stats.mayContain(SchemaEvolution.statsToCurrent(meta, e), schema, filter))
    if (hit.size < 2) return meta
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    readEntries(spark, tableDir, meta, hit)
      .repartition(numFiles)
      .write.format(dataFormat(meta)).save(writeDir.toString)
    val newFiles = store.listFilesRec(writeDir)
      .filter(f => isDataFile(f.getName)).map(_.toString)
    overwriteWith(tableDir, keep, newFiles, operation = "compact-where")
  }

  /** MERGE-lite upsert: rows of `source` replace current rows with the
    * same key tuple; unmatched source rows append. File-granular
    * copy-on-write like DELETE — files whose key-column stats don't
    * overlap the source's key range are kept verbatim; only
    * possibly-affected files are rewritten (anti-join on the keys).
    * The source is read twice (key bounds + the join) — cache it if
    * it's expensive. */
  def upsert(
      spark: SparkSession,
      tableDir: Path,
      source: DataFrame,
      keys: Seq[String]): TableMetadata = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    requireNoPendingDeletes(tableDir, meta, "upsert")
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    val entries = resolveEntries(tableDir, meta)

    import org.apache.spark.sql.functions.{col, min => fmin, max => fmax}
    val boundsRow = source.agg(
      fmin(col(keys.head)).as("mn0"), fmax(col(keys.head)).as("mx0")).collect().head
    // conservative file pruning on the FIRST key column's range
    val overlap: DataFileEntry => Boolean = { e =>
      (boundsRow.get(0), boundsRow.get(1)) match {
        case (mn: Any, mx: Any) if mn != null && mx != null =>
          Stats.mayContain(e, schema,
            org.apache.spark.sql.sources.And(
              org.apache.spark.sql.sources.GreaterThanOrEqual(keys.head, mn),
              org.apache.spark.sql.sources.LessThanOrEqual(keys.head, mx)))
        case _ => true
      }
    }
    val (affected, untouched) = entries.partition(overlap)
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    val existing =
      if (affected.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else spark.read.schema(schema).format(dataFormat(meta))
        .load(affected.map(_.path): _*)
    val survivors = existing.join(source.select(keys.map(col): _*), keys, "left_anti")
    survivors.select(schema.fieldNames.map(col): _*)
      .unionByName(source.select(schema.fieldNames.map(col): _*))
      .write.format(dataFormat(meta)).save(writeDir.toString)
    val newFiles = store.listFilesRec(writeDir)
      .filter(f => isDataFile(f.getName)).map(_.toString)
    overwriteWith(tableDir, untouched, newFiles, operation = "upsert")
  }

  // ---------- merge-on-read equality deletes ----------

  /** Equality-delete (merge-on-read) DELETE: commits the key tuples as
    * a delete file alongside the current data files — O(keys) write,
    * ZERO data-file rewriting. Readers anti-join the keys at scan time
    * ([[read]] and the DSv2 scan path); [[applyDeletes]] (or any
    * overwrite) later purges them. The copy-on-write path
    * (DELETE FROM / UPDATE / MERGE) stays the default — merge-on-read
    * is for high-churn workloads where rewrite amplification
    * dominates; key columns are limited to integral / string /
    * boolean types.
    *
    * Sequence ordering: the delete file carries the commit's sequence
    * number and masks only data files with a strictly LOWER sequence
    * — rows appended AFTER the delete are visible even when their
    * keys match, so delete-then-reinsert works without
    * [[applyDeletes]]. */
  def mergeOnReadDelete(
      spark: SparkSession,
      tableDir: Path,
      keys: DataFrame,
      /** target delete-file count; None keeps one part per shuffle
        * partition (a million-key delete must not funnel through one
        * task), small values stop a small churn window from littering
        * the manifest with per-partition shards */
      numFiles: Option[Int] = None): TableMetadata = {
    require(keys.columns.nonEmpty, "merge-on-read delete needs key columns")
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    keys.columns.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"key column $c not in table schema"))
      import org.apache.spark.sql.types._
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType | BooleanType => ()
        case other => throw new IllegalArgumentException(
          s"unsupported equality-delete key type ${other.sql} for $c")
      }
    }
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    // distinct() shuffles on the key; by default the write keeps that
    // parallelism (one part per shuffle partition). The manifest
    // carries every part.
    val distinctKeys = keys.distinct()
    numFiles.map(n => distinctKeys.coalesce(math.max(1, n)))
      .getOrElse(distinctKeys).write.parquet(writeDir.toString)
    val files = store.listFilesRec(writeDir)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    // A delete commit COMMUTES with concurrent snapshot commits (the
    // keys mask whatever OLDER data files the winner's state has;
    // newer appends are protected by the sequence rule either way),
    // so a lost CAS race retries on fresh state.
    // Entries carry footer stats: `rows` makes the masked-key count a
    // metadata fact (unique-key ledgers derive exact live counts with
    // zero scans), and key min/max lets readers skip applying a delete
    // file to data files outside its key range.
    val statted = collectStats(tableDir, files)
    commitDeleteEntries(tableDir, seq => statted.map(e => e.copy(
      path = relativize(tableDir, e.path), content = "eq-deletes",
      equalityColumns = keys.columns.toSeq, seq = Some(seq))), "eq-delete")
  }

  /** Positional (merge-on-read) DELETE: computes the (file, ordinal)
    * coordinates of rows matching `cond` against the CURRENT snapshot
    * and commits them as a positional-delete file — O(matched rows)
    * write, zero data-file rewriting, no key-type restriction.
    * Coordinates are absolute row ordinals assigned by the per-file
    * scan ([[MorFilter.PerFileFactory]]), the same coordinate system
    * the read path filters by.
    *
    * Unlike equality deletes the coordinates are only meaningful
    * against the exact files they name, so a concurrent REWRITE
    * (overwrite/compact) between the scan and the commit aborts the
    * commit instead of retrying — the caller recomputes. Concurrent
    * APPENDS commute and are retried through. */
  def positionalDelete(
      spark: SparkSession,
      tableDir: Path,
      cond: org.apache.spark.sql.Column,
      asVectors: Boolean = false): TableMetadata = {
    import org.apache.spark.sql.execution.datasources.GraftBridge
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val namedFiles = resolveEntries(tableDir, meta).filter(_.isData).map(_.path).toSet
    val pinnedSeq = meta.lastSequenceNumber
    val df = GraftBridge.ofRows(spark,
      new GraftTable(tableDir.toString, tableDir, meta, this))
    // Store _file TABLE-RELATIVE (same policy as manifest entries), so
    // table rename — a directory move — keeps the coordinates valid;
    // files outside the table dir (registered externals) stay as-is.
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val baseNorm = java.util.regex.Pattern.quote(tableDir.toUri.getPath + "/")
    val matches = df.filter(cond)
      .select(regexp_replace(col("_file"), s"^.*$baseNorm", "").as("_file"),
              col("_pos"))
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    // parallel write — the matched coordinate set of a large delete
    // must not funnel through one task; the manifest keeps every part
    val content = if (asVectors) "dv-deletes" else "pos-deletes"
    val toWrite = if (asVectors) DeletionVectors.fromPairs(spark, matches) else matches
    toWrite.write.parquet(writeDir.toString)
    val files = store.listFilesRec(writeDir)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    commitDeleteEntries(tableDir, seq => files.map(f => DataFileEntry(
      relativize(tableDir, f), content = content, seq = Some(seq))),
      if (asVectors) "dv-delete" else "pos-delete",
      validate = cur => {
        val present = resolveEntries(tableDir, cur).filter(_.isData).map(_.path).toSet
        if (!namedFiles.subsetOf(present))
          throw new CommitFailedException(
            "positional delete aborted: a concurrent rewrite replaced files the " +
            "delete coordinates reference — recompute against fresh state")
        // lost-delete guard (the API twin of commitMorDelta's): a
        // merge-on-read UPDATE that committed since our scan masked
        // the OLD coordinates and re-appended fresh images of rows
        // these coordinates meant to kill — landing anyway would let
        // the images survive a "successful" DELETE. Pure delete and
        // append commits still commute (coordinates are idempotent,
        // the sequence rule protects newer rows).
        if (cur.snapshots.exists(s =>
            s.sequenceNumber > pinnedSeq && s.operation == "mor-update"))
          throw new CommitFailedException(
            "positional delete aborted: a concurrent merge-on-read update " +
            "committed since this delete's snapshot — recompute against fresh state")
      })
  }

  /** Positional DELETE committed as deletion vectors: one Roaring
    * bitmap per touched data file ([[DeletionVectors]]) instead of one
    * parquet row per dead ordinal — the Iceberg v3 deletion-vector
    * direction. Same coordinate semantics, same concurrent-rewrite
    * abort; ~60× denser on disk and O(1) unboxed membership on the
    * read path. */
  def deletionVectorDelete(
      spark: SparkSession,
      tableDir: Path,
      cond: org.apache.spark.sql.Column): TableMetadata =
    positionalDelete(spark, tableDir, cond, asVectors = true)

  /** C89 — import Iceberg v3 deletion vectors: the `delete-vector-v1`
    * blobs of a Puffin file ([[PuffinStats.readDeleteVectors]], CRC-
    * validated) commit as ONE graft dv-delete snapshot masking the
    * referenced ordinals — the read direction of
    * [[PuffinStats.writeDeleteVectors]], so v3 DVs round-trip
    * export→import without ever expanding to per-ordinal rows. Every
    * referenced data file must be live in this table (else: loud
    * refusal — a vector against an unknown file is either the wrong
    * table or a rewrite raced the import). */
  def importDeleteVectorsPuffin(
      spark: SparkSession,
      tableDir: Path,
      puffinPath: Path): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    // footer-only driver read: blob coordinates + declared
    // cardinalities — O(blobs) driver memory; the vectors themselves
    // (possibly gigabytes across hundreds of files) never land here
    val metas = PuffinStats.readDeleteVectorMetas(this, puffinPath)
    if (metas.isEmpty)
      throw new IllegalArgumentException(s"no delete-vector-v1 blobs in $puffinPath")
    val base = tableDir.toUri.getPath + "/"
    def norm(p: String): String = {
      val a = p.replaceFirst("^file:/+", "/")
      if (a.startsWith("/")) a else base + a
    }
    def liveOf(m: TableMetadata): Set[String] =
      resolveEntries(tableDir, m).filter(_.isData).map(e => norm(e.path)).toSet
    val missing = metas.map(m => norm(m.referencedFile)).filterNot(liveOf(meta).contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"puffin delete vectors reference files not live in this table " +
          s"(e.g. ${missing.head})")
    // distributed decode: each task positioned-reads ITS blobs from
    // the Puffin file and CRC-validates them; the parquet write keeps
    // every part — a multi-hundred-file vector set never funnels
    // through one task or the driver heap (same rename-safe relative
    // path policy as positionalDelete)
    val hconf = new SerializableHadoopConf(store.fs(puffinPath).getConf)
    val pPathStr = puffinPath.toString
    import spark.implicits._
    val parts = math.min(metas.size,
      spark.sessionState.conf.numShufflePartitions).max(1)
    val df = spark.createDataset(metas.map { m =>
      val abs = norm(m.referencedFile)
      val stored = if (abs.startsWith(base)) abs.stripPrefix(base) else abs
      (stored, m.offset, m.length, m.cardinality)
    })
      .repartition(parts)
      .mapPartitions { it =>
        val p = new Path(pPathStr)
        val in = p.getFileSystem(hconf.value).open(p)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        it.map { case (stored, off, len, declaredCard) =>
          val blob = new Array[Byte](len)
          in.readFully(off, blob, 0, len) // positioned read, thread-safe
          val vec = PuffinStats.decodeDeleteVectorBlob(blob, s"$pPathStr@$off")
          val card =
            if (declaredCard >= 0) declaredCard
            else DeletionVectors.deserialize(vec).getLongCardinality
          (stored, card, vec)
        }
      }
      .toDF("file_path", "cardinality", "dv")
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    df.write.parquet(writeDir.toString)
    val files = store.listFilesRec(writeDir)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    commitDeleteEntries(tableDir, seq => files.map(f => DataFileEntry(
      relativize(tableDir, f), content = "dv-deletes", seq = Some(seq))),
      "dv-delete",
      validate = cur => {
        val present = liveOf(cur)
        val gone = metas.map(m => norm(m.referencedFile)).filterNot(present.contains)
        if (gone.nonEmpty)
          throw new CommitFailedException(
            "deletion-vector import aborted: a concurrent rewrite replaced " +
              s"referenced files (e.g. ${gone.head}) — re-export against fresh state")
      })
  }

  /** C81 — merge-on-read UPDATE: matched rows die via a deletion
    * vector and their updated images append as new data files, BOTH in
    * ONE commit — O(changed rows) work, zero data-file rewrite (the
    * COW row-level path rewrites whole files; at 100 TB a 0.1%-
    * selectivity UPDATE should not rewrite 100% of the bytes it
    * touches). Positional masking is path-keyed, so the new files are
    * untouched by the vector that kills their predecessors; CDC
    * resolves the commit as row-level delete+insert pairs. Concurrent
    * rewrites of the referenced files abort the commit (coordinates
    * would dangle). Row-lineage tables must use the copy-on-write
    * UPDATE (id carry-over across an update is a rewrite concern). */
  def morUpdate(
      spark: SparkSession,
      tableDir: Path,
      cond: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): TableMetadata = {
    import org.apache.spark.sql.execution.datasources.GraftBridge
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    if (lineageEnabled(meta))
      throw new UnsupportedOperationException(
        "morUpdate on a row-lineage table — use the copy-on-write UPDATE (ids must carry over)")
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    assignments.keys.foreach(c => require(schema.fieldNames.contains(c),
      s"assignment targets unknown column $c"))
    val namedFiles = resolveEntries(tableDir, meta).filter(_.isData).map(_.path).toSet
    val df = GraftBridge.ofRows(spark,
      new GraftTable(tableDir.toString, tableDir, meta, this))
    // one scan feeds both the coordinate set and the new row images
    val matched = df.filter(cond).persist()
    try {
      // zero matched rows: committing would still add a (empty) DV
      // entry, and ANY pending delete entry forces merge-on-read
      // scanning and disables the C82/C83 metadata pushdowns on every
      // subsequent query — so a no-op UPDATE must be a no-op commit
      if (matched.isEmpty) return meta
      val baseNorm = java.util.regex.Pattern.quote(tableDir.toUri.getPath + "/")
      val coords = matched
        .select(regexp_replace(col("_file"), s"^.*$baseNorm", "").as("_file"), col("_pos"))
      val dvDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
      DeletionVectors.fromPairs(spark, coords).write.parquet(dvDir.toString)
      val dvFiles = store.listFilesRec(dvDir)
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      val updated = assignments.foldLeft(
        matched.select(schema.fieldNames.map(col).toIndexedSeq: _*)) {
        case (d, (c, e)) => d.withColumn(c, e)
      }.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      val dataW = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
      updated.write.format(dataFormat(meta)).save(dataW.toString)
      val dataFiles = store.listFilesRec(dataW)
        .filter(f => isDataFile(f.getName)).map(_.toString)
      commitDeleteEntries(tableDir, seq =>
        dvFiles.map(f => DataFileEntry(
          relativize(tableDir, f), content = "dv-deletes", seq = Some(seq))) ++
        collectStats(tableDir, dataFiles)
          .map(e => e.copy(path = relativize(tableDir, e.path), seq = Some(seq)))
          .filterNot(_.rows.contains(0L)),
        "mor-update",
        validate = cur => {
          val entries = resolveEntries(tableDir, cur)
          val present = entries.filter(_.isData).map(_.path).toSet
          if (!namedFiles.subsetOf(present))
            throw new CommitFailedException(
              "mor-update aborted: a concurrent rewrite replaced files the update " +
              "coordinates reference — recompute against fresh state")
          // lost-update guard (same as commitMorDelta): a row-level
          // delete that landed after this update's snapshot may have
          // killed rows we are re-appending images for
          if (entries.exists(e => e.isDelete && e.seq.exists(_ > meta.lastSequenceNumber)))
            throw new CommitFailedException(
              "mor-update aborted: a concurrent row-level delete/update committed " +
              "since this operation's snapshot — rerun the statement on fresh state")
        })
    } finally { matched.unpersist(); () }
  }

  /** Commit one SQL merge-on-read delta write (the `SupportsDelta`
    * row-level path in [[GraftTable]], C81's commit shape fed by
    * Spark's own UPDATE/MERGE/DELETE rewrite plans): the executors'
    * merged deletion vectors — one bitmap per referenced data file,
    * TABLE-RELATIVE paths — plus the appended row-image files, in ONE
    * snapshot. The driver holds only the bitmaps (the exact bytes of
    * the on-disk artifact, compressed Roaring), so the single-task DV
    * write is metadata-sized at any table scale. Aborts if a
    * concurrent rewrite replaced any file the coordinates reference
    * (they would dangle); concurrent appends commute and retry. */
  def commitMorDelta(
      spark: SparkSession,
      tableDir: Path,
      dvBitmaps: Seq[(String, org.roaringbitmap.longlong.Roaring64NavigableMap)],
      dataFiles: Seq[String],
      operation: String,
      namedFiles: Set[String],
      pinnedSeq: Long): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    if (dvBitmaps.isEmpty && dataFiles.isEmpty) return meta
    // write-conflict detection for UPDATE-shaped commits (deletes AND
    // images): a row-level delete/update that landed since this
    // operation's snapshot may have targeted the same rows — appending
    // our images anyway would resurrect or duplicate them (the classic
    // lost update). Same stance as Iceberg's serializable-isolation
    // conflict validation: fail the statement, the user reruns on
    // fresh state.
    val isUpdateShape = dvBitmaps.nonEmpty && dataFiles.nonEmpty
    // Delete-only commits need the symmetric guard: a DELETE pinned
    // BEFORE a concurrent MOR UPDATE committed masks only the old row
    // coordinates, so the update's re-appended images would survive a
    // "successful" DELETE that targeted those rows — a lost delete.
    // Any row-level delete entry landing after our pin (a mor-update's
    // DV, another DV delete, an eq-delete) aborts; plain APPENDS still
    // commute (the sequence rule protects rows newer than the delete
    // by design, and append commits carry no delete entries).
    val isDeleteShape = dvBitmaps.nonEmpty && dataFiles.isEmpty
    val dvFiles =
      if (dvBitmaps.isEmpty) Seq.empty[String]
      else {
        val dvDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
        val rows = dvBitmaps.sortBy(_._1).map { case (f, bm) =>
          org.apache.spark.sql.Row(f, bm.getLongCardinality, DeletionVectors.serialize(bm))
        }
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(rows.asJava, DeletionVectors.schema)
          .coalesce(1).write.parquet(dvDir.toString)
        store.listFilesRec(dvDir).filter(_.getName.endsWith(".parquet")).map(_.toString)
      }
    commitDeleteEntries(tableDir, seq =>
      dvFiles.map(f => DataFileEntry(
        relativize(tableDir, f), content = "dv-deletes", seq = Some(seq))) ++
      collectStats(tableDir, dataFiles)
        .map(e => e.copy(path = relativize(tableDir, e.path), seq = Some(seq)))
        .filterNot(_.rows.contains(0L)),
      operation,
      validate = cur => {
        val entries = resolveEntries(tableDir, cur)
        val present = entries.filter(_.isData).map(_.path).toSet
        if (!namedFiles.subsetOf(present))
          throw new CommitFailedException(
            s"$operation aborted: a concurrent rewrite replaced files the delete " +
            "coordinates reference — recompute against fresh state")
        if ((isUpdateShape || isDeleteShape) &&
            entries.exists(e => e.isDelete && e.seq.exists(_ > pinnedSeq)))
          throw new CommitFailedException(
            s"$operation aborted: a concurrent row-level delete/update committed " +
            "since this operation's snapshot — rerun the statement on fresh state")
      })
  }

  /** Compact every pending positional delete (row-coordinate parquet
    * AND existing vectors) into ONE deletion vector per referenced
    * data file. Positional application is path-keyed and
    * sequence-independent (coordinates pin rows in exactly the files
    * they name), so unioning commits is always semantics-preserving —
    * unlike equality deletes, where [[compactDeletes]] must respect
    * interleaved-append sequence boundaries. Data files untouched;
    * O(dead rows) work. */
  /** (path, ordinal) pairs of a positional-delete entry set, DIALECT-
    * aware: graft files read as `(_file,_pos)`, spec-Iceberg files
    * (externally-committed snapshots) as the spec's `(file_path,pos)`
    * and rename — downstream consumers see one uniform frame. */
  private def readPosPairs(
      spark: SparkSession,
      entries: Seq[DataFileEntry]): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val (specE, graftE) = entries.partition(_.isSpecPosDelete)
    val g =
      if (graftE.isEmpty) None
      else Some(spark.read.schema(StructType(Seq(
        StructField("_file", StringType, nullable = false),
        StructField("_pos", LongType, nullable = false))))
        .parquet(graftE.map(_.path): _*))
    val sp =
      if (specE.isEmpty) None
      else Some(spark.read.schema(StructType(Seq(
        StructField("file_path", StringType, nullable = false),
        StructField("pos", LongType, nullable = false))))
        .parquet(specE.map(_.path): _*).toDF("_file", "_pos"))
    (g.toSeq ++ sp.toSeq).reduceOption(_ unionAll _)
  }

  def vectorizeDeletes(spark: SparkSession, tableDir: Path): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val entries = resolveEntries(tableDir, meta)
    val pos = entries.filter(_.isPosDelete)
    val dvs = entries.filter(_.isDvDelete)
    if (pos.isEmpty && (dvs.size <= 1)) return meta
    val fromPos = readPosPairs(spark, pos)
    val fromDv =
      if (dvs.isEmpty) None
      else Some(DeletionVectors.toPairs(spark,
        spark.read.schema(DeletionVectors.schema).parquet(dvs.map(_.path): _*)))
    val pairs = (fromPos.toSeq ++ fromDv.toSeq).reduce(_ unionAll _)
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    DeletionVectors.fromPairs(spark, pairs).write.parquet(writeDir.toString)
    val files = store.listFilesRec(writeDir)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    // merged entry's seq = newest REAL input seq (positional application
    // is path-keyed, so any seq ≤ table's lastSequenceNumber is sound —
    // never deleteSeq, whose Long.MaxValue legacy fallback would commit
    // a sentinel far above the table's sequence counter)
    val realSeqs = (pos ++ dvs).flatMap(_.seq)
    val maxSeq = if (realSeqs.nonEmpty) realSeqs.max else meta.lastSequenceNumber
    val keep = entries.filterNot(e => e.isPosDelete || e.isDvDelete)
    val merged = files.map(f => DataFileEntry(
      relativize(tableDir, f), content = "dv-deletes", seq = Some(maxSeq)))
    val all = (keep ++ merged).map(e => e.copy(path = relativize(tableDir, e.path)))
    commitManifest(tableDir, all, meta.currentSnapshot, "vectorize-deletes",
      added = merged.size)
  }

  /** Shared delete-file commit loop: stamps entries with the attempt's
    * sequence number, appends them to the current manifest and
    * commits; CAS losses retry on fresh state after `validate`. */
  private def commitDeleteEntries(
      tableDir: Path,
      mkEntries: Long => Seq[DataFileEntry],
      operation: String,
      validate: TableMetadata => Unit = _ => ()): TableMetadata = {
    var attempt = 0
    while (true) {
      val (_, cur) = load(tableDir).getOrElse(
        throw new CommitFailedException(s"table does not exist at $tableDir"))
      validate(cur)
      val parent = cur.currentSnapshot
      val delRel = mkEntries(cur.lastSequenceNumber + 1)
      try
        // delete-file commits are pure appends to the parent's entry
        // set — the segmented fast path makes them O(delete files) of
        // metadata (`all` is by-name and only forced in legacy mode)
        return commitManifest(tableDir,
          parent.map(rawSnapshotFiles(tableDir, _)).getOrElse(Seq.empty) ++ delRel,
          parent, operation,
          added = delRel.size, expectedSeq = Some(cur.lastSequenceNumber + 1),
          appendEntries = Some(delRel))
      catch {
        case e: CommitFailedException if attempt < 20 &&
            (e.getMessage.contains("concurrent commit") ||
             e.getMessage.contains("sequence moved") ||
             e.getMessage.contains("assert-ref-snapshot-id")) =>
          attempt += 1
          Thread.sleep(15L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** C69 — filter-scoped overwrite (`INSERT OVERWRITE ... PARTITION`,
    * `df.writeTo(t).overwrite(cond)`): atomically replace exactly the
    * rows matching `filters` with `newFiles`. File-granular
    * classification from manifest stats, never a table scan:
    *
    *  - provably disjoint files ([[Stats.mayContain]] false, incl.
    *    bucket-transform predicates derived via [[Transforms.derive]])
    *    are KEPT verbatim — entries, stats and sequence untouched;
    *  - provably all-matching files ([[Stats.mustAllMatch]], the
    *    strict projection) are dropped whole — no read, no write;
    *  - straddling files are rewritten copy-on-write: one Spark job
    *    over ONLY those files keeps the rows where the predicate is
    *    not TRUE (false OR null survives — SQL delete semantics).
    *
    * Because writes range-cluster on the partition spec's source
    * columns, partition-shaped predicates resolve almost entirely to
    * keep/drop; the rewrite set stays near-empty at any table size.
    * Commits through [[overwriteWith]]'s parent-snapshot guard: a
    * concurrent commit fails this operation rather than resurrecting
    * a stale keep-set. */
  def overwriteByFilter(
      spark: SparkSession,
      tableDir: Path,
      newFiles: Seq[String],
      filters: Seq[org.apache.spark.sql.sources.Filter]): TableMetadata = {
    import org.apache.spark.sql.sources.{And => FAnd, Filter}
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    requireNoPendingDeletes(tableDir, meta, "overwrite-by-filter")
    val nonTrivial = filters
      .filterNot(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
    val cond: Option[Filter] = nonTrivial.reduceOption(FAnd)
    if (cond.isEmpty) // truncate semantics
      return commitFiles(tableDir, newFiles, "overwrite")
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    val spec = meta.specs.find(_.specId == meta.defaultSpecId)
      .map(_.fields).getOrElse(Seq.empty)
    // evaluate against the stats schema incl. hidden bucket columns,
    // with derived bucket predicates joined in (same machinery as scan
    // pruning) so bucket-partitioned tables classify exactly too
    val statsSchema = Transforms.ptSchema(spec, schema)
    val pruneCond =
      (nonTrivial ++ (if (Transforms.hashCurrent(meta))
        nonTrivial.flatMap(Transforms.derive(spec, schema, _)) else Seq.empty))
        .reduce(FAnd)
    val entries = resolveEntries(tableDir, meta)
    val (touched, kept) =
      entries.partition(e => Stats.mayContain(e, statsSchema, pruneCond))
    val (_, partial) =
      touched.partition(e => Stats.mustAllMatch(e, statsSchema, cond.get))
    val survivorFiles =
      if (partial.isEmpty) Seq.empty
      else {
        val surv = survivorSource(spark, tableDir, meta, schema, partial)
          .filter(coalesce(not(filterColumn(cond.get)), lit(true)))
        val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
        surv.write.format(dataFormat(meta)).save(writeDir.toString)
        store.listFilesRec(writeDir)
          .filter(f => isDataFile(f.getName)).map(_.toString)
      }
    overwriteWith(tableDir, kept, newFiles ++ survivorFiles)
  }

  /** Straddling-file rows for an overwrite's copy-on-write rewrite.
    * On lineage-enabled tables (C70) the read goes through the DSv2
    * scan and carries `_row_id` out as the materialized physical
    * column, so surviving rows KEEP their ids across the rewrite.
    * Bucket-partitioned tables (C65/C72) re-materialize the hidden
    * `__pt_` columns so the rewritten survivor files keep the same
    * footer stats the originals had — pruning parity across the
    * rewrite. */
  private def survivorSource(
      spark: SparkSession, tableDir: Path, meta: TableMetadata,
      schema: StructType, partial: Seq[DataFileEntry]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val base =
      if (!lineageEnabled(meta)) readEntries(spark, tableDir, meta, partial)
      else {
        val t = new GraftTable(tableDir.toString, tableDir, meta, this, Some(partial))
        org.apache.spark.sql.execution.datasources.GraftBridge.ofRows(spark, t)
          .select(schema.fieldNames.toIndexedSeq.map(col)
            :+ col("_row_id").as(RowLineage.PhysCol): _*)
      }
    val bucketFields = meta.specs.find(_.specId == meta.defaultSpecId).toSeq
      .flatMap(s => Transforms.materialized(s.fields))
      .filter(f => schema.fieldNames.contains(f.name))
    bucketFields.foldLeft(base) { (d, f) =>
      d.withColumn(Transforms.ptColName(f),
        Transforms.clusterExpr(f.transform, f.name, schema(f.name).dataType))
    }
  }

  /** C69 — dynamic partition overwrite (`INSERT OVERWRITE` under
    * `spark.sql.sources.partitionOverwriteMode=dynamic`): replace
    * exactly the identity-partition values present in the incoming
    * data, keep every other partition verbatim. The incoming tuple
    * set is read from the new files' spec columns (one column-pruned
    * scan of the NEW data — O(write), not O(table)); existing files
    * then classify per tuple through the same keep / drop-whole /
    * rewrite-straddlers machinery as [[overwriteByFilter]].
    * Transform specs (bucket/truncate/temporal) are rejected — their
    * replacement semantics ("the bucket the row hashes to"?) are
    * ambiguous; use an explicit filter overwrite instead. */
  def overwriteDynamic(
      spark: SparkSession, tableDir: Path, newFiles: Seq[String]): TableMetadata = {
    import org.apache.spark.sql.sources.{And => FAnd, EqualTo, Filter, IsNull, Or => FOr}
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    requireNoPendingDeletes(tableDir, meta, "dynamic partition overwrite")
    val spec = meta.specs.find(_.specId == meta.defaultSpecId)
      .map(_.fields).getOrElse(Seq.empty)
    require(spec.nonEmpty && spec.forall(_.transform == "identity"),
      "dynamic partition overwrite requires an identity-partitioned table " +
      s"(spec: ${spec.map(f => s"${f.transform}(${f.name})").mkString(", ")})")
    if (newFiles.isEmpty) return meta
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    val cols = spec.map(_.name)
    val incoming = spark.read.schema(schema).format(dataFormat(meta))
      .load(newFiles: _*).select(cols.map(col): _*).distinct().collect()
    // one v1 filter per replaced tuple; null component ⇒ IsNull
    val tupleFilters: Seq[Filter] = incoming.toSeq.map { row =>
      cols.zipWithIndex.map { case (c, i) =>
        if (row.isNullAt(i)) IsNull(c): Filter else EqualTo(c, row.get(i)): Filter
      }.reduce(FAnd)
    }
    val replaced = tupleFilters.reduceOption(FOr)
    if (replaced.isEmpty) return commitFiles(tableDir, newFiles, "append")
    val entries = resolveEntries(tableDir, meta)
    val (touched, kept) =
      entries.partition(e => Stats.mayContain(e, schema, replaced.get))
    // a file drops whole when it provably sits inside ONE tuple
    val (_, partial) = touched.partition(e =>
      tupleFilters.exists(t => Stats.mustAllMatch(e, schema, t)))
    val survivorFiles =
      if (partial.isEmpty) Seq.empty
      else {
        // null-safe tuple match: survivors are rows NOT equal to any
        // replaced tuple (null components match via <=>)
        val matchAny = incoming.toSeq.map { row =>
          cols.zipWithIndex.map { case (c, i) =>
            col(c) <=> lit(row.get(i))
          }.reduce(_ && _)
        }.reduce(_ || _)
        val surv = survivorSource(spark, tableDir, meta, schema, partial).filter(not(matchAny))
        val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
        surv.write.format(dataFormat(meta)).save(writeDir.toString)
        store.listFilesRec(writeDir)
          .filter(f => isDataFile(f.getName)).map(_.toString)
      }
    overwriteWith(tableDir, kept, newFiles ++ survivorFiles)
  }

  /** v1 `sources.Filter` → `Column` via [[FilterColumns]] (shared with
    * the COW DELETE path), for the straddling-file survivor rewrites. */
  private def filterColumn(f: org.apache.spark.sql.sources.Filter)
      : org.apache.spark.sql.Column =
    FilterColumns.toColumn(f).getOrElse(
      throw new UnsupportedOperationException(s"overwrite filter: $f"))

  /** C73 — ANALYZE: one distributed aggregation computing per-column
    * NDV (HLL approx_count_distinct, ±2%) over the current snapshot,
    * committed as `graft.stats.ndv.<col>` table properties (stamped
    * with the analyzed snapshot id). Scans then surface these through
    * DSv2 `Statistics.columnStats()` alongside manifest-derived
    * min/max/null-counts, which is what Spark's CBO needs for join
    * reordering and build-side choice — the piece a 100-TB star join
    * cannot infer from sizeInBytes alone. O(1 scan) to refresh,
    * metadata-only to serve. */
  def analyze(spark: SparkSession, tableDir: Path): TableMetadata = {
    import org.apache.spark.sql.functions.{approx_count_distinct, col}
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    if (meta.currentSnapshot.isEmpty || schema.isEmpty) return meta
    val df = read(spark, tableDir)
    val aggs = schema.fields.map(f => approx_count_distinct(col(f.name)).as(f.name))
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect().head
    val props = schema.fields.zipWithIndex.map { case (f, i) =>
      s"graft.stats.ndv.${f.name}" -> row.getLong(i).toString
    }.toMap + ("graft.stats.analyzed-snapshot" ->
      meta.currentSnapshot.get.snapshotId.toString)
    commit(tableDir, Seq.empty, Seq(MetadataUpdate.SetProperties(props)))
  }

  /** Rewrite the table with all pending deletes applied (and drop the
    * delete files from the manifest): an overwrite snapshot of the
    * MOR-resolved read. */
  def applyDeletes(spark: SparkSession, tableDir: Path, numFiles: Int = 0): TableMetadata =
    write(tableDir, read(spark, tableDir), "overwrite",
      if (numFiles > 0) Some(numFiles) else None)

  /** Exactly-once streaming sink commit: lands `batch` as one append
    * snapshot AND records the micro-batch id under `sinkKey` in the
    * SAME metadata commit, so a replayed batch (failure between
    * Spark's checkpoint and our commit, or after) is recognized and
    * skipped — the DSv2 streaming-sink idempotence pattern, applied to
    * the CAS protocol. Concurrent non-stream commits retry through;
    * the parquet write itself runs once (replay attempts leave only
    * unreferenced orphans). */
  def commitStreamBatch(
      tableDir: Path,
      batch: DataFrame,
      sinkKey: String,
      batchId: Long,
      maxRetries: Int = 20): Unit = {
    val (_, meta0) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    if (meta0.properties.get(sinkKey).exists(_.toLong >= batchId)) return // replay
    if (batch.isEmpty) return
    val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
    batch.write.format(dataFormat(meta0)).save(writeDir.toString)
    val files = store.listFilesRec(writeDir)
      .filter(f => isDataFile(f.getName)).map(_.toString)
    var attempt = 0
    while (true) {
      val (_, cur) = load(tableDir).getOrElse(
        throw new CommitFailedException(s"table does not exist at $tableDir"))
      if (cur.properties.get(sinkKey).exists(_.toLong >= batchId)) return
      try {
        commit(tableDir,
          Seq(Requirement.AssertRefSnapshotId("main",
            cur.currentSnapshot.map(_.snapshotId))),
          buildSnapshotUpdates(tableDir, cur, files, "append") :+
            MetadataUpdate.SetProperties(Map(sinkKey -> batchId.toString)))
        return
      } catch {
        case e: CommitFailedException if attempt < maxRetries &&
            (e.getMessage.contains("concurrent commit") ||
             e.getMessage.contains("assert-ref-snapshot-id")) =>
          attempt += 1
          Thread.sleep(15L * attempt)
      }
    }
  }

  /** Compact equality-delete files: a high-churn table accumulates one
    * tiny delete file per delete commit, and every scan collects each
    * of them. Merges delete files that share a key-column set into
    * one, WITHOUT changing masking semantics: a merged file carries
    * the group's MAX sequence number, which is only sound when no
    * data file's sequence falls inside the group's (minSeq, maxSeq]
    * window — otherwise the older delete's keys would start masking a
    * file appended after it. Groups are split at every such data-file
    * boundary, so the merge is always semantics-preserving; a
    * fully-quiet table (no interleaved appends) compacts to one file
    * per key set. Data files are untouched — O(delete keys) work. */
  def compactDeletes(spark: SparkSession, tableDir: Path): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val entries = resolveEntries(tableDir, meta)
    val eqDels = entries.filter(_.isEqDelete)
    if (eqDels.size < 2) return meta
    val dataSeqs = entries.filter(_.isData).map(_.dataSeq).distinct.sorted
    // partition each key-set's delete files into runs with no data-file
    // sequence strictly inside the run's sequence span
    def runs(dels: Seq[DataFileEntry]): Seq[Seq[DataFileEntry]] = {
      val sorted = dels.sortBy(_.deleteSeq)
      sorted.tail.foldLeft(Vector(Vector(sorted.head))) { (acc, e) =>
        val run = acc.last
        val lo = run.head.deleteSeq
        // a data file with lo <= seq < e.deleteSeq must not be re-masked
        if (dataSeqs.exists(s => s >= lo && s < e.deleteSeq)) acc :+ Vector(e)
        else acc.init :+ (run :+ e)
      }
    }
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    val keep = entries.filterNot(_.isEqDelete)
    val merged = eqDels.groupBy(_.equalityColumns).toSeq.flatMap { case (cols, dels) =>
      runs(dels).flatMap { run =>
        if (run.size == 1) run
        else {
          val keySchema = StructType(schema.fields.filter(f => cols.contains(f.name)))
          val writeDir = new Path(dataDir(tableDir), s"w-${UUID.randomUUID()}")
          spark.read.schema(keySchema).parquet(run.map(_.path): _*)
            .distinct().write.parquet(writeDir.toString)
          store.listFilesRec(writeDir)
            .filter(_.getName.endsWith(".parquet")).map(_.toString)
            .map(f => DataFileEntry(relativize(tableDir, f), content = "eq-deletes",
              equalityColumns = cols, seq = Some(run.map(_.deleteSeq).max)))
        }
      }
    }
    val all = (keep ++ merged).map(e => e.copy(path = relativize(tableDir, e.path)))
    commitManifest(tableDir, all, meta.currentSnapshot, "compact-deletes",
      added = merged.size)
  }

  /** Fails fast when live merge-on-read deletes make a raw-file
    * operation unsound (copy-on-write rewrites read files directly and
    * would resurrect MOR-deleted rows; a rewrite also invalidates
    * positional-delete coordinates). */
  def requireNoPendingDeletes(tableDir: Path, meta: TableMetadata, op: String): Unit =
    if (resolveEntries(tableDir, meta).exists(_.isDelete))
      throw new IllegalStateException(
        s"$op requires applying pending merge-on-read deletes first " +
        s"(TableOps.applyDeletes) — copy-on-write over merge-on-read state " +
        s"would resurrect deleted rows")

  /** Shared manifest-writing commit used by entry-level commits.
    * `expectedSeq` guards entries pre-stamped with a sequence number:
    * if another commit bumped the table's sequence since the caller
    * read it, the attempt aborts (and the caller's retry loop
    * restamps on fresh state). */
  private def commitManifest(
      tableDir: Path,
      all: => Seq[DataFileEntry],
      parent: Option[Snapshot],
      operation: String,
      added: Int,
      expectedSeq: Option[Long] = None,
      appendEntries: Option[Seq[DataFileEntry]] = None): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    expectedSeq.filter(_ != meta.lastSequenceNumber + 1).foreach { want =>
      throw new CommitFailedException(
        s"concurrent commit on $tableDir: sequence moved (expected $want, " +
        s"next is ${meta.lastSequenceNumber + 1})")
    }
    val snapId = newSnapshotId()
    val (manifestName, total) =
      writeManifestFor(tableDir, meta, snapId, parent, appendEntries, all)
    val snap = Snapshot(
      snapshotId = snapId,
      parentSnapshotId = parent.map(_.snapshotId),
      sequenceNumber = meta.lastSequenceNumber + 1,
      timestampMs = System.currentTimeMillis(),
      operation = operation,
      manifest = manifestName,
      summary = Map(
        "added-files" -> added.toString,
        "total-files" -> total.toString),
      schemaId = meta.currentSchemaId)
    commit(tableDir,
      Seq(Requirement.AssertRefSnapshotId("main", parent.map(_.snapshotId))),
      Seq(
        MetadataUpdate.AddSnapshot(snap),
        MetadataUpdate.SetSnapshotRef("main", snapId, "branch")))
  }

  /** Lineage-replay commit ([[IcebergImport]]): writes the given
    * entries — absolute paths, caller-assigned sequence numbers and
    * content kinds — verbatim as the next snapshot's manifest. Import
    * runs single-writer on a fresh table, so no retry loop. */
  private[catalog] def commitReplay(
      tableDir: Path,
      entries: Seq[DataFileEntry],
      operation: String,
      added: Int): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val rel = entries.map(e => e.copy(path = relativize(tableDir, e.path)))
    commitManifest(tableDir, rel, meta.currentSnapshot, operation, added)
  }

  /** Row-level change feed (CDC) for the snapshots in
    * `(fromSeqExclusive, toSeqInclusive]` on the main lineage, computed
    * purely from snapshot file diffs — no change log is stored:
    *
    *  - append snapshots surface their added files' rows as inserts;
    *  - rewrite snapshots (overwrite / delete / upsert) surface the
    *    row-level difference: rows only in removed files are deletes,
    *    rows only in added files are inserts — so a compaction (same
    *    rows, new files) nets to ZERO changes;
    *  - updates appear as delete(old) + insert(new), the standard
    *    changelog-from-snapshots semantics.
    *
    * Output = table schema + `_change_type` ('insert' | 'delete') +
    * `_commit_seq`. The EXCEPT ALL diffs shuffle only the REWRITTEN
    * files' rows, never the whole table, so the cost tracks churn. */
  def changes(
      spark: SparkSession,
      tableDir: Path,
      fromSeqExclusive: Long,
      toSeqInclusive: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (_, meta) = load(tableDir).getOrElse(
      throw new IllegalArgumentException(s"table does not exist at $tableDir"))
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    val byId = meta.snapshots.map(s => s.snapshotId -> s).toMap
    val lineage = Iterator.iterate(meta.currentSnapshot)(
        _.flatMap(_.parentSnapshotId).flatMap(byId.get))
      .takeWhile(_.isDefined).flatten.toSeq.reverse
    def stateEntries(s: Option[Snapshot]): Seq[DataFileEntry] =
      s.map(sn => scala.util.Try(snapshotEntries(tableDir, sn)).getOrElse(Seq.empty))
        .getOrElse(Seq.empty)
    /** MOR-resolved read of `state`, restricted to a data-file subset
      * (the state's delete files always ride along, so masked rows
      * never surface as changes). */
    def resolved(state: Seq[DataFileEntry], restrictTo: Set[String]): DataFrame =
      readEntries(spark, tableDir, meta,
        state.filter(e => !e.isData || restrictTo.contains(e.path)))
    val empty = readEntries(spark, tableDir, meta, Seq.empty)
      .withColumn("_change_type", lit("")).withColumn("_commit_seq", lit(0L))
    lineage
      .filter(s => s.sequenceNumber > fromSeqExclusive && s.sequenceNumber <= toSeqInclusive)
      .map { snap =>
        val parent = snap.parentSnapshotId.flatMap(byId.get)
        val cur = stateEntries(Some(snap))
        val prev = stateEntries(parent)
        snap.operation match {
          case "eq-delete" =>
            // No data-file diff; the row-level change is "parent-state
            // rows matching the newly committed delete keys" (rows
            // already dead under the parent's own deletes excluded by
            // the resolved read).
            val prevDel = prev.filter(_.isDelete).map(_.path).toSet
            val newDels = cur.filter(_.isEqDelete).filterNot(e => prevDel.contains(e.path))
            val parentState = readEntries(spark, tableDir, meta, prev)
            newDels.groupBy(_.equalityColumns).toSeq.map { case (keyCols, es) =>
              val keySchema = StructType(schema.fields.filter(f => keyCols.contains(f.name)))
              val keys = spark.read.schema(keySchema).parquet(es.map(_.path): _*)
              parentState.join(keys, keyCols, "left_semi")
            }.reduceOption(_ unionAll _)
              .getOrElse(readEntries(spark, tableDir, meta, Seq.empty))
              .withColumn("_change_type", lit("delete"))
              .withColumn("_commit_seq", lit(snap.sequenceNumber))
          case op @ ("pos-delete" | "dv-delete" | "mor-update") =>
            // Row-level change = parent-state rows at the newly
            // deleted (file, ordinal) coordinates. Both sides of the
            // join carry scan-produced path strings, so raw equality
            // matches. Deletion vectors resolve through the same path:
            // bitmaps stream back out as coordinate pairs. mor-update
            // additionally appended the updated row images as NEW data
            // files — those surface as inserts below, so the commit
            // reads as row-level delete+insert pairs.
            val prevDel = prev.filter(_.isDelete).map(_.path).toSet
            val newDels = cur.filter(e => e.isPosDelete || e.isDvDelete)
              .filterNot(e => prevDel.contains(e.path))
            val posSchema = StructType(Seq(
              org.apache.spark.sql.types.StructField("_file",
                org.apache.spark.sql.types.StringType, nullable = false),
              org.apache.spark.sql.types.StructField("_pos",
                org.apache.spark.sql.types.LongType, nullable = false)))
            import org.apache.spark.sql.functions.{concat, lit, regexp_replace, when}
            val (newPos, newDv) = newDels.partition(_.isPosDelete)
            val posPairs = readPosPairs(spark, newPos)
            val dvPairs =
              if (newDv.isEmpty) None
              else Some(DeletionVectors.toPairs(spark,
                spark.read.schema(DeletionVectors.schema).parquet(newDv.map(_.path): _*)))
            // both sides normalized to bare absolute paths: stored
            // coordinates may be table-relative (rename-safe form),
            // scan-produced _file strings may carry a URI scheme
            // reduceOption: a pos/dv-delete snapshot can contribute no NEW
            // delete files (all paths already present in the parent state)
            val emptyPairs = spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], posSchema)
            val pairs = (posPairs.toSeq ++ dvPairs.toSeq)
              .reduceOption(_ unionAll _).getOrElse(emptyPairs)
              .withColumn("_file",
                when(col("_file").startsWith("/") || col("_file").contains(":/"),
                  regexp_replace(col("_file"), "^file:/+", "/"))
                .otherwise(concat(lit(tableDir.toUri.getPath + "/"), col("_file"))))
            val parentWithPos = org.apache.spark.sql.execution.datasources.GraftBridge
              .ofRows(spark,
                new GraftTable(tableDir.toString, tableDir, meta, this, Some(prev)))
              .select((schema.fieldNames.map(col) :+ col("_file") :+ col("_pos")).toSeq: _*)
              .withColumn("_file", regexp_replace(col("_file"), "^file:/+", "/"))
            val coordDeletes = parentWithPos.join(pairs, Seq("_file", "_pos"), "left_semi")
              .select(schema.fieldNames.map(col).toSeq: _*)
              .withColumn("_change_type", lit("delete"))
              .withColumn("_commit_seq", lit(snap.sequenceNumber))
            if (op != "mor-update") coordDeletes
            else {
              val curData = cur.filter(_.isData).map(_.path).toSet
              val prevData = prev.filter(_.isData).map(_.path).toSet
              val inserts = resolved(cur, curData -- prevData)
                .withColumn("_change_type", lit("insert"))
                .withColumn("_commit_seq", lit(snap.sequenceNumber))
              coordDeletes.unionAll(inserts)
            }
          case _ =>
            val curData = cur.filter(_.isData).map(_.path).toSet
            val prevData = prev.filter(_.isData).map(_.path).toSet
            val added = resolved(cur, curData -- prevData)
            val removed = resolved(prev, prevData -- curData)
            val inserts = added.exceptAll(removed)
              .withColumn("_change_type", lit("insert"))
            val deletes = removed.exceptAll(added)
              .withColumn("_change_type", lit("delete"))
            inserts.unionAll(deletes).withColumn("_commit_seq", lit(snap.sequenceNumber))
        }
      }
      .foldLeft(empty)(_ unionAll _)
  }

  /** Net row-level changes over a sequence window (Iceberg's
    * create_changelog_view net_changes mode): per-row-identity signed
    * counts collapse intermediate churn — a row inserted AND deleted
    * inside the window disappears, a delete+reinsert nets to nothing,
    * and multiplicity is preserved for duplicate rows. The output is
    * what a downstream sync must APPLY, not what happened — at 100 TB
    * the difference between replaying every intermediate rewrite and
    * shipping the delta. One hash aggregate over the raw feed. */
  def netChanges(
      spark: SparkSession,
      tableDir: Path,
      fromSeqExclusive: Long,
      toSeqInclusive: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, sum, when}
    val raw = changes(spark, tableDir, fromSeqExclusive, toSeqInclusive)
    val dataCols = raw.columns.filterNot(c => c == "_change_type" || c == "_commit_seq")
    val signed = raw.withColumn("_sign",
      when(col("_change_type") === "insert", 1L).otherwise(-1L))
    signed.groupBy(dataCols.map(col).toSeq: _*)
      .agg(sum(col("_sign")).as("_net"))
      .filter(col("_net") =!= 0L)
      .select((dataCols.map(col) :+
        when(col("_net") > 0, lit("insert")).otherwise(lit("delete")).as("_change_type") :+
        expr("abs(_net)").as("_copies")).toSeq: _*)
  }

  // ---------- maintenance ----------

  /** Expire snapshots older than `olderThanMs`, always retaining the
    * `retainLast` most recent and every ref target (the reference's
    * remove-snapshots update, driven by a retention policy). Manifest
    * files of expired snapshots are deleted; data files are left to
    * [[removeOrphanFiles]]. */
  def expireSnapshots(
      tableDir: Path,
      olderThanMs: Long,
      retainLast: Int = 1): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val keepNewest = meta.snapshots.sortBy(-_.timestampMs).take(retainLast).map(_.snapshotId).toSet
    val keepRefs = meta.refs.values.map(_.snapshotId).toSet
    val expire = meta.snapshots
      .filter(s => s.timestampMs < olderThanMs &&
        !keepNewest.contains(s.snapshotId) && !keepRefs.contains(s.snapshotId))
    if (expire.isEmpty) return meta
    val updated = commit(tableDir, Seq.empty,
      Seq(MetadataUpdate.RemoveSnapshots(expire.map(_.snapshotId))))
    // Segments are SHARED across snapshots (C66): resolve the retained
    // lineage's referenced set first, then delete only the expired
    // manifests and the segments nothing live still points at. A
    // legacy manifest reused as a segment of a later snapshot stays.
    val live = updated.snapshots
      .flatMap(s => s.manifest +: segmentsOrSelf(tableDir, s.manifest)).toSet
    expire.foreach { s =>
      val segs = segmentsOrSelf(tableDir, s.manifest) // read before deleting
      // externally-committed Avro manifest lists are OWNED by the
      // external writer (referenced by full path) — never delete them
      if (!live.contains(s.manifest) && !s.manifest.endsWith(".avro"))
        store.delete(manifestPath(tableDir, s.manifest))
      segs.filter(x => x != s.manifest && !live.contains(x) && !x.endsWith(".avro"))
        .foreach(x => store.delete(manifestPath(tableDir, x)))
    }
    updated
  }

  /** C66 maintenance: fold the current snapshot's manifest chain into
    * balanced segments of `targetEntries` — metadata only, zero data
    * I/O, entries preserved verbatim (paths, stats, content kinds and
    * per-entry sequence numbers, so MOR masking and CDC semantics are
    * untouched; the identical file set means `changes()` nets the
    * rewrite to zero). Complements the append-time auto-merge: run it
    * after churny maintenance windows to restore O(1) planning reads.
    * Prior snapshots keep their own manifests — time travel unaffected. */
  def rewriteManifests(tableDir: Path, targetEntries: Int = 5000): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val snap = meta.currentSnapshot.getOrElse(return meta)
    val entries = rawSnapshotFiles(tableDir, snap) // relative paths, verbatim
    val before = segmentsOrSelf(tableDir, snap.manifest).size
    val snapId = newSnapshotId()
    val segNames = entries.grouped(targetEntries).zipWithIndex.map { case (c, i) =>
      val n = s"seg-$snapId-$i.json"
      store.writeString(new Path(metadataDir(tableDir), n), MetadataJson.manifestToJson(c))
      n
    }.toSeq
    val manifestName = s"manifest-$snapId.json"
    store.writeString(new Path(metadataDir(tableDir), manifestName),
      MetadataJson.manifestListToJson(segNames))
    val newSnap = Snapshot(
      snapshotId = snapId,
      parentSnapshotId = Some(snap.snapshotId),
      sequenceNumber = meta.lastSequenceNumber + 1,
      timestampMs = System.currentTimeMillis(),
      operation = "rewrite-manifests",
      manifest = manifestName,
      summary = Map(
        "manifests-before" -> before.toString,
        "manifests-after" -> segNames.size.toString,
        "total-data-files" -> entries.size.toString),
      schemaId = meta.currentSchemaId)
    commit(tableDir,
      Seq(Requirement.AssertRefSnapshotId("main", Some(snap.snapshotId))),
      Seq(
        MetadataUpdate.AddSnapshot(newSnap),
        MetadataUpdate.SetSnapshotRef("main", snapId, "branch")))
  }

  /** Per-partition-value rollup of a snapshot's data files (files
    * single-valued on the identity spec; straddling or unpartitioned
    * files roll up under None). Metadata-only — O(manifest). */
  def partitionRollup(tableDir: Path, meta: TableMetadata): Seq[PartitionStat] = {
    val specCols = meta.specs.find(_.specId == meta.defaultSpecId)
      .map(_.fields.filter(_.transform == "identity").map(_.name)).getOrElse(Seq.empty)
    def keyOf(e: DataFileEntry): Option[String] =
      if (specCols.isEmpty) None
      else {
        val vals = specCols.map { c =>
          e.stats.get(c) match {
            case Some(ColumnStats(Some(mn), Some(mx), _)) if mn == mx => Some(s"$c=$mn")
            case _ => None
          }
        }
        if (vals.exists(_.isEmpty)) None else Some(vals.flatten.mkString("/"))
      }
    resolveEntries(tableDir, meta).filter(_.isData)
      .groupBy(keyOf).toSeq.sortBy(_._1.getOrElse(""))
      .map { case (k, es) =>
        PartitionStat(k, es.size.toLong, es.flatMap(_.rows).sum, es.flatMap(_.bytes).sum)
      }
  }

  /** C53 — partition statistics files (Iceberg's partition-stats
    * shape): persist the current snapshot's per-partition rollup as a
    * stats file and register it with the reference's set-statistics
    * update. `$partitions` then serves the persisted rollup instead of
    * re-deriving it from the manifest — at millions of files this is
    * the difference between O(1 stats read) and O(manifest) per
    * inspection. Stats are pinned to their snapshot: a later commit
    * makes them stale and readers fall back to the manifest (the
    * update overwrites per snapshot id; `remove-statistics` drops). */
  def computePartitionStats(tableDir: Path): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val snap = meta.currentSnapshot.getOrElse(
      throw new CommitFailedException("no snapshot to compute partition stats for"))
    val rollup = partitionRollup(tableDir, meta)
    val name = s"partition-stats-${snap.snapshotId}.json"
    store.writeString(new Path(metadataDir(tableDir), name),
      MetadataJson.partitionStatsToJson(rollup))
    commit(tableDir, Seq.empty,
      Seq(MetadataUpdate.SetStatistics(snap.snapshotId, name)))
  }

  /** Persisted partition stats for the CURRENT snapshot, if fresh. */
  def readPartitionStats(tableDir: Path, meta: TableMetadata): Option[Seq[PartitionStat]] =
    for {
      current <- meta.currentSnapshotId
      sf <- meta.statistics.find(_.snapshotId == current)
      json <- scala.util.Try(
        store.readString(new Path(metadataDir(tableDir), sf.statistics))).toOption
      stats <- scala.util.Try(MetadataJson.partitionStatsFromJson(json)).toOption
    } yield stats

  /** C49 — snapshot rollback: point `main` back at an earlier
    * snapshot of its own lineage (Iceberg's rollback_to_snapshot).
    * Pure metadata — no data movement; the rolled-back-past snapshots
    * stay in the table (still tag-able / inspectable) until
    * [[expireSnapshots]] reclaims them, and the rollback itself is a
    * guarded CAS commit so a concurrent writer loses cleanly rather
    * than interleaving. The CDC/streaming feeds follow the NEW main
    * lineage (they walk parent pointers), so consumers never see the
    * rolled-back commits replayed. */
  def rollbackTo(tableDir: Path, snapshotId: Long): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val target = meta.snapshotById(snapshotId).getOrElse(
      throw new CommitFailedException(s"snapshot $snapshotId does not exist"))
    val mainLineage = Iterator.iterate(meta.currentSnapshot)(
        _.flatMap(_.parentSnapshotId).flatMap(meta.snapshotById))
      .takeWhile(_.isDefined).flatten.map(_.snapshotId).toSet
    if (!mainLineage.contains(target.snapshotId))
      throw new CommitFailedException(
        s"snapshot $snapshotId is not an ancestor of main — use a branch ref instead")
    commit(tableDir,
      Seq(Requirement.AssertRefSnapshotId("main", meta.currentSnapshotId)),
      Seq(MetadataUpdate.SetSnapshotRef("main", snapshotId, "branch")))
  }

  /** Main-lineage state as of sequence number `seq` (inclusive): the
    * newest main-lineage snapshot with sequenceNumber <= `seq`,
    * MOR-resolved; `seq` before the first commit reads empty. The
    * sequence-number twin of `read(snapshotId=...)`, used by
    * incremental consumers whose watermarks are sequence numbers
    * ([[Materialized]], the streaming source). */
  def readAtSeq(spark: SparkSession, tableDir: Path, seq: Long): DataFrame = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new IllegalArgumentException(s"table does not exist at $tableDir"))
    val lineage = Iterator.iterate(meta.currentSnapshot)(
        _.flatMap(_.parentSnapshotId).flatMap(meta.snapshotById))
      .takeWhile(_.isDefined).flatten
    val snap = lineage.find(_.sequenceNumber <= seq)
    readEntries(spark, tableDir, meta,
      snap.map(sn => snapshotEntries(tableDir, sn)).getOrElse(Seq.empty))
  }

  /** Tag retention: drop tag refs whose target snapshot is older than
    * `olderThanMs` (branches are never touched). Freed snapshots then
    * become eligible for [[expireSnapshots]] — the two-step policy
    * Iceberg documents for tag-based retention. */
  def expireTags(tableDir: Path, olderThanMs: Long): TableMetadata = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val old = meta.refs.collect {
      case (name, r) if r.refType == "tag" &&
          meta.snapshotById(r.snapshotId).exists(_.timestampMs < olderThanMs) => name
    }.toSeq
    if (old.isEmpty) meta
    else commit(tableDir, Seq.empty, old.map(MetadataUpdate.RemoveSnapshotRef(_)))
  }

  /** Delete data files under the table's data dir that no live
    * snapshot references (left by aborted writes or expired
    * snapshots). Returns the deleted paths.
    *
    * `graceMs` protects IN-FLIGHT writers: a concurrent write's files
    * exist before its commit and would look orphaned; only files older
    * than the grace window are eligible (default 1 hour — same reason
    * Iceberg's remove_orphan_files defaults to a retention interval).
    */
  def removeOrphanFiles(tableDir: Path, graceMs: Long = 3600000L): Seq[String] = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new CommitFailedException(s"table does not exist at $tableDir"))
    val referenced = meta.snapshots
      .flatMap(s => scala.util.Try(snapshotFiles(tableDir, s)).getOrElse(Seq.empty))
      .map(p => new Path(p).toUri.getPath).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val orphans = store.listFilesRec(dataDir(tableDir))
      .filter { p =>
        p.getName.endsWith(".parquet") &&
        !referenced.contains(p.toUri.getPath) &&
        scala.util.Try(store.fs(p).getFileStatus(p).getModificationTime <= cutoff)
          .getOrElse(false)
      }
    orphans.foreach(store.delete)
    orphans.map(_.toString)
  }

  /** Register existing parquet files as a table (the reference's
    * RegisterTable, logic/table.go:127): fresh metadata whose first
    * snapshot references the files in place — no data copy. */
  def register(
      tableDir: Path,
      schema: TableSchema,
      files: Seq[String],
      properties: Map[String, String] = Map.empty): TableMetadata = {
    create(tableDir, TableMetadata.create(
      tableDir.toString, schema, PartitionSpec(0, Seq.empty),
      SortOrder(0, Seq.empty), properties))
    commitFiles(tableDir, files, "append")
  }

  /** Resolve the data files to read: by explicit snapshot id, by named
    * ref (branch/tag), by as-of-timestamp over the snapshot log, or the
    * current snapshot. Empty table reads as an empty relation. */
  def resolveFiles(
      tableDir: Path,
      meta: TableMetadata,
      snapshotId: Option[Long] = None,
      ref: Option[String] = None,
      asOfTimestampMs: Option[Long] = None): Seq[String] =
    resolveEntries(tableDir, meta, snapshotId, ref, asOfTimestampMs).map(_.path)

  /** The snapshot a (snapshotId | ref | asOfTimestampMs) selector
    * resolves to — the SINGLE rule shared by file resolution and
    * schema pinning, so a time-travel read can never serve one
    * snapshot's files through another snapshot's schema. Timestamp
    * selection walks `snapshotLog` (the main-branch lineage, in log
    * order), NOT `snapshots` — the latter also holds WAP-branch
    * snapshots and rolled-back heads whose wall-clock timestamps
    * interleave with main's. */
  def resolveSnapshot(
      meta: TableMetadata,
      snapshotId: Option[Long] = None,
      ref: Option[String] = None,
      asOfTimestampMs: Option[Long] = None): Option[Snapshot] =
    (snapshotId, ref, asOfTimestampMs) match {
      case (Some(id), _, _) =>
        Some(meta.snapshotById(id).getOrElse(
          throw new IllegalArgumentException(s"snapshot $id not found")))
      case (_, Some(r), _) =>
        Some(meta.snapshotByRef(r).getOrElse(
          throw new IllegalArgumentException(s"ref '$r' not found")))
      case (_, _, Some(ts)) =>
        val eligible = meta.snapshotLog.filter(_.timestampMs <= ts)
        if (eligible.isEmpty)
          throw new IllegalArgumentException(s"no snapshot at or before timestamp $ts")
        meta.snapshotById(eligible.last.snapshotId)
      case _ => meta.currentSnapshot
    }

  /** Like [[resolveFiles]] but keeps the per-file stats for skipping. */
  def resolveEntries(
      tableDir: Path,
      meta: TableMetadata,
      snapshotId: Option[Long] = None,
      ref: Option[String] = None,
      asOfTimestampMs: Option[Long] = None): Seq[DataFileEntry] = {
    val snap = resolveSnapshot(meta, snapshotId, ref, asOfTimestampMs)
    // stats re-keyed to current column names (field-id evolution):
    // pruning/SPJ/$files read them without knowing about renames
    snap.map(snapshotEntries(tableDir, _)).getOrElse(Seq.empty)
      .map(SchemaEvolution.statsToCurrent(meta, _))
  }

  /** Read a table state as a DataFrame (time-travel via the options).
    * Merge-on-read aware: pending equality deletes are applied with
    * one left-anti join per applicable (key-column set, sequence)
    * delete group — the sequence rule means a delete masks only data
    * files committed BEFORE it, so data files are bucketed by their
    * applicable-delete set (one bucket per delete boundary, a handful
    * at most) and the buckets union. Positional deletes need row
    * ordinals, which only the per-file DSv2 scan assigns — such reads
    * route through [[GraftTable]]'s scan. */
  def read(
      spark: SparkSession,
      tableDir: Path,
      snapshotId: Option[Long] = None,
      ref: Option[String] = None,
      asOfTimestampMs: Option[Long] = None): DataFrame = {
    val (_, meta) = load(tableDir).getOrElse(
      throw new IllegalArgumentException(s"table does not exist at $tableDir"))
    val entries = resolveEntries(tableDir, meta, snapshotId, ref, asOfTimestampMs)
    readEntries(spark, tableDir, meta, entries)
  }

  /** [[read]] over an explicit (already resolved) entry list. */
  def readEntries(
      spark: SparkSession,
      tableDir: Path,
      meta: TableMetadata,
      entries: Seq[DataFileEntry]): DataFrame = {
    val schema = SchemaBridge.toSpark(meta.currentSchema)
    val dataEntries = entries.filter(_.isData)
    val eqDels = entries.filter(_.isEqDelete)
    def emptyDf =
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    if (entries.exists(e => e.isPosDelete || e.isDvDelete))
      return org.apache.spark.sql.execution.datasources.GraftBridge.ofRows(spark,
        new GraftTable(tableDir.toString, tableDir, meta, this, Some(entries)))
    if (dataEntries.isEmpty) return emptyDf
    if (eqDels.isEmpty) {
      // field-id evolution: files written before a RENAME are read via
      // their physical names (current order ⇒ positional alignment)
      val groups = dataEntries.groupBy(e => SchemaEvolution.renames(meta, e))
      return groups.map { case (rn, es) =>
        spark.read.schema(SchemaEvolution.physStructType(schema, rn))
          .format(dataFormat(meta)).load(es.map(_.path): _*)
          .toDF(schema.fieldNames.toIndexedSeq: _*)
      }.reduce(_ unionAll _)
    }
    if (dataEntries.exists(e => SchemaEvolution.renames(meta, e).nonEmpty))
      throw new UnsupportedOperationException(
        "reading renamed-column history with pending merge-on-read deletes " +
        "is not supported — run TableOps.applyDeletes first")
    // a delete applies only if its sequence is newer AND its key range
    // could intersect the data file's (manifest stats on both sides —
    // a delete of yesterday's ids never forces a probe of last year's
    // files)
    dataEntries.groupBy(df => eqDels.filter(e => e.deleteSeq > df.dataSeq &&
        e.equalityColumns.forall(c => Stats.rangesMayOverlap(e, df, schema, c)))
      .map(_.path).toSet)
      .toSeq.sortBy(_._1.size)
      .map { case (delPaths, files) =>
        val base = spark.read.schema(schema).format(dataFormat(meta))
          .load(files.map(_.path): _*)
        eqDels.filter(e => delPaths.contains(e.path)).groupBy(_.equalityColumns)
          .foldLeft(base) { case (df, (keyCols, delEntries)) =>
            val keySchema = StructType(schema.fields.filter(f => keyCols.contains(f.name)))
            val keys = spark.read.schema(keySchema).parquet(delEntries.map(_.path): _*)
            df.join(keys, keyCols, "left_anti")
          }
      }
      .reduce(_ unionAll _)
  }
}

/** Spark StructType ↔ catalog schema. Field ids are assigned
  * positionally at create time and preserved thereafter (new columns
  * get ids above lastColumnId, as the reference's HighestFieldID
  * bookkeeping does). */
object SchemaBridge {
  /** Spark's column-default metadata keys (C75): CURRENT_DEFAULT is
    * the SQL text the analyzer substitutes for omitted INSERT columns;
    * EXISTS_DEFAULT is the constant-folded literal the parquet/ORC
    * readers fill into files that PREDATE the column — exactly
    * Iceberg v3's write-default / initial-default split. */
  val CurrentDefaultKey = "CURRENT_DEFAULT"
  val ExistsDefaultKey = "EXISTS_DEFAULT"

  def fromSpark(st: StructType, firstId: Int = 1): TableSchema =
    TableSchema(0, st.fields.zipWithIndex.toSeq.map { case (f, i) =>
      val cur = if (f.metadata.contains(CurrentDefaultKey))
        Some(f.metadata.getString(CurrentDefaultKey)) else None
      val init = if (f.metadata.contains(ExistsDefaultKey))
        Some(f.metadata.getString(ExistsDefaultKey)) else None
      NestedField(firstId + i, f.name, f.dataType.sql, required = !f.nullable,
        initialDefault = init, writeDefault = cur)
    })

  def toSpark(s: TableSchema): StructType =
    StructType(s.fields.map { f =>
      val mb = new MetadataBuilder()
      f.writeDefault.foreach(mb.putString(CurrentDefaultKey, _))
      f.initialDefault.foreach(mb.putString(ExistsDefaultKey, _))
      StructField(f.name, DataType.fromDDL(f.dataType), nullable = !f.required,
        metadata = mb.build())
    })
}
