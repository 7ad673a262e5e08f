package graft.catalog

import java.util.Collections

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** C71 — SQL maintenance procedures (Spark 4 `ProcedureCatalog`):
  * `CALL graft.system.compact('ns.t', 4)` etc. — the operational
  * surface Iceberg exposes as `CALL catalog.system.*`, implemented on
  * Spark's native procedure API (no parser hacks; analyzer binds
  * arguments, including named-argument syntax). Each procedure runs
  * the corresponding [[TableOps]] maintenance op and returns a
  * one-row summary as a LocalScan.
  *
  * Reference: denali has no procedure surface (maintenance is REST
  * endpoints); this maps those operations onto the engine-side SQL
  * idiom Spark users expect.
  */
object Procedures {

  private val Namespace = Array("system")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Namespace))
      names.map(Identifier.of(Namespace, _)).toArray
    else Array.empty

  private def names: Seq[String] = Seq(
    "compact", "expire_snapshots", "remove_orphans", "rewrite_manifests",
    "apply_deletes", "rollback", "fast_forward", "cherrypick_snapshot", "vacuum",
    "create_branch", "create_tag", "drop_ref", "analyze", "maintenance_plan",
    "compact_where", "migrate_bucket_hash", "export_iceberg", "import_iceberg",
    "refresh_mv", "import_delete_vectors")

  def load(cat: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Namespace) && names.contains(ident.name),
      s"unknown procedure: ${ident.namespace.mkString(".")}.${ident.name}")
    new UnboundProcedure {
      override def name(): String = ident.name
      override def description(): String = s"graft maintenance procedure ${ident.name}"
      override def bind(inputType: StructType): BoundProcedure = bound(cat, ident.name)
    }
  }

  private def param(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).build()
  private def paramD(n: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(n, dt).defaultValue(default).build()

  private def bound(cat: GraftCatalog, proc: String): BoundProcedure = new BoundProcedure {
    override def name(): String = proc
    override def description(): String = s"graft maintenance procedure $proc"
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] = proc match {
      case "compact" => Array(param("table", StringType),
        paramD("num_files", IntegerType, "4"))
      case "expire_snapshots" => Array(param("table", StringType),
        paramD("older_than_ms", LongType, "0"), paramD("retain_last", IntegerType, "1"))
      case "remove_orphans" => Array(param("table", StringType),
        paramD("grace_ms", LongType, "3600000"))
      case "rewrite_manifests" => Array(param("table", StringType),
        paramD("target_entries", IntegerType, "5000"))
      case "apply_deletes" => Array(param("table", StringType),
        paramD("num_files", IntegerType, "0"))
      case "rollback" => Array(param("table", StringType), param("snapshot_id", LongType))
      case "cherrypick_snapshot" =>
        Array(param("table", StringType), param("snapshot_id", LongType))
      case "fast_forward" => Array(param("table", StringType),
        param("to_ref", StringType), param("from_ref", StringType))
      case "vacuum" => Array(param("table", StringType),
        paramD("retain_last", IntegerType, "1"), paramD("grace_ms", LongType, "0"))
      case "create_branch" | "create_tag" => Array(param("table", StringType),
        param("name", StringType), paramD("snapshot_id", LongType, "-1"))
      case "drop_ref" => Array(param("table", StringType), param("name", StringType))
      case "analyze" => Array(param("table", StringType))
      case "maintenance_plan" => Array(param("table", StringType),
        paramD("small_file_mb", IntegerType, "32"), paramD("retain_snapshots", IntegerType, "20"))
      case "compact_where" => Array(param("table", StringType),
        param("predicate", StringType), paramD("num_files", IntegerType, "1"))
      case "migrate_bucket_hash" => Array(param("table", StringType),
        paramD("num_files", IntegerType, "4"))
      case "export_iceberg" => Array(param("table", StringType))
      case "import_iceberg" => Array(param("table", StringType),
        param("metadata_json", StringType))
      case "refresh_mv" => Array(param("table", StringType),
        param("mv_table", StringType), param("keys", StringType),
        param("value", StringType))
      case "import_delete_vectors" => Array(param("table", StringType),
        param("puffin_path", StringType))
      case other => throw new IllegalArgumentException(other)
    }

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val dir = tableDir(cat, input.getUTF8String(0).toString)
      val ops = cat.ops
      def filesNow(): Int =
        ops.load(dir).map { case (_, m) => ops.resolveEntries(dir, m).count(_.isData) }
          .getOrElse(0)
      val scan: Scan = proc match {
        case "compact" =>
          val before = filesNow()
          val n = input.getInt(1)
          val meta =
            if (ops.lineageEnabled(ops.load(dir).get._2)) ops.compactLineage(spark, dir, n)
            else ops.compact(spark, dir, n)
          summary(
            Seq("snapshot_id" -> LongType, "files_before" -> IntegerType,
              "files_after" -> IntegerType),
            Seq[Any](meta.currentSnapshotId.getOrElse(-1L), before, filesNow()))
        case "expire_snapshots" =>
          val before = ops.load(dir).get._2.snapshots.size
          val meta = ops.expireSnapshots(dir, input.getLong(1), input.getInt(2))
          summary(
            Seq("expired" -> IntegerType, "remaining" -> IntegerType),
            Seq[Any](before - meta.snapshots.size, meta.snapshots.size))
        case "remove_orphans" =>
          val removed = ops.removeOrphanFiles(dir, input.getLong(1))
          summary(Seq("removed_files" -> IntegerType), Seq[Any](removed.size))
        case "rewrite_manifests" =>
          val meta = ops.rewriteManifests(dir, input.getInt(1))
          summary(Seq("snapshot_id" -> LongType),
            Seq[Any](meta.currentSnapshotId.getOrElse(-1L)))
        case "apply_deletes" =>
          val meta = ops.applyDeletes(spark, dir, input.getInt(1))
          summary(Seq("snapshot_id" -> LongType, "files" -> IntegerType),
            Seq[Any](meta.currentSnapshotId.getOrElse(-1L), filesNow()))
        case "rollback" =>
          val meta = ops.rollbackTo(dir, input.getLong(1))
          summary(Seq("current_snapshot_id" -> LongType),
            Seq[Any](meta.currentSnapshotId.getOrElse(-1L)))
        case "fast_forward" =>
          val meta = ops.fastForward(dir,
            input.getUTF8String(1).toString, input.getUTF8String(2).toString)
          summary(Seq("current_snapshot_id" -> LongType),
            Seq[Any](meta.currentSnapshotId.getOrElse(-1L)))
        case "cherrypick_snapshot" =>
          val meta = ops.cherryPick(dir, input.getLong(1))
          summary(
            Seq("current_snapshot_id" -> LongType, "source_snapshot_id" -> LongType),
            Seq[Any](meta.currentSnapshotId.getOrElse(-1L), input.getLong(1)))
        case "vacuum" =>
          val before = ops.load(dir).get._2.snapshots.size
          val meta = ops.expireSnapshots(dir, System.currentTimeMillis(), input.getInt(1))
          val removed = ops.removeOrphanFiles(dir, input.getLong(2))
          summary(
            Seq("expired_snapshots" -> IntegerType, "removed_files" -> IntegerType),
            Seq[Any](before - meta.snapshots.size, removed.size))
        case "create_branch" | "create_tag" =>
          val refName = input.getUTF8String(1).toString
          val meta0 = ops.load(dir).get._2
          val snapId = input.getLong(2) match {
            case -1L => meta0.currentSnapshotId.getOrElse(
              throw new IllegalStateException("table has no snapshot to reference"))
            case id => id
          }
          val refType = if (proc == "create_branch") "branch" else "tag"
          ops.commit(dir, Seq.empty,
            Seq(MetadataUpdate.SetSnapshotRef(refName, snapId, refType)))
          summary(Seq("ref" -> StringType, "snapshot_id" -> LongType),
            Seq[Any](refName, snapId))
        case "drop_ref" =>
          val refName = input.getUTF8String(1).toString
          ops.commit(dir, Seq.empty, Seq(MetadataUpdate.RemoveSnapshotRef(refName)))
          summary(Seq("dropped" -> StringType), Seq[Any](refName))
        case "analyze" =>
          val meta = ops.analyze(spark, dir)
          summary(Seq("analyzed_columns" -> IntegerType),
            Seq[Any](meta.properties.keys.count(_.startsWith("graft.stats.ndv."))))
        case "compact_where" =>
          // C80 — targeted compaction: only files whose stats overlap
          // the predicate are rewritten; the rest keep verbatim
          val before = filesNow()
          val meta = ops.compactWhere(spark, dir,
            input.getUTF8String(1).toString, input.getInt(2))
          summary(
            Seq("snapshot_id" -> LongType, "files_before" -> IntegerType,
              "files_after" -> IntegerType),
            Seq[Any](meta.currentSnapshotId.getOrElse(-1L), before, filesNow()))
        case "refresh_mv" =>
          // C88 — one call: create-if-absent + incremental refresh of
          // the MV, then register it for transparent rewrite. An
          // EXISTING destination dictates its kind (graft.mv.agg): a
          // minmax/hll MV dispatches to ITS refresh rather than dying
          // mid-flight on sum/count's missing value_sum column.
          val mvDir = tableDir(cat, input.getUTF8String(1).toString)
          val keys = input.getUTF8String(2).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val valueCol = input.getUTF8String(3).toString
          val mvKind = ops.load(mvDir)
            .map(_._2.properties.getOrElse("graft.mv.agg", "sumcount"))
            .getOrElse("sumcount")
          val mvMeta = mvKind match {
            case "sumcount" =>
              Materialized.refreshSumCount(spark, ops, dir, mvDir, keys, valueCol)
            case "minmax" =>
              Materialized.refreshMinMax(spark, ops, dir, mvDir, keys, valueCol)
            case "hll" =>
              Materialized.refreshApproxDistinct(spark, ops, dir, mvDir, keys, valueCol)
            case other => throw new IllegalArgumentException(
              s"refresh_mv: destination $mvDir is a '$other' MV — unknown kind")
          }
          Materialized.enableRewrite(ops, dir, mvDir)
          summary(
            Seq("mv_last_seq" -> LongType, "rewrite_enabled" -> StringType),
            Seq[Any](mvMeta.properties("graft.mv.last-seq").toLong, "true"))
        case "import_delete_vectors" =>
          // C89 — Iceberg v3 Puffin delete-vector-v1 blobs commit as
          // one graft dv-delete snapshot (CRC-validated read)
          val meta = ops.importDeleteVectorsPuffin(spark, dir,
            new Path(input.getUTF8String(1).toString))
          summary(Seq("snapshot_id" -> LongType),
            Seq[Any](meta.currentSnapshotId.getOrElse(-1L)))
        case "migrate_bucket_hash" =>
          // the migration path Transforms.BucketHashProp documents:
          // rewrite every data file (compact regenerates __pt_ under
          // the current Iceberg-spec hash, resolving pending deletes),
          // expire the pre-migration snapshots (their old-hash files
          // must not be time-traveled into under new-hash pruning),
          // then stamp the marker so derived pruning / bucket SPJ /
          // spec-1 export re-enable
          val meta0 = ops.load(dir).get._2
          if (!Transforms.anyBucket(meta0.specs))
            summary(Seq("status" -> StringType),
              Seq[Any]("no bucket transform in any spec — nothing to migrate"))
          else if (Transforms.hashCurrent(meta0))
            summary(Seq("status" -> StringType),
              Seq[Any]("already on the current bucket hash — nothing to migrate"))
          else {
            ops.compact(spark, dir, input.getInt(1))
            val snapsBefore = ops.load(dir).get._2.snapshots.size
            val expired = ops.expireSnapshots(dir, System.currentTimeMillis(), 1)
            ops.commit(dir, Seq.empty, Seq(MetadataUpdate.SetProperties(
              Map(Transforms.BucketHashProp -> Transforms.BucketHashCurrent))))
            summary(
              Seq("status" -> StringType, "rewritten_files" -> IntegerType,
                "expired_snapshots" -> IntegerType),
              Seq[Any](s"migrated to ${Transforms.BucketHashCurrent}", filesNow(),
                snapsBefore - expired.snapshots.size))
          }
        case "export_iceberg" =>
          // C57 surfaced to SQL: export the full snapshot lineage as
          // Iceberg v2 under <table>/iceberg (spec delete files + v3
          // DV Puffin blobs included when deletes are pending)
          val metaFile = IcebergExport.export(ops, dir, Some(spark))
          val snaps = ops.load(dir).get._2.snapshots.size
          summary(
            Seq("metadata_json" -> StringType, "snapshots" -> IntegerType),
            Seq[Any](metaFile.toString, snaps))
        case "import_iceberg" =>
          // C59 surfaced to SQL: adopt an Iceberg v2 table (snapshot
          // lineage + deletes replayed) as a NEW graft table at the
          // target identifier's warehouse location
          val metaJson = input.getUTF8String(1).toString
          val meta = IcebergImport.importTable(
            ops, new Path(metaJson), dir, Some(spark))
          summary(
            Seq("snapshots" -> IntegerType, "rows" -> LongType),
            Seq[Any](meta.snapshots.size,
              ops.read(spark, dir).count()))
        case "maintenance_plan" =>
          // C78 — the advisor: reads ONLY metadata (manifest entries +
          // snapshot log, no data files) and reports which maintenance
          // procedures are worth running, with the metric that triggered
          // each. The decision inputs are the same ones the maintenance
          // ops act on, so the advice is directly actionable.
          val meta = ops.load(dir).get._2
          val entries = ops.resolveEntries(dir, meta)
          val smallBytes = input.getInt(1).toLong * 1024 * 1024
          val retain = input.getInt(2)
          val data = entries.filter(_.isData)
          val small = data.filter(_.bytes.exists(_ < smallBytes))
          val dels = entries.count(e => e.isEqDelete || e.isPosDelete || e.isDvDelete)
          val segs = meta.currentSnapshot.toSeq
            .flatMap(sn => ops.segmentsOrSelf(dir, sn.manifest)).size
          val plan = Seq.newBuilder[(String, String, Long)]
          if (small.size >= 4) plan += (("compact",
            s"${small.size} of ${data.size} data files under ${input.getInt(1)} MB",
            small.size.toLong))
          if (dels > 0) plan += (("apply_deletes",
            s"$dels pending delete files force merge-on-read resolution on every scan",
            dels.toLong))
          if (segs > 4) plan += (("rewrite_manifests",
            s"manifest chain has $segs segments; folding bounds per-scan metadata reads",
            segs.toLong))
          if (meta.snapshots.size > retain) plan += (("expire_snapshots",
            s"${meta.snapshots.size} snapshots retained (> $retain); expiring enables orphan cleanup",
            meta.snapshots.size.toLong))
          // C88: registered MVs that fell behind the head stop
          // answering queries — metadata-only staleness probe
          val headSeq = meta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)
          meta.properties.get(RewriteToMaterializedView.RewriteProp)
            .toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
            .foreach { mvPath =>
              val behind = ops.load(new Path(mvPath)).flatMap { case (_, mv) =>
                mv.properties.get("graft.mv.last-seq").map(headSeq - _.toLong)
              }.getOrElse(headSeq)
              if (behind > 0) plan += (("refresh_mv",
                s"registered MV at $mvPath is $behind commit(s) behind the head; " +
                  "stale MVs never answer queries",
                behind))
            }
          val rows = plan.result()
          table(
            Seq("action" -> StringType, "reason" -> StringType, "metric" -> LongType),
            if (rows.isEmpty) Seq(Seq[Any]("none", "table is healthy", 0L))
            else rows.map(r => Seq[Any](r._1, r._2, r._3)))
        case other => throw new IllegalArgumentException(other)
      }
      Collections.singletonList(scan).iterator()
    }
  }

  private def tableDir(cat: GraftCatalog, name: String): Path = {
    val parts = name.split('.').toSeq
    require(parts.size >= 2, s"table name must be namespace-qualified: $name")
    cat.tablePath(Identifier.of(parts.init.toArray, parts.last))
  }

  /** Multi-row LocalScan (the advisor's output shape). */
  private def table(cols: Seq[(String, DataType)], rows: Seq[Seq[Any]]): Scan = {
    val schema = StructType(cols.map { case (n, dt) => StructField(n, dt, nullable = false) })
    val data = rows.map(vs => new GenericInternalRow(vs.map {
      case s: String => UTF8String.fromString(s): Any
      case other => other: Any
    }.toArray): InternalRow).toArray
    new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = data
    }
  }

  private def summary(cols: Seq[(String, DataType)], values: Seq[Any]): Scan = {
    val schema = StructType(cols.map { case (n, dt) => StructField(n, dt, nullable = false) })
    val row = new GenericInternalRow(values.map {
      case s: String => UTF8String.fromString(s): Any
      case other => other: Any
    }.toArray)
    new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
    }
  }
}
