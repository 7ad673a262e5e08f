package graft.catalog

import com.fasterxml.jackson.databind.JsonNode
import org.apache.hadoop.fs.Path
import scala.jdk.CollectionConverters._

/** Iceberg-v2 → graft interop (the read direction of
  * [[IcebergExport]]): parse a spec-compliant Iceberg table —
  * `metadata.json`, Avro manifest lists, Avro manifests — and register
  * its data files as a graft table, replaying the snapshot lineage in
  * sequence order so graft-side time travel works over the imported
  * history. Zero data copy: parquet files are referenced where they
  * are (the reference's register-table flow, routes/tables.go
  * registerTable, generalized to the whole lineage).
  *
  * Delete manifests (content=1) import when a SparkSession is
  * supplied: spec positional-delete files (`file_path`/`pos`, the
  * reserved 2147483546/2147483545 ids) convert to graft `pos-deletes`
  * coordinate parquet, equality-delete files (equality_ids → column
  * names via the source schema) to graft `eq-deletes` key parquet —
  * each converted ONCE and committed as its own delete snapshot, so
  * replay preserves the source's sequence ordering (equality deletes
  * keep masking only strictly-older files) and graft CDC resolves the
  * imported deletes row-level. Without a session, delete manifests
  * throw (import after the source engine compacts).
  *
  * Scope: format-version 2, parquet files, primitive + list types. */
object IcebergImport {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Iceberg type JSON (string primitive or list object) → Spark DDL. */
  private[catalog] def sparkType(t: JsonNode): String =
    if (t.isTextual) t.asText() match {
      case "boolean" => "boolean"
      case "int" => "int"
      case "long" => "bigint"
      case "float" => "float"
      case "double" => "double"
      case "date" => "date"
      case "string" | "uuid" => "string"
      case "binary" => "binary"
      case "timestamptz" => "timestamp"
      case "timestamp" => "timestamp_ntz"
      case d if d.startsWith("decimal") =>
        "decimal" + d.stripPrefix("decimal").replace(" ", "")
      case other => throw new UnsupportedOperationException(
        s"no Spark mapping for Iceberg type `$other`")
    }
    else if (t.get("type").asText() == "list")
      s"array<${sparkType(t.get("element"))}>"
    else throw new UnsupportedOperationException(
      s"no Spark mapping for Iceberg type ${t}")

  /** Iceberg v3 JSON default literal → SQL literal text (C75). */
  private def defaultSql(n: JsonNode): Option[String] =
    if (n == null || n.isNull) None
    else if (n.isTextual) Some("'" + n.asText().replace("'", "''") + "'")
    else if (n.isBoolean || n.isNumber) Some(n.asText())
    else None

  private def readSchema(n: JsonNode): TableSchema =
    TableSchema(
      Option(n.get("schema-id")).map(_.asInt()).getOrElse(0),
      Option(n.get("fields")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { f =>
        NestedField(f.get("id").asInt(), f.get("name").asText(),
          sparkType(f.get("type")),
          Option(f.get("required")).exists(_.asBoolean()),
          initialDefault = Option(f.get("initial-default")).flatMap(defaultSql),
          writeDefault = Option(f.get("write-default")).flatMap(defaultSql))
      })

  /** One live file of a source snapshot: content 0 = data, 1 =
    * position deletes, 2 = equality deletes. */
  private final case class SrcFile(
      path: String, rows: Long, bytes: Long, content: Int, equalityIds: Seq[Int],
      seq: Long)

  /** The live files of one snapshot: manifest list → manifests →
    * non-deleted entries. Paths as recorded (absolute). `seq` is the
    * entry's data sequence number, inherited from the manifest's when
    * the entry leaves it null (the spec's inheritance rule). */
  private def snapshotFiles(ops: TableOps, manifestList: Path): Seq[SrcFile] = {
    val (manifests, _, _) = IcebergExport.readAvro(ops, manifestList)
    manifests.flatMap { mf =>
      val mfSeq = Option(mf.get("sequence_number"))
        .map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
      val (entries, _, _) =
        IcebergExport.readAvro(ops, new Path(mf.get("manifest_path").toString))
      entries.flatMap { e =>
        val status = e.get("status").asInstanceOf[Number].intValue()
        if (status == 2) None // DELETED entry
        else {
          // The spec's sequence-number inheritance rule applies ONLY to
          // ADDED (status 1) entries: they were written by the manifest's
          // own commit, so its sequence is theirs. An EXISTING entry with
          // a null sequence is a non-compliant writer — inheriting the
          // (newer) manifest sequence would mis-order eq-delete masking,
          // so fail loudly instead.
          val eSeq = Option(e.get("sequence_number"))
            .map(_.asInstanceOf[Number].longValue())
            .getOrElse {
              if (status == 1) mfSeq
              else throw new IllegalArgumentException(
                s"${mf.get("manifest_path")}: EXISTING entry with null " +
                  "sequence_number (inheritance applies only to ADDED entries)")
            }
          val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          val content = Option(df.get("content"))
            .map(_.asInstanceOf[Number].intValue()).getOrElse(0)
          val fmt = df.get("file_format").toString
          if (!fmt.equalsIgnoreCase("parquet"))
            throw new UnsupportedOperationException(s"unsupported file format $fmt")
          val eqIds = Option(df.get("equality_ids")).map {
            case l: java.util.List[_] =>
              l.asScala.toSeq.map(_.asInstanceOf[Number].intValue())
            case a: org.apache.avro.generic.GenericData.Array[_] =>
              a.asScala.toSeq.map(_.asInstanceOf[Number].intValue())
          }.getOrElse(Seq.empty)
          Some(SrcFile(df.get("file_path").toString,
            df.get("record_count").asInstanceOf[Number].longValue(),
            df.get("file_size_in_bytes").asInstanceOf[Number].longValue(),
            content, eqIds, eSeq))
        }
      }
    }
  }

  /** C56 data plane — resolve a spec-Iceberg Avro manifest list into
    * graft scan entries, so an externally-committed add-snapshot (the
    * reference's pyiceberg flow: tests/pyiceberg/test_table.py) is
    * readable WITHOUT a full import — delete manifests included:
    * spec equality-delete parquet already stores real column names
    * (ids mapped through the table schema) and flows through graft's
    * eq-delete machinery untouched; spec positional-delete parquet
    * keeps the spec's `file_path`/`pos` column names, so it maps to
    * the `pos-deletes-spec` kind that scan/vectorize/CDC readers
    * request with the spec schema. Sequence numbers carry over, so
    * the strictly-older eq-delete masking rule holds for
    * externally-committed interleavings too. Paths normalize `file:`
    * URIs to plain POSIX form so they compare equal to graft-written
    * absolute entries in incremental diffs. */
  private[catalog] def manifestListEntries(
      ops: TableOps,
      tableDir: Path,
      manifestList: Path): Seq[DataFileEntry] = {
    lazy val idToName: Map[Int, String] = ops.load(tableDir)
      .map(_._2.currentSchema.fields.map(f => f.id -> f.name).toMap)
      .getOrElse(Map.empty)
    snapshotFiles(ops, manifestList).map { f =>
      val p = f.path.replaceFirst("^file:/+", "/")
      f.content match {
        case 0 => DataFileEntry(p,
          rows = Some(f.rows), bytes = Some(f.bytes), seq = Some(f.seq))
        case 1 => DataFileEntry(p, rows = Some(f.rows), bytes = Some(f.bytes),
          content = "pos-deletes-spec", seq = Some(f.seq))
        case 2 =>
          val names = f.equalityIds.map(id => idToName.getOrElse(id,
            throw new IllegalArgumentException(
              s"$manifestList: equality_ids $id not in the table schema")))
          DataFileEntry(p, rows = Some(f.rows), bytes = Some(f.bytes),
            content = "eq-deletes", equalityColumns = names, seq = Some(f.seq))
        case other => throw new UnsupportedOperationException(
          s"$manifestList: unknown manifest content kind $other")
      }
    }
  }

  /** Convert one spec delete file to graft form under
    * `<targetDir>/data/`; returns (graft files, graft content kind,
    * equality column names). Conversion is Spark-distributed; each
    * source file converts once per import. */
  private def convertDelete(
      ops: TableOps,
      spark: org.apache.spark.sql.SparkSession,
      targetDir: Path,
      f: SrcFile,
      idToName: Map[Int, String]): (Seq[String], String, Seq[String]) = {
    import org.apache.spark.sql.functions.col
    val outDir = new Path(new Path(targetDir, "data"),
      s"w-import-del-${java.util.UUID.randomUUID()}")
    val (df, content, eqCols) =
      if (f.content == 1) {
        val pairs = spark.read.parquet(f.path)
          .select(col("file_path").as("_file"), col("pos").as("_pos"))
        (pairs, "pos-deletes", Seq.empty[String])
      } else {
        val names = f.equalityIds.map(id => idToName.getOrElse(id,
          throw new IllegalArgumentException(
            s"equality_ids $id not in the source schema")))
        val keys = spark.read.parquet(f.path).select(names.map(col): _*)
        (keys, "eq-deletes", names)
      }
    df.coalesce(1).write.parquet(outDir.toString)
    val files = ops.store.listFilesRec(outDir)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    (files, content, eqCols)
  }

  /** Import the table at `metadataJson` (an Iceberg vN.metadata.json
    * path) as a graft table at `targetDir`, replaying its snapshot
    * lineage: pure-append steps commit only the added files as
    * `append`, new delete manifests as delete snapshots (needs
    * `spark`), everything else as `overwrite`. Returns the resulting
    * graft metadata. */
  def importTable(
      ops: TableOps,
      metadataJson: Path,
      targetDir: Path,
      spark: Option[org.apache.spark.sql.SparkSession] = None): TableMetadata = {
    if (ops.exists(targetDir))
      throw new IllegalArgumentException(s"target table already exists at $targetDir")
    val n = mapper.readTree(ops.store.readString(metadataJson))
    require(n.get("format-version").asInt() == 2,
      s"only format-version 2 is importable, got ${n.get("format-version")}")

    val currentSchemaId = n.get("current-schema-id").asInt()
    val schemas = n.get("schemas").elements().asScala.toSeq.map(readSchema)
    val schema = schemas.find(_.schemaId == currentSchemaId).getOrElse(schemas.head)
    val idToName = schemas.flatMap(_.fields.map(f => f.id -> f.name)).toMap
    val props = Option(n.get("properties"))
      .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty[String, String]) +
      ("graft.imported-from" -> metadataJson.toString)

    // Partition spec (write direction of IcebergExport's spec export):
    // the source's DEFAULT spec imports when every field's transform is
    // one graft knows and its source column exists — field names rebase
    // to the SOURCE column name (graft's partition fields are named by
    // source column; Transforms resolves them by name). A spec with any
    // unknown transform imports as unpartitioned rather than half a
    // spec. Foreign bucket-partitioned files carry no materialized
    // `__pt_` stats, so bucket pruning/SPJ simply stays off for them
    // (conservative), while graft-written files re-imported from an
    // export keep both.
    val defaultSpecId = Option(n.get("default-spec-id")).map(_.asInt()).getOrElse(0)
    val importedSpec = Option(n.get("partition-specs"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .find(s => Option(s.get("spec-id")).exists(_.asInt() == defaultSpecId))
      .map { s =>
        Option(s.get("fields")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { f =>
          val srcId = f.get("source-id").asInt()
          for {
            srcName <- idToName.get(srcId)
            t = f.get("transform").asText()
            _ <- scala.util.Try(Transforms.parse(t)).toOption
          } yield PartitionField(srcId, f.get("field-id").asInt(), srcName, t)
        }
      }
      .filter(fs => fs.nonEmpty && fs.forall(_.isDefined))
      .map(fs => PartitionSpec(0, fs.map(_.get)))
      .getOrElse(PartitionSpec(0, Seq.empty))

    ops.create(targetDir, TableMetadata.create(
      targetDir.toString, schema.copy(schemaId = 0),
      importedSpec, SortOrder(0, Seq.empty), props))
    val conf = ops.store.fs(targetDir).getConf

    // replay lineage in sequence order
    val snaps = Option(n.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
      .sortBy(_.get("sequence-number").asLong())
    // source path -> converted graft delete files (once per import)
    val converted =
      scala.collection.mutable.Map.empty[String, (Seq[String], String, Seq[String])]
    // source path -> graft sequence assigned at first appearance, so
    // later full-state commits preserve masking order (equality
    // deletes apply only to strictly-older data sequences)
    var seqOf = Map.empty[String, Long]
    var prevLive = Set.empty[String]
    // source snapshot id -> graft snapshot id holding the same state
    // (a metadata-only source snapshot maps to the last committed one)
    var snapMap = Map.empty[Long, Long]
    snaps.foreach { s =>
      val files = snapshotFiles(ops, new Path(s.get("manifest-list").asText()))
      val live = files.map(_.path).toSet
      if (live != prevLive) {
        val dels = files.filter(_.content != 0)
        if (dels.nonEmpty && spark.isEmpty)
          throw new UnsupportedOperationException(
            "source snapshot has delete manifests — pass a SparkSession " +
            "(IcebergImport.importTable(ops, json, dir, Some(spark))) to " +
            "convert them, or compact the source table first")
        dels.foreach { f =>
          converted.getOrElseUpdate(f.path,
            convertDelete(ops, spark.get, targetDir, f, idToName))
        }
        def deleteEntries(fs: Seq[SrcFile], seqFor: SrcFile => Long): Seq[DataFileEntry] =
          fs.flatMap { f =>
            val (paths, content, eqCols) = converted(f.path)
            paths.map(p => DataFileEntry(p, rows = Some(f.rows), content = content,
              equalityColumns = eqCols, seq = Some(seqFor(f))))
          }
        val newPaths = live -- prevLive
        val removed = prevLive -- live
        val dataF = files.filter(_.content == 0)
        val newData = dataF.filter(f => newPaths.contains(f.path))
        val newDels = dels.filter(f => newPaths.contains(f.path))
        if (removed.isEmpty && newDels.isEmpty) {
          // pure data append: commit only the delta
          val meta = ops.commitFiles(targetDir, newData.map(_.path), "append")
          newData.foreach(f => seqOf += f.path -> meta.lastSequenceNumber)
        } else if (removed.isEmpty && newData.isEmpty) {
          // pure delete addition: one graft delete snapshot per kind,
          // in eq-then-pos order (both mask by their own sequence)
          Seq("eq-deletes" -> "eq-delete", "pos-deletes" -> "pos-delete").foreach {
            case (kind, op) =>
              val ofKind = newDels.filter(f => converted(f.path)._2 == kind)
              if (ofKind.nonEmpty) {
                val meta0 = ops.load(targetDir).get._2
                val next = meta0.lastSequenceNumber + 1
                val cur = ops.resolveEntries(targetDir, meta0)
                val entries = deleteEntries(ofKind, _ => next)
                ops.commitReplay(targetDir, cur ++ entries, op, entries.size)
                ofKind.foreach(f => seqOf += f.path -> next)
              }
          }
        } else {
          // rewrite (or mixed add): commit the full converted state,
          // keeping each surviving file's first-assigned sequence
          val meta0 = ops.load(targetDir).get._2
          val next = meta0.lastSequenceNumber + 1
          // footer stats via the shared cached/distributed collector
          // (an imported snapshot can reference 10⁴+ files — same
          // driver-serialization concern as a regular commit)
          val collected = ops.collectStats(targetDir, dataF.map(_.path))
          val entries =
            dataF.zip(collected).map { case (f, e) =>
              e.copy(path = f.path,
                rows = e.rows.orElse(Some(f.rows)), // footer unreadable: keep manifest count
                seq = Some(seqOf.getOrElse(f.path, next)))
            } ++ deleteEntries(dels, f => seqOf.getOrElse(f.path, next))
          ops.commitReplay(targetDir, entries, "overwrite", newPaths.size)
          newPaths.foreach(p => seqOf += p -> next)
        }
      } // identical set (metadata-only source snapshot): no graft commit
      ops.load(targetDir).get._2.currentSnapshotId.foreach { gid =>
        snapMap += s.get("snapshot-id").asLong() -> gid
      }
      prevLive = live
    }
    // Statistics files (Puffin): re-register the source's stats files
    // for replayed snapshots under their graft snapshot ids, so
    // NDV/rollup statistics travel through export→import without a
    // re-analyze (set-statistics, the same update ANALYZE publishes).
    Option(n.get("statistics")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty).foreach { st =>
        for {
          src <- Option(st.get("snapshot-id")).map(_.asLong())
          gid <- snapMap.get(src)
          p <- Option(st.get("statistics-path")).map(_.asText())
        } ops.commit(targetDir, Seq.empty,
          Seq(MetadataUpdate.SetStatistics(gid, p)))
      }
    ops.load(targetDir).get._2
  }
}
