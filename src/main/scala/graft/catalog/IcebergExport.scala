package graft.catalog

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path

/** Iceberg-v2 file-format interop: materializes a graft table's
  * snapshot lineage as a SPEC-COMPLIANT Apache Iceberg v2 table under
  * `<tableDir>/iceberg/` — Avro manifest files, Avro manifest lists,
  * and an Iceberg-dialect `v<N>.metadata.json` (+ `version-hint.text`,
  * the Hadoop-catalog convention) — with every data file referenced
  * ABSOLUTELY from its original location, zero data copying. External
  * engines (pyiceberg, Trino, DuckDB-iceberg — what the reference's
  * own test suite drives, tests/pyiceberg/test_table.py) can then read
  * the table, including time travel across all exported snapshots.
  *
  * Shape per the Iceberg spec (and the reference's metadata writer,
  * logic/table.go:59-112): one manifest per snapshot listing its live
  * data files (status=ADDED, explicit data/file sequence numbers),
  * one manifest list per snapshot, Avro field-id annotations on every
  * manifest column (100-series for data_file, 500-series for
  * manifest_file), and `schemas` rewritten from Spark DDL type names
  * to Iceberg primitive names (`bigint`→`long`, `array<t>`→list with
  * fresh element-ids).
  *
  * The export is read-only interop: graft's own CAS metadata line
  * stays authoritative; re-export after new commits refreshes the
  * Iceberg view (same version numbering, so external readers see
  * monotone metadata versions).
  *
  * Pending merge-on-read deletes export faithfully when a
  * SparkSession is supplied: each graft delete file materializes ONCE
  * (snapshots share the result) as a spec v2 delete file under
  * `iceberg/data/` — positional/DV state as positional-delete parquet
  * (`file_path` 2147483546 / `pos` 2147483545, the spec's reserved
  * ids, sorted; deletion-vector bitmaps stream out via
  * [[DeletionVectors.toPairs]]), equality state as equality-delete
  * parquet carrying the table schema's field ids — referenced from a
  * content=1 delete manifest per snapshot. Without a session the
  * export refuses rather than silently dropping deletes (which would
  * resurrect dead rows in external engines). */
object IcebergExport {

  private val mapper = new ObjectMapper()

  /** One materialized spec delete file (shared across the snapshots
    * that reference the same graft delete file). `pathBound` is the
    * single data file a POSITION delete file references: exported as
    * lower==upper `file_path` bounds (field 2147483546) so iceberg-java
    * DeleteFileIndex path-indexes the file — unpartitioned position
    * deletes are NOT applied globally by Java readers (only equality
    * deletes get the global rule), so without bounds a spec-1 data
    * file could skip its deletes and resurrect rows. */
  private final case class DeleteExport(
      path: String, rows: Long, bytes: Long, content: Int, equalityIds: Seq[Int],
      pathBound: Option[String] = None)

  /** Export `tableDir`'s full snapshot lineage; returns the exported
    * metadata.json path. Pass `spark` when the lineage carries
    * merge-on-read delete files (they are materialized as spec v2
    * delete files + content=1 manifests). */
  def export(
      ops: TableOps,
      tableDir: Path,
      spark: Option[org.apache.spark.sql.SparkSession] = None): Path = {
    val (version, meta) = ops.load(tableDir).getOrElse(
      throw new IllegalArgumentException(s"table does not exist at $tableDir"))
    val store = ops.store
    val exportDir = new Path(tableDir, "iceberg")
    val metaDir = new Path(exportDir, "metadata")
    val dataDir = new Path(exportDir, "data")
    store.mkdirs(metaDir)

    val allBySnap = meta.snapshots.map(s => s -> ops.snapshotEntries(tableDir, s))
    // Without a SparkSession delete files cannot be materialized: a
    // delete-bearing CURRENT snapshot refuses (silently dropping the
    // deletes would resurrect dead rows in external engines);
    // delete-bearing HISTORY snapshots are omitted from the export
    // (graft-side time travel keeps them).
    if (spark.isEmpty && meta.currentSnapshot.exists(s =>
        ops.snapshotEntries(tableDir, s).exists(_.isDelete)))
      throw new UnsupportedOperationException(
        "table has pending merge-on-read deletes — pass a SparkSession " +
        "(IcebergExport.export(ops, dir, Some(spark))) to materialize them as " +
        "spec v2 delete files, or run TableOps.applyDeletes before exporting " +
        "(a spec export without delete manifests would resurrect deleted rows " +
        "in external engines)")
    val entriesBySnap =
      if (spark.isDefined) allBySnap
      else allBySnap.filter { case (_, es) => !es.exists(_.isDelete) }

    // fresh ids for nested (list element) types, above every field id
    var nextId = math.max(meta.lastColumnId, meta.schemas.map(_.highestFieldId).max)
    def allocId(): Int = { nextId += 1; nextId }
    val schemaJsons = meta.schemas.map(s => s.schemaId -> icebergSchema(s, () => allocId()))

    // graft delete file -> spec delete file(s), materialized once
    // (a positional/DV delete splits into one spec file per referenced
    // data file, each path-bounded — see DeleteExport.pathBound)
    val deleteCache = scala.collection.mutable.Map.empty[String, Seq[DeleteExport]]
    def materialized(e: DataFileEntry): Seq[DeleteExport] =
      deleteCache.getOrElseUpdate(e.path,
        materializeDelete(ops, spark.get, tableDir, dataDir, meta, e))

    // C65 faithful transform export: when the default spec's transforms
    // are reconstructible per-file from manifest stats, data files that
    // are provably single-valued under EVERY spec dimension export in a
    // spec-1 manifest with real partition tuples (bucket values are the
    // Iceberg-spec hash — external engines compute the same buckets);
    // straddler files export under spec-0 (unpartitioned) — less
    // pruning, never a wrong tuple. Delete files always export under
    // spec-0, which the Iceberg spec defines as GLOBAL application:
    // a position/equality delete file whose partition spec is
    // unpartitioned applies to data files of EVERY partition (spec
    // "Scan Planning" application rules), so spec-1 data manifests and
    // spec-0 delete manifests compose correctly in external engines —
    // pending deletes no longer force the whole snapshot to spec-0.
    val realSpec = exportableSpec(meta)

    // 1-2 data manifests (+ one delete manifest when pending deletes
    // exist) + one manifest list per snapshot
    val manifestLists = entriesBySnap.map { case (snap, entries) =>
      val schemaJson = schemaJsons.find(_._1 == snap.schemaId)
        .getOrElse(schemaJsons.head)._2
      val dataE = entries.filter(_.isData)
      val delE = entries.filter(_.isDelete)
      val (specE, plainE) = realSpec match {
        case Some(se) => dataE.partition(e => partitionTuple(se, e).isDefined)
        case _        => (Seq.empty[DataFileEntry], dataE)
      }
      val refs = Seq.newBuilder[ManifestRef]
      if (specE.nonEmpty) {
        val p = new Path(metaDir, s"m-${snap.snapshotId}-p.avro")
        val (len, rows) = writeManifest(ops, p, snap, specE, schemaJson, realSpec)
        refs += ManifestRef(p.toString, len, specId = 1, content = 0,
          files = specE.size, rows = rows, minSeq = 0L)
      }
      if (plainE.nonEmpty || specE.isEmpty) {
        val p = new Path(metaDir, s"m-${snap.snapshotId}.avro")
        val (len, rows) = writeManifest(ops, p, snap, plainE, schemaJson, None)
        refs += ManifestRef(p.toString, len, specId = 0, content = 0,
          files = plainE.size, rows = rows, minSeq = 0L)
      }
      val dels = delE.flatMap(e => materialized(e).map(e -> _))
      if (dels.nonEmpty) {
        val dPath = new Path(metaDir, s"m-${snap.snapshotId}-deletes.avro")
        val (dLen, dRows) = writeDeleteManifest(ops, dPath, snap, dels, schemaJson)
        refs += ManifestRef(dPath.toString, dLen, specId = 0, content = 1,
          files = dels.size, rows = dRows,
          minSeq = dels.map { case (e, _) => e.seq.getOrElse(snap.sequenceNumber) }.min)
      }
      val listPath = new Path(metaDir, s"snap-${snap.snapshotId}.avro")
      writeManifestList(ops, listPath, snap, refs.result())
      snap.snapshotId -> listPath.toString
    }.toMap

    // Puffin statistics for the current snapshot, registered in the
    // metadata.json `statistics` array (the spec's table-stats hook):
    // per-column manifest rollup, zero data reads.
    val puffin = meta.currentSnapshot.map { snap =>
      snap -> PuffinStats.write(ops, tableDir, meta, snap,
        new Path(metaDir, s"stats-${snap.snapshotId}.puffin"))
    }

    // Iceberg v3 forward-compat: the current snapshot's pending
    // deletion vectors ALSO serialize as Puffin delete-vector-v1 blobs
    // (the v3 on-disk form) alongside the v2 positional-delete
    // fallback written above — a v3 reader picks up the blobs, a v2
    // reader the parquet delete files.
    for (snap <- meta.currentSnapshot; s <- spark)
      PuffinStats.writeDeleteVectors(ops, s, tableDir, snap,
        new Path(metaDir, s"dvs-${snap.snapshotId}.puffin"))

    val json = metadataJson(meta, exportDir, schemaJsons, manifestLists, puffin, realSpec)
    val metaFile = new Path(metaDir, s"v$version.metadata.json")
    store.writeString(metaFile, json)
    store.writeString(new Path(metaDir, "version-hint.text"), version.toString)
    metaFile
  }

  /** Spark-side materialization of one graft delete file as spec v2
    * delete file(s) with the spec's reserved field ids (positional) or
    * the table schema's ids (equality), renamed to stable names
    * derived from the source file. Positional/DV state splits into ONE
    * file per referenced data file, each carrying lower==upper
    * `file_path` bounds in its manifest entry, because Java readers
    * match unpartitioned position deletes by path bounds, never
    * globally. Runs once per distinct delete file per export —
    * O(dead rows) work on the cluster, only renames on the driver. */
  private def materializeDelete(
      ops: TableOps,
      spark: org.apache.spark.sql.SparkSession,
      tableDir: Path,
      dataDir: Path,
      meta: TableMetadata,
      e: DataFileEntry): Seq[DeleteExport] = {
    import org.apache.spark.sql.functions.{col, concat, lit, regexp_replace, sha2, substring, when}
    import org.apache.spark.sql.types._
    val fieldMeta = (id: Int) =>
      new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()
    val (df, content, eqIds) =
      if (e.isEqDelete) {
        val schemaFields = meta.currentSchema.fields
        val ids = e.equalityColumns.map { c =>
          schemaFields.find(_.name == c).getOrElse(throw new IllegalStateException(
            s"equality-delete column $c not in current schema")).id
        }
        val keySchema = StructType(e.equalityColumns.map { c =>
          val f = schemaFields.find(_.name == c).get
          StructField(f.name, SchemaBridge.toSpark(
            TableSchema(0, Seq(f))).fields.head.dataType)
        })
        val keys = spark.read.schema(keySchema).parquet(e.path)
        val withIds = keys.select(e.equalityColumns.zip(ids).map { case (c, id) =>
          col(c).as(c, fieldMeta(id))
        }: _*)
        (withIds.orderBy(e.equalityColumns.map(col): _*), 2, ids)
      } else {
        val posSchema = StructType(Seq(
          StructField("_file", StringType, nullable = false),
          StructField("_pos", LongType, nullable = false)))
        val raw =
          if (e.isDvDelete) DeletionVectors.toPairs(spark,
            spark.read.schema(DeletionVectors.schema).parquet(e.path))
          else spark.read.schema(posSchema).parquet(e.path)
        // stored coordinates may be table-relative (rename-safe form);
        // the spec requires the data file's full path
        val abs = raw.withColumn("_file",
            when(col("_file").startsWith("/") || col("_file").contains(":/"),
              regexp_replace(col("_file"), "^file:/+", "/"))
            .otherwise(concat(lit(tableDir.toUri.getPath + "/"), col("_file"))))
          .select(
            col("_file").as("file_path", fieldMeta(2147483546)),
            col("_pos").as("pos", fieldMeta(2147483545)))
          .orderBy("file_path", "pos")
        (abs, 1, Seq.empty[Int])
      }
    val stem = {
      val base = new Path(e.path).getName.stripSuffix(".parquet")
      s"del-${math.abs(e.path.hashCode).toHexString}-$base"
    }
    val fs = ops.store.fs(dataDir)
    def place(part: Path, name: String): Path = {
      val target = new Path(dataDir, name)
      if (fs.exists(target)) fs.delete(target, false)
      fs.rename(part, target)
      target
    }
    def writeSingle(d: org.apache.spark.sql.DataFrame, name: String,
        rows: Long, bound: Option[String]): DeleteExport = {
      val tmp = new Path(dataDir, s"tmp-${java.util.UUID.randomUUID()}")
      d.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = ops.store.listFilesRec(tmp)
        .filter(_.getName.endsWith(".parquet")).head
      val target = place(part, name)
      fs.delete(tmp, true)
      DeleteExport(target.toString, rows,
        fs.getFileStatus(target).getLen, content, eqIds, bound)
    }
    if (content == 2)
      // equality deletes stay whole: iceberg-java DOES apply
      // unpartitioned equality deletes globally
      Seq(writeSingle(df, s"$stem.parquet", df.count(), None))
    else {
      // positional: one spec delete file PER referenced data file so
      // every entry can carry exact lower==upper file_path bounds
      val perFile = df.groupBy("file_path").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
      if (perFile.length <= 1)
        perFile.toSeq.map { case (p, n) =>
          writeSingle(df, s"$stem.parquet", n, Some(p)) }
      else {
        // one distributed job, not a per-path driver loop: hash-key
        // each referenced data file into its own output directory
        // (repartition by key ⇒ exactly one part per key)
        val tmp = new Path(dataDir, s"tmp-${java.util.UUID.randomUUID()}")
        df.withColumn("fp_dir", substring(sha2(col("file_path"), 256), 1, 16))
          .repartition(col("fp_dir"))
          .sortWithinPartitions("file_path", "pos")
          .write.partitionBy("fp_dir").mode("overwrite").parquet(tmp.toString)
        val out = perFile.zipWithIndex.map { case ((p, n), i) =>
          val key = java.security.MessageDigest.getInstance("SHA-256")
            .digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
          val part = ops.store.listFilesRec(new Path(tmp, s"fp_dir=$key"))
            .filter(_.getName.endsWith(".parquet")).head
          val target = place(part, s"$stem-$i.parquet")
          DeleteExport(target.toString, n,
            fs.getFileStatus(target).getLen, content, eqIds, Some(p))
        }.toSeq
        fs.delete(tmp, true)
        out
      }
    }
  }

  // ---------- type mapping (Spark DDL -> Iceberg) ----------

  /** Spark DDL type string → Iceberg type JSON value (string for
    * primitives, object for lists). */
  private[catalog] def icebergType(ddl: String, allocId: () => Int): Object = {
    val t = ddl.trim.toLowerCase
    t match {
      case "boolean" => "boolean"
      case "tinyint" | "smallint" | "int" | "integer" => "int"
      case "bigint" | "long" => "long"
      case "float" | "real" => "float"
      case "double" => "double"
      case "string" | "varchar" => "string"
      case "binary" => "binary"
      case "date" => "date"
      case "timestamp" => "timestamptz" // Spark session-tz timestamp
      case "timestamp_ntz" => "timestamp"
      case d if d.startsWith("decimal") =>
        val body = d.stripPrefix("decimal").stripPrefix("(").stripSuffix(")")
        val Array(p, s) = body.split(",").map(_.trim)
        s"decimal($p, $s)"
      case a if a.startsWith("array<") && a.endsWith(">") =>
        val o = mapper.createObjectNode()
        o.put("type", "list")
        o.put("element-id", allocId())
        o.put("element-required", false)
        icebergType(a.stripPrefix("array<").stripSuffix(">"), allocId) match {
          case s: String => o.put("element", s)
          case n: ObjectNode => o.set[ObjectNode]("element", n)
        }
        o
      case other => throw new UnsupportedOperationException(
        s"no Iceberg export mapping for Spark type `$other`")
    }
  }

  private def icebergSchema(s: TableSchema, allocId: () => Int): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("type", "struct")
    o.put("schema-id", s.schemaId)
    val fields = o.putArray("fields")
    s.fields.foreach { f =>
      val fo = fields.addObject()
      fo.put("id", f.id); fo.put("name", f.name); fo.put("required", f.required)
      icebergType(f.dataType, allocId) match {
        case str: String => fo.put("type", str)
        case n: ObjectNode => fo.set[ObjectNode]("type", n)
      }
      // C75 → Iceberg v3 defaults: the spec stores JSON literals, our
      // metadata stores SQL literal text — convert; a non-literal
      // default (no v3 representation) is omitted rather than mangled
      f.initialDefault.flatMap(defaultJson).foreach(fo.set[ObjectNode]("initial-default", _))
      f.writeDefault.flatMap(defaultJson).foreach(fo.set[ObjectNode]("write-default", _))
    }
    o
  }

  /** SQL literal text → Iceberg JSON literal (v3 default-value form). */
  private def defaultJson(sql: String): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val nf = mapper.getNodeFactory
    val t = sql.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      Some(nf.textNode(t.substring(1, t.length - 1).replace("''", "'")))
    else if (t.equalsIgnoreCase("true") || t.equalsIgnoreCase("false"))
      Some(nf.booleanNode(t.toBoolean))
    else scala.util.Try(BigDecimal(t)).toOption.map { n =>
      if (n.isWhole && n.isValidLong) nf.numberNode(n.longValue)
      else nf.numberNode(n.bigDecimal)
    }
  }

  // ---------- partition-spec export ----------

  /** One exportable spec dimension: the graft partition field, its
    * parsed transform, and the manifest-stat column its per-file value
    * reconstructs from (`__pt_<name>` for bucket — the materialized
    * Iceberg-spec hash — the source column otherwise). */
  private[catalog] final case class SpecCol(
      field: PartitionField, kind: String, arg: Int, sourceDdl: String) {
    def statCol: String =
      if (kind == "bucket") Transforms.ptColName(field) else field.name
  }

  private[catalog] final case class SpecExport(cols: Seq[SpecCol])

  /** One manifest referenced from a snapshot's manifest list. */
  private final case class ManifestRef(
      path: String, length: Long, specId: Int, content: Int,
      files: Int, rows: Long, minSeq: Long)

  /** The default spec as an exportable view — None (export everything
    * unpartitioned, as before) when the spec is empty, a source field
    * is gone, a transform/source-type combination is not
    * reconstructible from stats, or a field name is not a plain
    * identifier (Avro record field names). */
  private[catalog] def exportableSpec(meta: TableMetadata): Option[SpecExport] = {
    val fields = meta.specs.find(_.specId == meta.defaultSpecId)
      .map(_.fields).getOrElse(Seq.empty)
    if (fields.isEmpty) return None
    val byId = meta.currentSchema.fields.map(f => f.id -> f).toMap
    val intLike = Set("tinyint", "smallint", "int", "integer", "bigint", "long")
    val cols = fields.map { f =>
      val src = byId.getOrElse(f.sourceId, return None)
      val p = scala.util.Try(Transforms.parse(f.transform)).getOrElse(return None)
      if (!f.name.matches("[A-Za-z_][A-Za-z0-9_]*")) return None
      val ddl = src.dataType.toLowerCase
      val ok = p.kind match {
        case "identity" => (intLike ++ Set(
          "string", "varchar", "date", "timestamp", "timestamp_ntz")).contains(ddl)
        // __pt_ stats are only the spec hash when the table carries the
        // current-hash marker (Transforms.BucketHashProp) — old-hash
        // tuples would mislead external engines' pruning
        case "bucket" => Transforms.hashCurrent(meta)
        case "truncate" => (intLike ++ Set("string", "varchar")).contains(ddl)
        // Iceberg defines hour only on timestamps — hour(date) is not
        // a spec transform, so such a spec never exports
        case "hour" => Set("timestamp", "timestamp_ntz").contains(ddl)
        case _ => Set("date", "timestamp", "timestamp_ntz").contains(ddl) // temporal
      }
      if (!ok) return None
      SpecCol(f, p.kind, p.arg, ddl)
    }
    Some(SpecExport(cols))
  }

  /** Iceberg result type of one spec dimension (spec: "Partition
    * Transforms" result types). */
  private def resultIcebergType(c: SpecCol): String = c.kind match {
    case "identity" | "truncate" => c.sourceDdl match {
      case "tinyint" | "smallint" | "int" | "integer" => "int"
      case "bigint" | "long" => "long"
      case "string" | "varchar" => "string"
      case "date" => "date"
      case "timestamp" => "timestamptz"
      case "timestamp_ntz" => "timestamp"
      case other => throw new IllegalStateException(other)
    }
    case "bucket" => "int"
    case "day" => "date"
    case _ => "int" // year / month / hour ordinals from 1970
  }

  private def partitionAvroType(iceT: String): String = iceT match {
    case "int" => "\"int\""
    case "long" => "\"long\""
    case "string" => "\"string\""
    case "date" => """{"type": "int", "logicalType": "date"}"""
    case "timestamptz" =>
      """{"type": "long", "logicalType": "timestamp-micros", "adjust-to-utc": true}"""
    case "timestamp" =>
      """{"type": "long", "logicalType": "timestamp-micros", "adjust-to-utc": false}"""
    case other => throw new IllegalStateException(other)
  }

  /** The spec's `fields` JSON (metadata.json partition-specs entry and
    * the manifest `partition-spec` file-meta both use this form). */
  private[catalog] def specFieldsJson(se: SpecExport): String = {
    val arr = mapper.createArrayNode()
    se.cols.foreach { c =>
      val fo = arr.addObject()
      fo.put("name", c.field.name)
      fo.put("transform", c.field.transform)
      fo.put("source-id", c.field.sourceId)
      fo.put("field-id", c.field.fieldId)
    }
    arr.toString
  }

  /** Partition tuple for a data file, PROVABLE from its manifest
    * stats: Some(values) when the file is single-valued under every
    * spec dimension (an all-null source column gives a null value —
    * bucket(null)/identity(null) are null partitions); None when any
    * dimension is multi-valued or indeterminate — the file then
    * exports under the unpartitioned spec rather than risk a wrong
    * tuple misleading external pruning. Order-preserving transforms
    * prove single-valuedness from transform(min) == transform(max);
    * bucket proves it from the materialized `__pt_` column's stats. */
  private[catalog] def partitionTuple(se: SpecExport, e: DataFileEntry): Option[Seq[Any]] = {
    val rows = e.rows.getOrElse(return None)
    val vals = se.cols.map { c =>
      val cs = e.stats.getOrElse(c.statCol, return None)
      val nulls = cs.nulls.getOrElse(return None)
      if (rows > 0 && nulls == rows) null // single-valued: all null
      else if (nulls != 0L) return None // mixed null/non-null: not single-valued
      else {
        val mn = cs.min.getOrElse(return None)
        val mx = cs.max.getOrElse(return None)
        transformValue(c, mn, mx).getOrElse(return None)
      }
    }
    Some(vals)
  }

  /** Apply `c`'s transform to a file's (min, max) stat strings; Some
    * (Avro-ready value) iff both map to the same transform cell. */
  private def transformValue(c: SpecCol, mnS: String, mxS: String): Option[Any] = {
    def long(s: String): Option[Long] = s.toLongOption
    val longResult = Set("bigint", "long", "timestamp", "timestamp_ntz")
    c.kind match {
      case "bucket" =>
        for (a <- long(mnS); b <- long(mxS) if a == b) yield Int.box(a.toInt)
      case "identity" => c.sourceDdl match {
        case "string" | "varchar" => if (mnS == mxS) Some(mnS) else None
        case t if longResult.contains(t) =>
          for (a <- long(mnS); b <- long(mxS) if a == b) yield Long.box(a)
        case _ => // int family, date
          for (a <- long(mnS); b <- long(mxS) if a == b) yield Int.box(a.toInt)
      }
      case "truncate" => c.sourceDdl match {
        case "string" | "varchar" =>
          // Iceberg truncates strings by CODE POINTS; a UTF-16 take
          // could split a surrogate pair (wrong cell + invalid UTF-8
          // in Avro). Stat strings holding a lone surrogate are not
          // trustworthy cells — export those files under spec-0.
          def cp(s: String): Option[String] = {
            if (s.codePointCount(0, s.length) <= c.arg) Some(s)
            else Some(s.substring(0, s.offsetByCodePoints(0, c.arg)))
          }.filterNot(t => t.nonEmpty && Character.isHighSurrogate(t.last))
          for (a <- cp(mnS); b <- cp(mxS) if a == b) yield a
        case t =>
          def trunc(v: Long): Long = v - java.lang.Math.floorMod(v, c.arg.toLong)
          for (a <- long(mnS); b <- long(mxS) if trunc(a) == trunc(b)) yield {
            if (longResult.contains(t)) Long.box(trunc(a)) else Int.box(trunc(a).toInt)
          }
      }
      case temporal =>
        // stat value space: day ordinals for a date source, micros for
        // timestamps (TableOps.write forces INT64 micros)
        def days(v: Long): Long =
          if (c.sourceDdl == "date") v else Math.floorDiv(v, 86400000000L)
        def cell(v: Long): Long = temporal match {
          case "day" => days(v)
          // exportableSpec restricts hour to timestamp sources (Iceberg
          // defines no hour(date)), so the stat space here is micros
          case "hour" => Math.floorDiv(v, 3600000000L)
          case "month" =>
            val d = java.time.LocalDate.ofEpochDay(days(v))
            (d.getYear - 1970).toLong * 12L + (d.getMonthValue - 1)
          case "year" =>
            (java.time.LocalDate.ofEpochDay(days(v)).getYear - 1970).toLong
          case other => throw new IllegalStateException(other)
        }
        for (a <- long(mnS); b <- long(mxS) if cell(a) == cell(b)) yield
          Int.box(cell(a).toInt)
    }
  }

  // ---------- Avro manifests ----------

  /** manifest_entry schema JSON with the spec's field ids (data_file
    * is the 100-series; entry fields 0-4); `partitionFields` fills the
    * r102 partition struct (empty ⇒ unpartitioned). */
  private def entrySchemaJson(partitionFields: String): String =
    s"""{"type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": null, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "default": null, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "default": null, "field-id": 4},
        {"name": "data_file", "field-id": 2, "type": {
          "type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "field-id": 102,
             "type": {"type": "record", "name": "r102", "fields": [$partitionFields]}},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "equality_ids", "field-id": 135, "default": null,
             "type": ["null", {"type": "array", "items": "int", "element-id": 136}]},
            {"name": "lower_bounds", "field-id": 125, "default": null,
             "type": ["null", {"type": "array", "logicalType": "map",
               "items": {"type": "record", "name": "k126_v127", "fields": [
                 {"name": "key", "type": "int", "field-id": 126},
                 {"name": "value", "type": "bytes", "field-id": 127}]}}]},
            {"name": "upper_bounds", "field-id": 128, "default": null,
             "type": ["null", {"type": "array", "logicalType": "map",
               "items": {"type": "record", "name": "k129_v130", "fields": [
                 {"name": "key", "type": "int", "field-id": 129},
                 {"name": "value", "type": "bytes", "field-id": 130}]}}]}
        ]}}
    ]}"""

  private val manifestEntrySchema: Schema =
    new Schema.Parser().parse(entrySchemaJson(""))

  /** Entry schema with a typed partition struct for `spec` (all fields
    * optional — null partition values are legal). */
  private def entrySchemaFor(spec: Option[SpecExport]): Schema = spec match {
    case None => manifestEntrySchema
    case Some(se) =>
      val fields = se.cols.map(c =>
        s"""{"name": "${c.field.name}", "type": ["null", ${partitionAvroType(resultIcebergType(c))}], "default": null, "field-id": ${c.field.fieldId}}""")
        .mkString(",")
      new Schema.Parser().parse(entrySchemaJson(fields))
  }

  /** manifest_file (manifest-list entry) schema, 500-series ids. */
  private val manifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514}
    ]}""")

  /** Rows in a data file: manifest value, else the parquet footer
    * (exact, no data read). */
  private def recordCount(ops: TableOps, e: DataFileEntry): Long =
    e.rows.getOrElse {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new Path(e.path), ops.store.fs(new Path(e.path)).getConf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }

  private def writeAvro(
      ops: TableOps,
      target: Path,
      schema: Schema,
      fileMeta: Map[String, String],
      records: Seq[GenericRecord]): Long = {
    val bos = new ByteArrayOutputStream()
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    fileMeta.foreach { case (k, v) => writer.setMeta(k, v) }
    writer.create(schema, bos)
    records.foreach(writer.append)
    writer.close()
    val bytes = bos.toByteArray
    val out = ops.store.fs(target).create(target, true)
    try out.write(bytes) finally out.close()
    bytes.length.toLong
  }

  /** One manifest for (a subset of) a snapshot's live data files;
    * returns (fileLength, totalRows). With `spec`, every entry carries
    * its real partition tuple (caller guarantees [[partitionTuple]] is
    * defined for each entry) under spec-id 1; without, the entries
    * declare the unpartitioned spec 0. */
  private def writeManifest(
      ops: TableOps,
      target: Path,
      snap: Snapshot,
      entries: Seq[DataFileEntry],
      schemaJson: ObjectNode,
      spec: Option[SpecExport]): (Long, Long) = {
    val entrySchema = entrySchemaFor(spec)
    val dfSchema = entrySchema.getField("data_file").schema()
    val pSchema = dfSchema.getField("partition").schema()
    var totalRows = 0L
    val records = entries.map { e =>
      val rec = new GenericData.Record(entrySchema)
      rec.put("status", 1) // ADDED (explicit sequence numbers follow)
      rec.put("snapshot_id", snap.snapshotId)
      rec.put("sequence_number", e.dataSeq)
      rec.put("file_sequence_number", e.dataSeq)
      val df = new GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", e.path)
      df.put("file_format", "PARQUET")
      val part = new GenericData.Record(pSchema)
      spec.foreach { se =>
        se.cols.zip(partitionTuple(se, e).get).foreach { case (c, v) =>
          part.put(c.field.name, v)
        }
      }
      df.put("partition", part)
      val rows = recordCount(ops, e)
      totalRows += rows
      df.put("record_count", rows)
      df.put("file_size_in_bytes", e.bytes.getOrElse(
        ops.store.fs(new Path(e.path)).getFileStatus(new Path(e.path)).getLen))
      rec.put("data_file", df)
      rec
    }
    val len = writeAvro(ops, target, entrySchema, Map(
      "schema" -> schemaJson.toString,
      "schema-id" -> snap.schemaId.toString,
      "partition-spec" -> spec.map(specFieldsJson).getOrElse("[]"),
      "partition-spec-id" -> spec.map(_ => "1").getOrElse("0"),
      "format-version" -> "2",
      "content" -> "data"), records)
    (len, totalRows)
  }

  /** One content=deletes manifest for a snapshot's pending delete
    * files (each already materialized in spec form); returns
    * (fileLength, totalDeleteRows). Entry sequence numbers are the
    * graft delete files' own commit sequences, so the spec's masking
    * rules (positional ≤, equality <) match graft's semantics. */
  private def writeDeleteManifest(
      ops: TableOps,
      target: Path,
      snap: Snapshot,
      dels: Seq[(DataFileEntry, DeleteExport)],
      schemaJson: ObjectNode): (Long, Long) = {
    var totalRows = 0L
    val records = dels.map { case (e, exp) =>
      val rec = new GenericData.Record(manifestEntrySchema)
      rec.put("status", 1) // ADDED (explicit sequence numbers follow)
      rec.put("snapshot_id", snap.snapshotId)
      val seq = e.seq.getOrElse(snap.sequenceNumber)
      rec.put("sequence_number", seq)
      rec.put("file_sequence_number", seq)
      val dfSchema = manifestEntrySchema.getField("data_file").schema()
      val df = new GenericData.Record(dfSchema)
      df.put("content", exp.content) // 1 = position deletes, 2 = equality
      df.put("file_path", exp.path)
      df.put("file_format", "PARQUET")
      df.put("partition", new GenericData.Record(
        dfSchema.getField("partition").schema()))
      df.put("record_count", exp.rows)
      df.put("file_size_in_bytes", exp.bytes)
      if (exp.equalityIds.nonEmpty) {
        val ids = new java.util.ArrayList[Integer]()
        exp.equalityIds.foreach(i => ids.add(Integer.valueOf(i)))
        df.put("equality_ids", ids)
      }
      // position deletes: lower==upper file_path bounds (reserved
      // field 2147483546) — how Java DeleteFileIndex path-indexes an
      // unpartitioned position delete onto its single data file
      exp.pathBound.foreach { p =>
        val kvSchema = (name: String) => dfSchema.getField(name).schema()
          .getTypes.get(1).getElementType
        def boundMap(name: String): java.util.List[GenericRecord] = {
          val rec = new GenericData.Record(kvSchema(name))
          rec.put("key", 2147483546)
          rec.put("value", java.nio.ByteBuffer.wrap(p.getBytes("UTF-8")))
          java.util.Collections.singletonList(rec)
        }
        df.put("lower_bounds", boundMap("lower_bounds"))
        df.put("upper_bounds", boundMap("upper_bounds"))
      }
      totalRows += exp.rows
      rec.put("data_file", df)
      rec
    }
    val len = writeAvro(ops, target, manifestEntrySchema, Map(
      "schema" -> schemaJson.toString,
      "schema-id" -> snap.schemaId.toString,
      "partition-spec" -> "[]",
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> "deletes"), records)
    (len, totalRows)
  }

  private def writeManifestList(
      ops: TableOps,
      target: Path,
      snap: Snapshot,
      refs: Seq[ManifestRef]): Unit = {
    val records = refs.map { m =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", m.path)
      r.put("manifest_length", m.length)
      r.put("partition_spec_id", m.specId)
      r.put("content", m.content)
      r.put("sequence_number", snap.sequenceNumber)
      // pruning floor: 0 for data manifests, the oldest delete-file
      // sequence for delete manifests
      r.put("min_sequence_number", m.minSeq)
      r.put("added_snapshot_id", snap.snapshotId)
      r.put("added_files_count", m.files)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", m.rows)
      r.put("existing_rows_count", 0L)
      r.put("deleted_rows_count", 0L)
      r
    }
    writeAvro(ops, target, manifestFileSchema, Map(
      "snapshot-id" -> snap.snapshotId.toString,
      "parent-snapshot-id" -> snap.parentSnapshotId.map(_.toString).getOrElse("null"),
      "sequence-number" -> snap.sequenceNumber.toString,
      "format-version" -> "2"), records)
    ()
  }

  // ---------- Iceberg metadata.json ----------

  private def metadataJson(
      m: TableMetadata,
      exportDir: Path,
      schemaJsons: Seq[(Int, ObjectNode)],
      manifestLists: Map[Long, String],
      puffin: Option[(Snapshot, PuffinStats.Written)] = None,
      realSpec: Option[SpecExport] = None): String = {
    val o = mapper.createObjectNode()
    o.put("format-version", 2)
    o.put("table-uuid", m.tableUuid)
    o.put("location", exportDir.toString)
    o.put("last-sequence-number", m.lastSequenceNumber)
    o.put("last-updated-ms", m.lastUpdatedMs)
    o.put("last-column-id", m.lastColumnId)
    o.put("current-schema-id", m.currentSchemaId)
    val schemas = o.putArray("schemas")
    schemaJsons.foreach { case (_, s) => schemas.add(s) }
    // spec 0 stays the unpartitioned spec (straddler files and delete
    // manifests declare it); the real default spec, when exportable,
    // is spec 1
    val specs = o.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0); spec0.putArray("fields")
    realSpec match {
      case Some(se) =>
        val s1 = specs.addObject()
        s1.put("spec-id", 1)
        s1.set[ObjectNode]("fields", mapper.readTree(specFieldsJson(se)))
        o.put("default-spec-id", 1)
        o.put("last-partition-id",
          math.max(999, se.cols.map(_.field.fieldId).max))
      case None =>
        o.put("default-spec-id", 0)
        o.put("last-partition-id", 999)
    }
    val orders = o.putArray("sort-orders")
    val order0 = orders.addObject()
    order0.put("order-id", 0); order0.putArray("fields")
    o.put("default-sort-order-id", 0)
    val props = o.putObject("properties")
    m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId.foreach(o.put("current-snapshot-id", _))
    // only exported snapshots appear; parent pointers and refs to
    // omitted (delete-bearing) snapshots are dropped with them
    val exported = manifestLists.keySet
    val snaps = o.putArray("snapshots")
    m.snapshots.filter(s => exported.contains(s.snapshotId)).foreach { s =>
      val so = snaps.addObject()
      so.put("snapshot-id", s.snapshotId)
      s.parentSnapshotId.filter(exported.contains)
        .foreach(so.put("parent-snapshot-id", _))
      so.put("sequence-number", s.sequenceNumber)
      so.put("timestamp-ms", s.timestampMs)
      so.put("manifest-list", manifestLists(s.snapshotId))
      so.put("schema-id", s.schemaId)
      val sum = so.putObject("summary")
      sum.put("operation", s.operation)
      s.summary.toSeq.sortBy(_._1).foreach { case (k, v) => sum.put(k, v) }
    }
    val slog = o.putArray("snapshot-log")
    m.snapshotLog.filter(e => exported.contains(e.snapshotId)).foreach { e =>
      val eo = slog.addObject()
      eo.put("snapshot-id", e.snapshotId); eo.put("timestamp-ms", e.timestampMs)
    }
    o.putArray("metadata-log")
    puffin.foreach { case (snap, w) =>
      val sa = o.putArray("statistics")
      val so = sa.addObject()
      so.put("snapshot-id", snap.snapshotId)
      so.put("statistics-path", w.path)
      so.put("file-size-in-bytes", w.fileSize)
      so.put("file-footer-size-in-bytes", w.footerSize)
      so.putArray("blob-metadata").add(mapper.readTree(w.blobMetadataJson))
    }
    val refs = o.putObject("refs")
    m.refs.toSeq.filter(r => exported.contains(r._2.snapshotId)).sortBy(_._1)
      .foreach { case (name, r) =>
        val ro = refs.putObject(name)
        ro.put("snapshot-id", r.snapshotId); ro.put("type", r.refType)
      }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  // ---------- read-back (validation / self-interop) ----------

  /** Read an Avro file's records + file metadata (used by the spec to
    * validate the export with the avro library, independent of the
    * writer's in-memory state). */
  def readAvro(ops: TableOps, p: Path): (Seq[GenericRecord], Map[String, String], Schema) = {
    val in = ops.store.fs(p).open(p)
    try {
      val reader = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      val buf = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) buf += reader.next()
      val metaKeys = reader.getMetaKeys
      val metaMap = new scala.collection.mutable.HashMap[String, String]()
      metaKeys.forEach { k =>
        if (!k.startsWith("avro.")) // codec/schema internals
          metaMap.put(k, new String(reader.getMeta(k), StandardCharsets.UTF_8))
      }
      val schema = reader.getSchema
      reader.close()
      (buf.result(), metaMap.toMap, schema)
    } finally in.close()
  }
}
