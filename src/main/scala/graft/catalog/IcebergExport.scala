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
  * monotone metadata versions). Pending merge-on-read deletes must be
  * applied first — their graft-JSON representation has no faithful
  * spec encoding without positional/equality Avro delete manifests,
  * and silently dropping them would export WRONG rows. */
object IcebergExport {

  private val mapper = new ObjectMapper()

  /** Export `tableDir`'s full snapshot lineage; returns the exported
    * metadata.json path. */
  def export(ops: TableOps, tableDir: Path): Path = {
    val (version, meta) = ops.load(tableDir).getOrElse(
      throw new IllegalArgumentException(s"table does not exist at $tableDir"))
    val store = ops.store
    val exportDir = new Path(tableDir, "iceberg")
    val metaDir = new Path(exportDir, "metadata")
    store.mkdirs(metaDir)

    // Snapshots whose live state carries MOR delete files cannot be
    // exported faithfully (a spec export without delete manifests
    // would resurrect deleted rows in external engines): the CURRENT
    // snapshot must be delete-free; delete-bearing HISTORY snapshots
    // are omitted from the export (graft-side time travel keeps them).
    val entriesBySnap = meta.snapshots.map(s => s -> ops.snapshotEntries(tableDir, s))
    if (meta.currentSnapshot.exists(s =>
        ops.snapshotEntries(tableDir, s).exists(_.isDelete)))
      throw new UnsupportedOperationException(
        "table has pending merge-on-read deletes — run TableOps.applyDeletes " +
        "before exporting (a spec export without delete manifests would " +
        "resurrect deleted rows in external engines)")
    val exportable = entriesBySnap.filter { case (_, es) => !es.exists(_.isDelete) }

    // fresh ids for nested (list element) types, above every field id
    var nextId = math.max(meta.lastColumnId, meta.schemas.map(_.highestFieldId).max)
    def allocId(): Int = { nextId += 1; nextId }
    val schemaJsons = meta.schemas.map(s => s.schemaId -> icebergSchema(s, () => allocId()))

    // one manifest + one manifest list per exportable snapshot
    val manifestLists = exportable.map { case (snap, entries) =>
      val schemaJson = schemaJsons.find(_._1 == snap.schemaId)
        .getOrElse(schemaJsons.head)._2
      val manifestPath = new Path(metaDir, s"m-${snap.snapshotId}.avro")
      val (length, rows) = writeManifest(ops, manifestPath, snap, entries, schemaJson)
      val listPath = new Path(metaDir, s"snap-${snap.snapshotId}.avro")
      writeManifestList(ops, listPath, snap, manifestPath, length, entries.size, rows)
      snap.snapshotId -> listPath.toString
    }.toMap

    val json = metadataJson(meta, exportDir, schemaJsons, manifestLists)
    val metaFile = new Path(metaDir, s"v$version.metadata.json")
    store.writeString(metaFile, json)
    store.writeString(new Path(metaDir, "version-hint.text"), version.toString)
    metaFile
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
    }
    o
  }

  // ---------- Avro manifests ----------

  /** manifest_entry schema with the spec's field ids (data_file is the
    * 100-series; entry fields 0-4). Unpartitioned spec ⇒ empty r102. */
  private val manifestEntrySchema: Schema = new Schema.Parser().parse(
    """{"type": "record", "name": "manifest_entry", "fields": [
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
             "type": {"type": "record", "name": "r102", "fields": []}},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104}
        ]}}
    ]}""")

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

  /** One manifest for a snapshot's live files; returns (fileLength,
    * totalRows). */
  private def writeManifest(
      ops: TableOps,
      target: Path,
      snap: Snapshot,
      entries: Seq[DataFileEntry],
      schemaJson: ObjectNode): (Long, Long) = {
    var totalRows = 0L
    val records = entries.filter(_.isData).map { e =>
      val rec = new GenericData.Record(manifestEntrySchema)
      rec.put("status", 1) // ADDED (explicit sequence numbers follow)
      rec.put("snapshot_id", snap.snapshotId)
      rec.put("sequence_number", e.dataSeq)
      rec.put("file_sequence_number", e.dataSeq)
      val df = new GenericData.Record(manifestEntrySchema.getField("data_file").schema())
      df.put("content", 0)
      df.put("file_path", e.path)
      df.put("file_format", "PARQUET")
      df.put("partition", new GenericData.Record(
        manifestEntrySchema.getField("data_file").schema()
          .getField("partition").schema()))
      val rows = recordCount(ops, e)
      totalRows += rows
      df.put("record_count", rows)
      df.put("file_size_in_bytes", e.bytes.getOrElse(
        ops.store.fs(new Path(e.path)).getFileStatus(new Path(e.path)).getLen))
      rec.put("data_file", df)
      rec
    }
    val len = writeAvro(ops, target, manifestEntrySchema, Map(
      "schema" -> schemaJson.toString,
      "schema-id" -> snap.schemaId.toString,
      "partition-spec" -> "[]", // export declares unpartitioned layout
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> "data"), records)
    (len, totalRows)
  }

  private def writeManifestList(
      ops: TableOps,
      target: Path,
      snap: Snapshot,
      manifestPath: Path,
      manifestLength: Long,
      fileCount: Int,
      rowCount: Long): Unit = {
    val rec = new GenericData.Record(manifestFileSchema)
    rec.put("manifest_path", manifestPath.toString)
    rec.put("manifest_length", manifestLength)
    rec.put("partition_spec_id", 0)
    rec.put("content", 0)
    rec.put("sequence_number", snap.sequenceNumber)
    rec.put("min_sequence_number", 0L)
    rec.put("added_snapshot_id", snap.snapshotId)
    rec.put("added_files_count", fileCount)
    rec.put("existing_files_count", 0)
    rec.put("deleted_files_count", 0)
    rec.put("added_rows_count", rowCount)
    rec.put("existing_rows_count", 0L)
    rec.put("deleted_rows_count", 0L)
    writeAvro(ops, target, manifestFileSchema, Map(
      "snapshot-id" -> snap.snapshotId.toString,
      "parent-snapshot-id" -> snap.parentSnapshotId.map(_.toString).getOrElse("null"),
      "sequence-number" -> snap.sequenceNumber.toString,
      "format-version" -> "2"), Seq(rec))
    ()
  }

  // ---------- Iceberg metadata.json ----------

  private def metadataJson(
      m: TableMetadata,
      exportDir: Path,
      schemaJsons: Seq[(Int, ObjectNode)],
      manifestLists: Map[Long, String]): String = {
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
    val specs = o.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0); spec0.putArray("fields")
    o.put("default-spec-id", 0)
    o.put("last-partition-id", 999)
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
