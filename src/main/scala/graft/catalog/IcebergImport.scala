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
  * Scope: format-version 2, parquet data files, no pending delete
  * manifests (content != data throws — import after the source engine
  * compacts), primitive + list column types. */
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

  private def readSchema(n: JsonNode): TableSchema =
    TableSchema(
      Option(n.get("schema-id")).map(_.asInt()).getOrElse(0),
      Option(n.get("fields")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { f =>
        NestedField(f.get("id").asInt(), f.get("name").asText(),
          sparkType(f.get("type")),
          Option(f.get("required")).exists(_.asBoolean()))
      })

  /** The live data files of one snapshot: manifest list → manifests →
    * non-deleted entries. Paths as recorded (absolute). */
  private def snapshotFiles(ops: TableOps, manifestList: Path): Seq[(String, Long, Long)] = {
    val (manifests, _, _) = IcebergExport.readAvro(ops, manifestList)
    manifests.flatMap { mf =>
      if (mf.get("content") != null &&
          mf.get("content").asInstanceOf[Number].intValue() != 0)
        throw new UnsupportedOperationException(
          "Iceberg delete manifests are not importable — compact the source " +
          "table (rewrite data files) first")
      val (entries, _, _) =
        IcebergExport.readAvro(ops, new Path(mf.get("manifest_path").toString))
      entries.flatMap { e =>
        val status = e.get("status").asInstanceOf[Number].intValue()
        if (status == 2) None // DELETED entry
        else {
          val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          if (df.get("content") != null &&
              df.get("content").asInstanceOf[Number].intValue() != 0)
            throw new UnsupportedOperationException(
              "Iceberg delete files are not importable — compact the source first")
          val fmt = df.get("file_format").toString
          if (!fmt.equalsIgnoreCase("parquet"))
            throw new UnsupportedOperationException(s"unsupported data-file format $fmt")
          Some((df.get("file_path").toString,
            df.get("record_count").asInstanceOf[Number].longValue(),
            df.get("file_size_in_bytes").asInstanceOf[Number].longValue()))
        }
      }
    }
  }

  /** Import the table at `metadataJson` (an Iceberg vN.metadata.json
    * path) as a graft table at `targetDir`, replaying its snapshot
    * lineage: pure-append steps commit only the added files as
    * `append`, everything else as `overwrite`. Returns the resulting
    * graft metadata. */
  def importTable(ops: TableOps, metadataJson: Path, targetDir: Path): TableMetadata = {
    if (ops.exists(targetDir))
      throw new IllegalArgumentException(s"target table already exists at $targetDir")
    val n = mapper.readTree(ops.store.readString(metadataJson))
    require(n.get("format-version").asInt() == 2,
      s"only format-version 2 is importable, got ${n.get("format-version")}")

    val currentSchemaId = n.get("current-schema-id").asInt()
    val schemas = n.get("schemas").elements().asScala.toSeq.map(readSchema)
    val schema = schemas.find(_.schemaId == currentSchemaId).getOrElse(schemas.head)
    val props = Option(n.get("properties"))
      .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty[String, String]) +
      ("graft.imported-from" -> metadataJson.toString)

    ops.create(targetDir, TableMetadata.create(
      targetDir.toString, schema.copy(schemaId = 0),
      PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), props))

    // replay lineage in sequence order
    val snaps = Option(n.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
      .sortBy(_.get("sequence-number").asLong())
    var prevFiles = Set.empty[String]
    snaps.foreach { s =>
      val files = snapshotFiles(ops, new Path(s.get("manifest-list").asText()))
      val paths = files.map(_._1)
      if (prevFiles.subsetOf(paths.toSet) && prevFiles.size < paths.size) {
        // pure append: commit only the delta
        ops.commitFiles(targetDir, paths.filterNot(prevFiles.contains), "append")
      } else if (paths.toSet != prevFiles) {
        ops.commitFiles(targetDir, paths, "overwrite")
      } // identical set (metadata-only source snapshot): no graft commit
      prevFiles = paths.toSet
    }
    ops.load(targetDir).get._2
  }
}
