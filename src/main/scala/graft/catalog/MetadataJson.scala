package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** JSON ser/de for table/view metadata files. Field names follow the
  * Iceberg metadata vocabulary the reference emits ("format-version",
  * "table-uuid", "last-sequence-number", … — see denali
  * logic/table.go WriteTableMetadata), so the files are recognizable
  * to anyone who knows the format. Hand-built Jackson trees: exact
  * control over names and stable output, no reflection surprises. */
object MetadataJson {
  private val mapper = new ObjectMapper()

  // ---------- write ----------

  private def schemaNode(o: ObjectNode, s: TableSchema): Unit = {
    o.put("schema-id", s.schemaId)
    o.put("type", "struct")
    val fs = o.putArray("fields")
    s.fields.foreach { f =>
      val fo = fs.addObject()
      fo.put("id", f.id); fo.put("name", f.name)
      fo.put("required", f.required); fo.put("type", f.dataType)
      f.initialDefault.foreach(fo.put("initial-default", _))
      f.writeDefault.foreach(fo.put("write-default", _))
    }
  }

  def toJson(m: TableMetadata): String = {
    val o = mapper.createObjectNode()
    o.put("format-version", m.formatVersion)
    o.put("table-uuid", m.tableUuid)
    o.put("location", m.location)
    o.put("last-sequence-number", m.lastSequenceNumber)
    o.put("last-updated-ms", m.lastUpdatedMs)
    o.put("last-column-id", m.lastColumnId)
    val schemas = o.putArray("schemas")
    m.schemas.foreach(s => schemaNode(schemas.addObject(), s))
    o.put("current-schema-id", m.currentSchemaId)
    val specs = o.putArray("partition-specs")
    m.specs.foreach { sp =>
      val so = specs.addObject()
      so.put("spec-id", sp.specId)
      val fields = so.putArray("fields")
      sp.fields.foreach { f =>
        val fo = fields.addObject()
        fo.put("source-id", f.sourceId); fo.put("field-id", f.fieldId)
        fo.put("name", f.name); fo.put("transform", f.transform)
      }
    }
    o.put("default-spec-id", m.defaultSpecId)
    o.put("last-partition-id", m.lastPartitionId)
    val orders = o.putArray("sort-orders")
    m.sortOrders.foreach { so =>
      val oo = orders.addObject()
      oo.put("order-id", so.orderId)
      val fields = oo.putArray("fields")
      so.fields.foreach { f =>
        val fo = fields.addObject()
        fo.put("source-id", f.sourceId); fo.put("transform", f.transform)
        fo.put("direction", f.direction); fo.put("null-order", f.nullOrder)
      }
    }
    o.put("default-sort-order-id", m.defaultSortOrderId)
    val props = o.putObject("properties")
    m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId.foreach(o.put("current-snapshot-id", _))
    val snaps = o.putArray("snapshots")
    m.snapshots.foreach { s =>
      val so = snaps.addObject()
      so.put("snapshot-id", s.snapshotId)
      s.parentSnapshotId.foreach(so.put("parent-snapshot-id", _))
      so.put("sequence-number", s.sequenceNumber)
      so.put("timestamp-ms", s.timestampMs)
      so.put("manifest", s.manifest)
      so.put("schema-id", s.schemaId)
      val sum = so.putObject("summary")
      sum.put("operation", s.operation)
      s.summary.toSeq.sortBy(_._1).foreach { case (k, v) => sum.put(k, v) }
    }
    val slog = o.putArray("snapshot-log")
    m.snapshotLog.foreach { e =>
      val eo = slog.addObject()
      eo.put("snapshot-id", e.snapshotId); eo.put("timestamp-ms", e.timestampMs)
    }
    val mlog = o.putArray("metadata-log")
    m.metadataLog.foreach { e =>
      val eo = mlog.addObject()
      eo.put("metadata-file", e.metadataFile); eo.put("timestamp-ms", e.timestampMs)
    }
    val refs = o.putObject("refs")
    m.refs.toSeq.sortBy(_._1).foreach { case (name, r) =>
      val ro = refs.putObject(name)
      ro.put("snapshot-id", r.snapshotId); ro.put("type", r.refType)
    }
    val stats = o.putArray("statistics")
    m.statistics.foreach { s =>
      val so = stats.addObject()
      so.put("snapshot-id", s.snapshotId); so.put("statistics", s.statistics)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  // ---------- read ----------

  private def arr(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)

  private def readSchema(n: JsonNode): TableSchema =
    TableSchema(
      n.get("schema-id").asInt(),
      arr(n, "fields").map(f =>
        NestedField(f.get("id").asInt(), f.get("name").asText(),
          f.get("type").asText(), f.get("required").asBoolean(),
          Option(f.get("initial-default")).map(_.asText()),
          Option(f.get("write-default")).map(_.asText()))))

  def fromJson(json: String): TableMetadata = {
    val n = mapper.readTree(json)
    TableMetadata(
      formatVersion = n.get("format-version").asInt(),
      tableUuid = n.get("table-uuid").asText(),
      location = n.get("location").asText(),
      lastSequenceNumber = n.get("last-sequence-number").asLong(),
      lastUpdatedMs = n.get("last-updated-ms").asLong(),
      lastColumnId = n.get("last-column-id").asInt(),
      schemas = arr(n, "schemas").map(readSchema),
      currentSchemaId = n.get("current-schema-id").asInt(),
      specs = arr(n, "partition-specs").map(sp =>
        PartitionSpec(sp.get("spec-id").asInt(),
          arr(sp, "fields").map(f => PartitionField(
            f.get("source-id").asInt(), f.get("field-id").asInt(),
            f.get("name").asText(), f.get("transform").asText())))),
      defaultSpecId = n.get("default-spec-id").asInt(),
      lastPartitionId = n.get("last-partition-id").asInt(),
      sortOrders = arr(n, "sort-orders").map(so =>
        SortOrder(so.get("order-id").asInt(),
          arr(so, "fields").map(f => SortField(
            f.get("source-id").asInt(), f.get("transform").asText(),
            f.get("direction").asText(), f.get("null-order").asText())))),
      defaultSortOrderId = n.get("default-sort-order-id").asInt(),
      properties = readProps(n.get("properties")),
      currentSnapshotId = Option(n.get("current-snapshot-id")).map(_.asLong()),
      snapshots = arr(n, "snapshots").map { s =>
        val summary = readProps(s.get("summary"))
        Snapshot(
          s.get("snapshot-id").asLong(),
          Option(s.get("parent-snapshot-id")).map(_.asLong()),
          s.get("sequence-number").asLong(),
          s.get("timestamp-ms").asLong(),
          summary.getOrElse("operation", "append"),
          s.get("manifest").asText(),
          summary - "operation",
          s.get("schema-id").asInt())
      },
      snapshotLog = arr(n, "snapshot-log").map(e =>
        SnapshotLogEntry(e.get("snapshot-id").asLong(), e.get("timestamp-ms").asLong())),
      metadataLog = arr(n, "metadata-log").map(e =>
        MetadataLogEntry(e.get("metadata-file").asText(), e.get("timestamp-ms").asLong())),
      refs = Option(n.get("refs")).map(r =>
        r.properties().asScala.map(e =>
          e.getKey -> SnapshotRef(
            e.getValue.get("snapshot-id").asLong(),
            e.getValue.get("type").asText())).toMap).getOrElse(Map.empty),
      statistics = arr(n, "statistics").map(s =>
        StatisticsFile(s.get("snapshot-id").asLong(), s.get("statistics").asText())))
  }

  private def readProps(n: JsonNode): Map[String, String] =
    Option(n).map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty)

  // ---------- manifests (data-file lists + footer stats) ----------

  /** Segmented-manifest list (C66): a manifest that references
    * immutable entry-list SEGMENT files instead of inlining entries,
    * so an append commit writes O(added) metadata and sibling
    * snapshots share unchanged segments. A legacy manifest doubles as
    * a single segment (same leaf format). */
  def manifestListToJson(segments: Seq[String]): String = {
    val o = mapper.createObjectNode()
    val a = o.putArray("segments")
    segments.foreach(a.add)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  /** Some(segment names) if `json` is a segmented-manifest list,
    * None for a leaf entry-list manifest. */
  def manifestSegments(json: String): Option[Seq[String]] =
    Option(mapper.readTree(json).get("segments"))
      .map(_.elements().asScala.map(_.asText()).toSeq)

  def manifestToJson(files: Seq[DataFileEntry]): String = {
    val o = mapper.createObjectNode()
    val a = o.putArray("data-files")
    files.foreach { f =>
      val fo = a.addObject()
      fo.put("path", f.path)
      f.rows.foreach(fo.put("rows", _))
      f.seq.foreach(fo.put("seq", _))
      f.bytes.foreach(fo.put("bytes", _))
      f.firstRowId.foreach(fo.put("first-row-id", _))
      if (!f.isData) fo.put("content", f.content)
      if (f.equalityColumns.nonEmpty) {
        val ec = fo.putArray("equality-columns")
        f.equalityColumns.foreach(ec.add)
      }
      if (f.stats.nonEmpty) {
        val so = fo.putObject("stats")
        f.stats.toSeq.sortBy(_._1).foreach { case (col, cs) =>
          val co = so.putObject(col)
          cs.min.foreach(co.put("min", _))
          cs.max.foreach(co.put("max", _))
          cs.nulls.foreach(co.put("nulls", _))
        }
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  def manifestFromJson(json: String): Seq[DataFileEntry] =
    arr(mapper.readTree(json), "data-files").map {
      case s if s.isTextual => DataFileEntry(s.asText()) // legacy plain path
      case o =>
        DataFileEntry(
          o.get("path").asText(),
          Option(o.get("rows")).map(_.asLong()),
          Option(o.get("stats")).map(st =>
            st.properties().asScala.map { e =>
              e.getKey -> ColumnStats(
                Option(e.getValue.get("min")).map(_.asText()),
                Option(e.getValue.get("max")).map(_.asText()),
                Option(e.getValue.get("nulls")).map(_.asLong()))
            }.toMap).getOrElse(Map.empty),
          Option(o.get("content")).map(_.asText()).getOrElse("data"),
          Option(o.get("equality-columns")).map(ec =>
            ec.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty),
          Option(o.get("seq")).map(_.asLong()),
          Option(o.get("bytes")).map(_.asLong()),
          Option(o.get("first-row-id")).map(_.asLong()))
    }

  // ---------- views ----------

  def viewToJson(v: ViewMetadata): String = {
    val o = mapper.createObjectNode()
    o.put("view-uuid", v.viewUuid)
    o.put("format-version", v.formatVersion)
    o.put("location", v.location)
    o.put("current-version-id", v.currentVersionId)
    val versions = o.putArray("versions")
    v.versions.foreach { ver =>
      val vo = versions.addObject()
      vo.put("version-id", ver.versionId)
      vo.put("timestamp-ms", ver.timestampMs)
      vo.put("schema-id", ver.schemaId)
      vo.put("default-catalog", ver.defaultCatalog)
      val ns = vo.putArray("default-namespace")
      ver.defaultNamespace.foreach(ns.add)
      val reps = vo.putArray("representations")
      val rep = reps.addObject()
      rep.put("type", "sql"); rep.put("sql", ver.sql); rep.put("dialect", "spark")
    }
    val schemas = o.putArray("schemas")
    v.schemas.foreach(s => schemaNode(schemas.addObject(), s))
    val props = o.putObject("properties")
    v.properties.toSeq.sortBy(_._1).foreach { case (k, p) => props.put(k, p) }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  // ---------- partition statistics files ----------

  def partitionStatsToJson(stats: Seq[PartitionStat]): String = {
    val o = mapper.createObjectNode()
    val a = o.putArray("partitions")
    stats.foreach { p =>
      val po = a.addObject()
      p.partition.foreach(po.put("partition", _))
      po.put("file-count", p.files)
      po.put("record-count", p.rows)
      po.put("total-bytes", p.bytes)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  def partitionStatsFromJson(json: String): Seq[PartitionStat] = {
    val n = mapper.readTree(json)
    arr(n, "partitions").map { po =>
      PartitionStat(
        Option(po.get("partition")).map(_.asText()),
        po.get("file-count").asLong(),
        po.get("record-count").asLong(),
        po.get("total-bytes").asLong())
    }
  }

  def viewFromJson(json: String): ViewMetadata = {
    val n = mapper.readTree(json)
    ViewMetadata(
      viewUuid = n.get("view-uuid").asText(),
      formatVersion = n.get("format-version").asInt(),
      location = n.get("location").asText(),
      currentVersionId = n.get("current-version-id").asInt(),
      versions = arr(n, "versions").map { vo =>
        ViewVersion(
          vo.get("version-id").asInt(),
          vo.get("timestamp-ms").asLong(),
          arr(vo, "representations").headOption.map(_.get("sql").asText()).getOrElse(""),
          vo.get("default-catalog").asText(),
          arr(vo, "default-namespace").map(_.asText()),
          vo.get("schema-id").asInt())
      },
      schemas = arr(n, "schemas").map(readSchema),
      properties = readProps(n.get("properties")))
  }
}
