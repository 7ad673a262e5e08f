package graft.catalog

import java.util.UUID

/** Iceberg-style table metadata model, re-expressed for a Spark-native
  * catalog (reference: Bodo-inc/denali logic/table.go:59-112, which
  * builds format-v2 metadata with schema list / partition specs / sort
  * orders / snapshot refs).
  *
  * Divergences from the reference (documented, deliberate):
  *   - Column types are Spark DDL strings (`bigint`, `array<float>`),
  *     not Iceberg type names — the consumer is Spark, not a foreign
  *     engine, and the mapping is bijective for every type we emit.
  *   - Snapshots point at a single manifest JSON (a data-file list)
  *     rather than an Avro manifest-list tree; same role, Spark reads
  *     the listed parquet files directly.
  */
/** C75: `initialDefault`/`writeDefault` are SQL literal texts (Iceberg
  * v3 `initial-default` / `write-default`): initial is FROZEN at the
  * ALTER that added the column and fills rows written before it
  * existed; write is the current DEFAULT applied to new INSERTs that
  * omit the column (may be changed later without touching initial). */
final case class NestedField(id: Int, name: String, dataType: String, required: Boolean,
    initialDefault: Option[String] = None, writeDefault: Option[String] = None)

final case class TableSchema(schemaId: Int, fields: Seq[NestedField]) {
  def highestFieldId: Int = if (fields.isEmpty) 0 else fields.map(_.id).max
}

final case class PartitionField(sourceId: Int, fieldId: Int, name: String, transform: String)
final case class PartitionSpec(specId: Int, fields: Seq[PartitionField])

final case class SortField(sourceId: Int, transform: String, direction: String, nullOrder: String)
final case class SortOrder(orderId: Int, fields: Seq[SortField])

/** One committed table state. `manifest` is the metadata-relative path
  * of the JSON data-file list for this snapshot. */
final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    operation: String, // append | overwrite
    manifest: String,
    summary: Map[String, String],
    schemaId: Int)

final case class SnapshotRef(snapshotId: Long, refType: String) // branch | tag

/** Per-column min/max/null-count carried in the manifest; values are
  * strings, interpreted by the table schema at scan-planning time. */
final case class ColumnStats(min: Option[String], max: Option[String], nulls: Option[Long])

/** One file in a snapshot manifest, with optional footer stats used
  * for file skipping. Path is table-dir-relative once stored.
  * `content` distinguishes data files from delete files
  * (merge-on-read): an equality-delete file holds key tuples over
  * `equalityColumns`; a positional-delete file holds (`_file`,
  * `_pos`) row coordinates. Affected data rows are dead until a
  * rewrite purges them. Absent fields deserialize to data-file
  * defaults, so pre-MOR manifests stay readable.
  *
  * `seq` is the sequence number of the snapshot that ADDED the file
  * (Iceberg's data sequence number): an equality delete masks only
  * data files with a strictly LOWER sequence, so rows appended after
  * the delete are never masked by it. Legacy manifests (no seq)
  * deserialize to None = "oldest possible" for data files and
  * "newest possible" for delete files — exactly the pre-seq masking
  * behavior. */
final case class DataFileEntry(
    path: String,
    rows: Option[Long] = None,
    stats: Map[String, ColumnStats] = Map.empty,
    content: String = "data",
    equalityColumns: Seq[String] = Seq.empty,
    seq: Option[Long] = None,
    bytes: Option[Long] = None,
    /** C70 row lineage (Iceberg v3 `first-row-id` direction): the
      * table-unique id of this file's row 0; row N's `_row_id` is
      * `firstRowId + N` until a rewrite materializes ids physically.
      * None on non-lineage tables and delete files. */
    firstRowId: Option[Long] = None) {
  def isData: Boolean = content == "data"
  def isEqDelete: Boolean = content == "eq-deletes"
  def isPosDelete: Boolean = content == "pos-deletes" || isSpecPosDelete
  /** A spec-Iceberg v2 positional-delete parquet file referenced by an
    * externally-committed snapshot: same (path, ordinal) semantics as
    * graft's `pos-deletes`, but the parquet columns are the spec's
    * `file_path`/`pos` (reserved ids 2147483546/2147483545) instead of
    * `_file`/`_pos`, so readers must request the spec schema. */
  def isSpecPosDelete: Boolean = content == "pos-deletes-spec"
  /** Deletion vector: positional deletes as one Roaring bitmap per
    * data file ([[DeletionVectors]]) — same coordinate semantics as
    * `pos-deletes`, different (far denser) physical encoding. */
  def isDvDelete: Boolean = content == "dv-deletes"
  def isDelete: Boolean = isEqDelete || isPosDelete || isDvDelete
  /** Sequence for masking decisions, with legacy-manifest defaults. */
  def dataSeq: Long = seq.getOrElse(0L)
  def deleteSeq: Long = seq.getOrElse(Long.MaxValue)
}
/** One partition's rollup inside a partition statistics file
  * (None partition = the unpartitioned / straddling-file bucket). */
final case class PartitionStat(
    partition: Option[String], files: Long, rows: Long, bytes: Long)

final case class SnapshotLogEntry(snapshotId: Long, timestampMs: Long)
final case class MetadataLogEntry(metadataFile: String, timestampMs: Long)
final case class StatisticsFile(snapshotId: Long, statistics: String)

final case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    schemas: Seq[TableSchema],
    currentSchemaId: Int,
    specs: Seq[PartitionSpec],
    defaultSpecId: Int,
    lastPartitionId: Int,
    sortOrders: Seq[SortOrder],
    defaultSortOrderId: Int,
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Seq[Snapshot],
    snapshotLog: Seq[SnapshotLogEntry],
    metadataLog: Seq[MetadataLogEntry],
    refs: Map[String, SnapshotRef],
    statistics: Seq[StatisticsFile]) {

  def currentSchema: TableSchema = schemas.find(_.schemaId == currentSchemaId).get
  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))
  def snapshotById(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)
  def snapshotByRef(ref: String): Option[Snapshot] =
    refs.get(ref).flatMap(r => snapshotById(r.snapshotId))
}

object TableMetadata {
  /** Fresh format-v2 metadata for a new table; mirrors the reference's
    * CreateTableMetadata (logic/table.go:65-112): schema id 0, spec id
    * 0 (last partition id floored at 999), unsorted order 0, empty
    * snapshot/ref/log collections. */
  def create(
      location: String,
      schema: TableSchema,
      spec: PartitionSpec,
      sortOrder: SortOrder,
      properties: Map[String, String],
      nowMs: Long = System.currentTimeMillis()): TableMetadata = {
    val s = schema.copy(schemaId = 0)
    TableMetadata(
      formatVersion = 2,
      tableUuid = UUID.randomUUID().toString,
      location = location,
      lastSequenceNumber = 0L,
      lastUpdatedMs = nowMs,
      lastColumnId = s.highestFieldId,
      schemas = Seq(s),
      currentSchemaId = 0,
      specs = Seq(spec.copy(specId = 0)),
      defaultSpecId = 0,
      lastPartitionId = (999 +: spec.fields.map(_.fieldId)).max,
      sortOrders = Seq(sortOrder.copy(orderId = 0)),
      defaultSortOrderId = 0,
      properties = properties,
      currentSnapshotId = None,
      snapshots = Seq.empty,
      snapshotLog = Seq.empty,
      metadataLog = Seq.empty,
      refs = Map.empty,
      statistics = Seq.empty)
  }
}

final class CommitFailedException(msg: String) extends RuntimeException(msg)

/** Commit requirements — the optimistic-concurrency asserts a client
  * sends with a commit; all 8 from the reference's logic/reqs.go.
  * `check` returns an error message when the assert fails. */
sealed trait Requirement {
  def name: String
  def check(m: Option[TableMetadata]): Option[String]
}

object Requirement {
  /** assert-create: the table must not yet exist. */
  case object AssertCreate extends Requirement {
    val name = "assert-create"
    def check(m: Option[TableMetadata]): Option[String] =
      m.map(_ => "assert-create failed: table already exists")
  }

  private def existing(m: Option[TableMetadata])(f: TableMetadata => Option[String]): Option[String] =
    m.fold(Option("table does not exist"))(f)

  final case class AssertTableUuid(uuid: String) extends Requirement {
    val name = "assert-table-uuid"
    def check(m: Option[TableMetadata]): Option[String] = existing(m) { t =>
      if (t.tableUuid == uuid) None
      else Some(s"assert-table-uuid failed: expected $uuid, found ${t.tableUuid}")
    }
  }

  /** snapshotId None ⇒ the ref must not exist yet. */
  final case class AssertRefSnapshotId(ref: String, snapshotId: Option[Long]) extends Requirement {
    val name = "assert-ref-snapshot-id"
    def check(m: Option[TableMetadata]): Option[String] = existing(m) { t =>
      (t.refs.get(ref), snapshotId) match {
        case (None, None) => None
        case (Some(r), Some(id)) if r.snapshotId == id => None
        case (got, want) =>
          Some(s"assert-ref-snapshot-id failed for ref '$ref': expected $want, found ${got.map(_.snapshotId)}")
      }
    }
  }

  final case class AssertLastAssignedFieldId(id: Int) extends Requirement {
    val name = "assert-last-assigned-field-id"
    def check(m: Option[TableMetadata]): Option[String] = existing(m) { t =>
      if (t.lastColumnId == id) None
      else Some(s"assert-last-assigned-field-id failed: expected $id, found ${t.lastColumnId}")
    }
  }

  final case class AssertCurrentSchemaId(id: Int) extends Requirement {
    val name = "assert-current-schema-id"
    def check(m: Option[TableMetadata]): Option[String] = existing(m) { t =>
      if (t.currentSchemaId == id) None
      else Some(s"assert-current-schema-id failed: expected $id, found ${t.currentSchemaId}")
    }
  }

  final case class AssertLastAssignedPartitionId(id: Int) extends Requirement {
    val name = "assert-last-assigned-partition-id"
    def check(m: Option[TableMetadata]): Option[String] = existing(m) { t =>
      if (t.lastPartitionId == id) None
      else Some(s"assert-last-assigned-partition-id failed: expected $id, found ${t.lastPartitionId}")
    }
  }

  final case class AssertDefaultSpecId(id: Int) extends Requirement {
    val name = "assert-default-spec-id"
    def check(m: Option[TableMetadata]): Option[String] = existing(m) { t =>
      if (t.defaultSpecId == id) None
      else Some(s"assert-default-spec-id failed: expected $id, found ${t.defaultSpecId}")
    }
  }

  final case class AssertDefaultSortOrderId(id: Int) extends Requirement {
    val name = "assert-default-sort-order-id"
    def check(m: Option[TableMetadata]): Option[String] = existing(m) { t =>
      if (t.defaultSortOrderId == id) None
      else Some(s"assert-default-sort-order-id failed: expected $id, found ${t.defaultSortOrderId}")
    }
  }

  /** Graft extension (not one of the reference's 8): pin a table
    * PROPERTY to the value a read-modify-write cycle observed
    * (None ⇒ must still be unset). Property-only commits never move a
    * ref, so [[AssertRefSnapshotId]] cannot serialize them — two
    * racers both pass the ref check and the second silently overwrites
    * the first's property edit. This closes that window. */
  final case class AssertProperty(key: String, expected: Option[String]) extends Requirement {
    val name = "assert-property"
    def check(m: Option[TableMetadata]): Option[String] = existing(m) { t =>
      val got = t.properties.get(key)
      if (got == expected) None
      else Some(s"assert-property failed for '$key': expected $expected, found $got")
    }
  }
}

/** Commit updates — the metadata mutations a commit applies, covering
  * every table action in the reference's logic/updates.go
  * tableUpdateMap (plus the two view actions, handled in
  * [[ViewMetadata]]). Each is a pure TableMetadata => TableMetadata. */
sealed trait MetadataUpdate {
  def name: String
  def apply(m: TableMetadata): TableMetadata
}

object MetadataUpdate {
  private def fail(msg: String) = throw new CommitFailedException(msg)

  final case class AssignUuid(uuid: String) extends MetadataUpdate {
    val name = "assign-uuid"
    def apply(m: TableMetadata): TableMetadata = m.copy(tableUuid = uuid)
  }

  final case class UpgradeFormatVersion(formatVersion: Int) extends MetadataUpdate {
    val name = "upgrade-format-version"
    def apply(m: TableMetadata): TableMetadata = {
      if (formatVersion != 1 && formatVersion != 2)
        fail(s"format version $formatVersion is invalid; allowed: 1, 2")
      if (formatVersion < m.formatVersion)
        fail(s"cannot downgrade format version from ${m.formatVersion} to $formatVersion")
      m.copy(formatVersion = formatVersion)
    }
  }

  final case class AddSchema(schema: TableSchema) extends MetadataUpdate {
    val name = "add-schema"
    def apply(m: TableMetadata): TableMetadata = {
      if (m.schemas.exists(_.schemaId == schema.schemaId))
        fail(s"schema id ${schema.schemaId} already exists")
      m.copy(
        schemas = m.schemas :+ schema,
        lastColumnId = math.max(m.lastColumnId, schema.highestFieldId))
    }
  }

  /** schemaId -1 ⇒ the most recently added schema. */
  final case class SetCurrentSchema(schemaId: Int) extends MetadataUpdate {
    val name = "set-current-schema"
    def apply(m: TableMetadata): TableMetadata = {
      val id = if (schemaId == -1) m.schemas.last.schemaId else schemaId
      if (!m.schemas.exists(_.schemaId == id)) fail(s"schema id $id does not exist")
      m.copy(currentSchemaId = id)
    }
  }

  final case class AddSpec(spec: PartitionSpec) extends MetadataUpdate {
    val name = "add-spec"
    def apply(m: TableMetadata): TableMetadata = {
      if (m.specs.exists(_.specId == spec.specId)) fail(s"spec id ${spec.specId} already exists")
      // first bucket field on a table with NO prior bucket spec: no
      // old-hash __pt_ data can exist, so stamp the current hash
      // marker (tables with prior bucket specs keep their state —
      // they may hold old-hash values)
      val props =
        if (Transforms.anyBucket(Seq(spec)) && !Transforms.anyBucket(m.specs) &&
            !m.properties.contains(Transforms.BucketHashProp))
          m.properties + (Transforms.BucketHashProp -> Transforms.BucketHashCurrent)
        else m.properties
      m.copy(
        specs = m.specs :+ spec,
        lastPartitionId = (m.lastPartitionId +: spec.fields.map(_.fieldId)).max,
        properties = props)
    }
  }

  final case class SetDefaultSpec(specId: Int) extends MetadataUpdate {
    val name = "set-default-spec"
    def apply(m: TableMetadata): TableMetadata = {
      val id = if (specId == -1) m.specs.last.specId else specId
      if (!m.specs.exists(_.specId == id)) fail(s"spec id $id does not exist")
      m.copy(defaultSpecId = id)
    }
  }

  final case class AddSortOrder(order: SortOrder) extends MetadataUpdate {
    val name = "add-sort-order"
    def apply(m: TableMetadata): TableMetadata = {
      if (m.sortOrders.exists(_.orderId == order.orderId))
        fail(s"sort order id ${order.orderId} already exists")
      m.copy(sortOrders = m.sortOrders :+ order)
    }
  }

  final case class SetDefaultSortOrder(orderId: Int) extends MetadataUpdate {
    val name = "set-default-sort-order"
    def apply(m: TableMetadata): TableMetadata = {
      val id = if (orderId == -1) m.sortOrders.last.orderId else orderId
      if (!m.sortOrders.exists(_.orderId == id)) fail(s"sort order id $id does not exist")
      m.copy(defaultSortOrderId = id)
    }
  }

  final case class AddSnapshot(snapshot: Snapshot) extends MetadataUpdate {
    val name = "add-snapshot"
    def apply(m: TableMetadata): TableMetadata = {
      if (m.snapshots.exists(_.snapshotId == snapshot.snapshotId))
        fail(s"snapshot id ${snapshot.snapshotId} already exists")
      m.copy(
        snapshots = m.snapshots :+ snapshot,
        lastSequenceNumber = math.max(m.lastSequenceNumber, snapshot.sequenceNumber))
    }
  }

  /** Pointing ref 'main' also moves the current snapshot and appends to
    * the snapshot log (reference: updates.go SetSnapshotRefUpdate). */
  final case class SetSnapshotRef(refName: String, snapshotId: Long, refType: String)
      extends MetadataUpdate {
    val name = "set-snapshot-ref"
    def apply(m: TableMetadata): TableMetadata = {
      val snap = m.snapshotById(snapshotId)
        .getOrElse(fail(s"snapshot $snapshotId does not exist"))
      val base = m.copy(refs = m.refs + (refName -> SnapshotRef(snapshotId, refType)))
      if (refName == "main")
        base.copy(
          currentSnapshotId = Some(snapshotId),
          snapshotLog = m.snapshotLog :+ SnapshotLogEntry(snapshotId, snap.timestampMs))
      else base
    }
  }

  final case class RemoveSnapshots(snapshotIds: Seq[Long]) extends MetadataUpdate {
    val name = "remove-snapshots"
    def apply(m: TableMetadata): TableMetadata =
      m.copy(
        snapshots = m.snapshots.filterNot(s => snapshotIds.contains(s.snapshotId)),
        snapshotLog = m.snapshotLog.filterNot(e => snapshotIds.contains(e.snapshotId)))
  }

  final case class RemoveSnapshotRef(refName: String) extends MetadataUpdate {
    val name = "remove-snapshot-ref"
    def apply(m: TableMetadata): TableMetadata = m.copy(refs = m.refs - refName)
  }

  final case class SetLocation(location: String) extends MetadataUpdate {
    val name = "set-location"
    def apply(m: TableMetadata): TableMetadata = m.copy(location = location)
  }

  final case class SetProperties(updates: Map[String, String]) extends MetadataUpdate {
    val name = "set-properties"
    def apply(m: TableMetadata): TableMetadata = m.copy(properties = m.properties ++ updates)
  }

  final case class RemoveProperties(removals: Seq[String]) extends MetadataUpdate {
    val name = "remove-properties"
    def apply(m: TableMetadata): TableMetadata = {
      removals.foreach { k =>
        if (!m.properties.contains(k)) fail(s"property $k does not exist in table")
      }
      m.copy(properties = m.properties -- removals)
    }
  }

  final case class SetStatistics(snapshotId: Long, statistics: String) extends MetadataUpdate {
    val name = "set-statistics"
    def apply(m: TableMetadata): TableMetadata =
      m.copy(statistics =
        m.statistics.filterNot(_.snapshotId == snapshotId) :+ StatisticsFile(snapshotId, statistics))
  }

  final case class RemoveStatistics(snapshotId: Long) extends MetadataUpdate {
    val name = "remove-statistics"
    def apply(m: TableMetadata): TableMetadata =
      m.copy(statistics = m.statistics.filterNot(_.snapshotId == snapshotId))
  }
}

/** View metadata (reference: logic/view.go + iceberg-overload/view):
  * versioned SQL text, each version recording its schema and default
  * namespace; supports add-view-version / set-current-view-version. */
final case class ViewVersion(
    versionId: Int,
    timestampMs: Long,
    sql: String,
    defaultCatalog: String,
    defaultNamespace: Seq[String],
    schemaId: Int)

final case class ViewMetadata(
    viewUuid: String,
    formatVersion: Int,
    location: String,
    currentVersionId: Int,
    versions: Seq[ViewVersion],
    schemas: Seq[TableSchema],
    properties: Map[String, String]) {

  def currentVersion: ViewVersion = versions.find(_.versionId == currentVersionId).get

  /** add-view-version (reference: updates.go AddViewVersionUpdate). */
  def addVersion(v: ViewVersion): ViewMetadata = {
    if (versions.exists(_.versionId == v.versionId))
      throw new CommitFailedException(s"version ID ${v.versionId} in view already exists")
    copy(versions = versions :+ v)
  }

  /** set-current-view-version; -1 ⇒ latest (reference semantics). */
  def setCurrentVersion(id: Int): ViewMetadata = {
    val resolved =
      if (id == -1) versions.last.versionId
      else if (id < 0) throw new CommitFailedException(s"version ID $id is negative")
      else if (!versions.exists(_.versionId == id))
        throw new CommitFailedException(s"version ID $id is out of bounds")
      else id
    copy(currentVersionId = resolved)
  }
}
