package graft.catalog

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-parity metadata inspection tables, served straight from the
  * table's own metadata — no data files are opened:
  *
  *   - `t$snapshots`  — every snapshot with parent / sequence / op
  *   - `t$history`    — the snapshot log with main-ancestor flags
  *   - `t$refs`       — branches and tags
  *   - `t$files`      — current data+delete files with rows/bytes/seq
  *                      and per-column min/max from the manifest
  *   - `t$partitions` — per-partition-value file/row/byte rollup
  *                      (files single-valued on the identity spec;
  *                      straddling files roll up under NULL)
  *
  * All are tiny driver-materialized relations (metadata is O(files),
  * not O(rows)), so they plan as a LocalScan — the same way Iceberg's
  * metadata tables are backed by manifest reads, not table scans.
  * Reference surface: the catalog's table-metadata responses
  * (routes/tables.go) expose snapshots/refs/schemas to clients; these
  * views make the same inventory queryable in SQL.
  */
object MetaTables {

  val suffixes: Seq[String] =
    Seq("$snapshots", "$history", "$refs", "$files", "$partitions", "$manifests",
      "$properties", "$constraints")

  def forSuffix(
      suffix: String, name: String, dir: Path, meta: TableMetadata, ops: TableOps): Table =
    suffix match {
      case "$snapshots" => snapshots(name, meta)
      case "$history" => history(name, meta)
      case "$refs" => refs(name, meta)
      case "$files" => files(name, dir, meta, ops)
      case "$partitions" => partitions(name, dir, meta, ops)
      case "$manifests" => manifests(name, dir, meta, ops)
      case "$properties" => properties(name, meta)
      case "$constraints" => constraints(name, meta)
      case other => throw new IllegalArgumentException(s"unknown metadata table $other")
    }

  /** C84 — `t$properties`: the table's property map as rows (Iceberg's
    * properties metadata table). Engine-reserved keys (constraints,
    * stream watermarks, stats) surface too — they ARE properties. */
  private def properties(name: String, meta: TableMetadata): Table = {
    val schema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType, nullable = false)))
    val rows = meta.properties.toSeq.sortBy(_._1).map { case (k, v) =>
      new GenericInternalRow(Array[Any](utf(k), utf(v))): InternalRow
    }
    new StaticTable(name, schema, rows.toArray)
  }

  /** C84 — `t$constraints`: the C79 CHECK constraints with their
    * predicate SQL and enforcement status. */
  private def constraints(name: String, meta: TableMetadata): Table = {
    val prefix = "graft.constraint.check."
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("predicate", StringType, nullable = false),
      StructField("enforced", BooleanType, nullable = false),
      StructField("validation_status", StringType, nullable = false)))
    val rows = meta.properties.toSeq.filter(_._1.startsWith(prefix)).sortBy(_._1)
      .map { case (k, sql) =>
        new GenericInternalRow(Array[Any](
          utf(k.stripPrefix(prefix)), utf("CHECK"), utf(sql), true, utf("VALID"))): InternalRow
      }
    new StaticTable(name, schema, rows.toArray)
  }

  /** C68 — `t$manifests`: the current snapshot's manifest tree, one
    * row per SEGMENT (C66) with entry/content/sequence rollups — what
    * an operator checks before deciding a rewriteManifests pass is
    * due. Legacy single-manifest snapshots report themselves as one
    * segment. */
  private def manifests(
      name: String, dir: Path, meta: TableMetadata, ops: TableOps): Table = {
    val schema = StructType(Seq(
      StructField("segment", StringType, nullable = false),
      StructField("position", IntegerType, nullable = false),
      StructField("n_entries", LongType, nullable = false),
      StructField("n_data_files", LongType, nullable = false),
      StructField("n_delete_files", LongType, nullable = false),
      StructField("min_seq", LongType),
      StructField("max_seq", LongType)))
    val rows = meta.currentSnapshot.toSeq.flatMap { snap =>
      ops.segmentsOrSelf(dir, snap.manifest).zipWithIndex.map { case (seg, i) =>
        val es = ops.segmentEntries(dir, seg)
        val seqs = es.flatMap(_.seq)
        new GenericInternalRow(Array[Any](
          utf(seg), i, es.size.toLong,
          es.count(_.isData).toLong, es.count(_.isDelete).toLong,
          seqs.reduceOption(_ min _).map(Long.box).orNull,
          seqs.reduceOption(_ max _).map(Long.box).orNull)): InternalRow
      }
    }
    new StaticTable(name, schema, rows.toArray)
  }

  private def utf(s: String): UTF8String = UTF8String.fromString(s)

  private def snapshots(name: String, meta: TableMetadata): Table = {
    val schema = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("parent_id", LongType),
      StructField("sequence_number", LongType, nullable = false),
      StructField("committed_at_ms", LongType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("manifest", StringType, nullable = false),
      StructField("is_current", BooleanType, nullable = false)))
    val rows = meta.snapshots.sortBy(_.sequenceNumber).map { s =>
      new GenericInternalRow(Array[Any](
        s.snapshotId, s.parentSnapshotId.map(Long.box).orNull, s.sequenceNumber,
        s.timestampMs, utf(s.operation), utf(s.manifest),
        meta.currentSnapshotId.contains(s.snapshotId))): InternalRow
    }
    new StaticTable(name, schema, rows.toArray)
  }

  private def history(name: String, meta: TableMetadata): Table = {
    val schema = StructType(Seq(
      StructField("made_current_at_ms", LongType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("is_current_ancestor", BooleanType, nullable = false)))
    val ancestors = Iterator.iterate(meta.currentSnapshot)(
        _.flatMap(_.parentSnapshotId).flatMap(meta.snapshotById))
      .takeWhile(_.isDefined).flatten.map(_.snapshotId).toSet
    val rows = meta.snapshotLog.map { e =>
      new GenericInternalRow(Array[Any](
        e.timestampMs, e.snapshotId, ancestors.contains(e.snapshotId))): InternalRow
    }
    new StaticTable(name, schema, rows.toArray)
  }

  private def refs(name: String, meta: TableMetadata): Table = {
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false)))
    val rows = meta.refs.toSeq.sortBy(_._1).map { case (n, r) =>
      new GenericInternalRow(Array[Any](utf(n), utf(r.refType), r.snapshotId)): InternalRow
    }
    new StaticTable(name, schema, rows.toArray)
  }

  private def entryRows(dir: Path, meta: TableMetadata, ops: TableOps): Seq[DataFileEntry] =
    meta.currentSnapshot.map(_ => ops.resolveEntries(dir, meta)).getOrElse(Seq.empty)

  private def files(name: String, dir: Path, meta: TableMetadata, ops: TableOps): Table = {
    val schema = StructType(Seq(
      StructField("file_path", StringType, nullable = false),
      StructField("content", StringType, nullable = false),
      StructField("record_count", LongType),
      StructField("file_size_in_bytes", LongType),
      StructField("sequence_number", LongType),
      StructField("lower_bounds", MapType(StringType, StringType)),
      StructField("upper_bounds", MapType(StringType, StringType))))
    def bounds(e: DataFileEntry, f: ColumnStats => Option[String]) = {
      val kv = e.stats.toSeq.sortBy(_._1).flatMap { case (c, st) => f(st).map(c -> _) }
      ArrayBasedMapData(kv.map(p => utf(p._1)).toArray, kv.map(p => utf(p._2)).toArray)
    }
    val rows = entryRows(dir, meta, ops).sortBy(_.path).map { e =>
      new GenericInternalRow(Array[Any](
        utf(e.path), utf(e.content),
        e.rows.map(Long.box).orNull, e.bytes.map(Long.box).orNull,
        e.seq.map(Long.box).orNull,
        bounds(e, _.min), bounds(e, _.max))): InternalRow
    }
    new StaticTable(name, schema, rows.toArray)
  }

  private def partitions(name: String, dir: Path, meta: TableMetadata, ops: TableOps): Table = {
    val schema = StructType(Seq(
      StructField("partition", StringType),
      StructField("file_count", LongType, nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("total_bytes", LongType, nullable = false)))
    // persisted partition-stats file (C53) when fresh for the current
    // snapshot; manifest-derived rollup otherwise
    val stats = ops.readPartitionStats(dir, meta)
      .getOrElse(ops.partitionRollup(dir, meta))
    val rows = stats.map { p =>
      new GenericInternalRow(Array[Any](
        p.partition.map(utf).orNull, p.files, p.rows, p.bytes)): InternalRow
    }
    new StaticTable(name, schema, rows.toArray)
  }

  /** Read-only driver-materialized table planning as a LocalScan. */
  private final class StaticTable(
      tableName: String, tableSchema: StructType, tableRows: Array[InternalRow])
      extends Table with SupportsRead {
    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new LocalScan {
          override def rows(): Array[InternalRow] = tableRows
          override def readSchema(): StructType = tableSchema
          override def description(): String = s"$tableName metadata"
        }
      }
  }
}
