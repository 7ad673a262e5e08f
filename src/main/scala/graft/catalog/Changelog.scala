package graft.catalog

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** File-granular CDC view of a graft table, served by the catalog as
  * `<table>$changes` (same device as Iceberg's `.changes` metadata
  * table / Delta's `table_changes`): every row of every data file a
  * snapshot ADDED surfaces as an `insert`, every row of every data
  * file it REMOVED as a `delete`, tagged with the snapshot's sequence
  * number. Output schema = table schema + `_change_type` +
  * `_commit_seq`.
  *
  * Batch reads window via options `from-seq` (exclusive, default 0)
  * and `to-seq` (inclusive, default head). Streaming reads
  * (`readStream.table("…$changes")`) follow the main lineage with
  * sequence-number offsets, restart-safe under checkpointing.
  *
  * Contract vs [[TableOps.changes]]: this scan is a PURE FILE DIFF —
  * partitions are plain parquet reads, so it runs fully distributed
  * with no joins. It therefore does NOT net rewrites (a compaction
  * emits matched delete+insert pairs that cancel under aggregation)
  * and does NOT surface merge-on-read masks (an eq/pos-delete commit
  * changes no data file). `TableOps.changes` is the row-level,
  * netted, MOR-aware batch feed for consumers that need exact
  * deltas; this table is the cheap streaming transport. */
final class ChangelogTable(
    baseName: String,
    dir: Path,
    meta: TableMetadata,
    ops: TableOps)
    extends Table with SupportsRead {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = s"$baseName$$changes"

  private val baseSchema: StructType = SchemaBridge.toSpark(meta.currentSchema)

  override lazy val schema: StructType = StructType(baseSchema.fields ++ Seq(
    StructField("_change_type", StringType, nullable = false),
    StructField("_commit_seq", LongType, nullable = false)))

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def properties(): util.Map[String, String] =
    Map("format" -> "graft/changelog").asJava

  private def currentMeta: TableMetadata = ops.load(dir).map(_._2).getOrElse(meta)

  private def lineage(m: TableMetadata): Seq[Snapshot] = {
    val byId = m.snapshots.map(s => s.snapshotId -> s).toMap
    Iterator.iterate(m.currentSnapshot)(_.flatMap(_.parentSnapshotId).flatMap(byId.get))
      .takeWhile(_.isDefined).flatten.toSeq.reverse
  }

  /** One slice per (snapshot, side): the data files the snapshot added
    * or removed relative to its parent. MOR delete commits diff to
    * nothing here by construction. */
  private def slices(m: TableMetadata, fromSeq: Long, toSeq: Long)
      : Seq[(String, Long, Seq[String])] = {
    val byId = m.snapshots.map(s => s.snapshotId -> s).toMap
    lineage(m)
      .filter(s => s.sequenceNumber > fromSeq && s.sequenceNumber <= toSeq)
      .flatMap { snap =>
        val cur = scala.util.Try(ops.snapshotEntries(dir, snap)).getOrElse(Seq.empty)
          .filter(_.isData).map(_.path)
        val prev = snap.parentSnapshotId.flatMap(byId.get)
          .map(p => scala.util.Try(ops.snapshotEntries(dir, p)).getOrElse(Seq.empty)
            .filter(_.isData).map(_.path).toSet)
          .getOrElse(Set.empty[String])
        val added = cur.filterNot(prev.contains)
        val removed = (prev -- cur.toSet).toSeq.sorted
        Seq(("insert", snap.sequenceNumber, added),
            ("delete", snap.sequenceNumber, removed)).filter(_._3.nonEmpty)
      }
  }

  private def parquetBatch(paths: Seq[String]): Batch = {
    val t = new ParquetTable(
      name(), spark,
      new CaseInsensitiveStringMap(new util.HashMap[String, String]()),
      paths, Some(baseSchema), classOf[ParquetFileFormat])
    val b = t.newScanBuilder(new CaseInsensitiveStringMap(new util.HashMap[String, String]()))
    b.pruneColumns(baseSchema)
    b.build().toBatch
  }

  private def planSlices(m: TableMetadata, fromSeq: Long, toSeq: Long): Array[InputPartition] =
    slices(m, fromSeq, toSeq).flatMap { case (ct, seq, files) =>
      parquetBatch(files).planInputPartitions()
        .map(p => Changelog.TaggedPartition(ct, seq, p): InputPartition)
    }.toArray

  /** The parquet reader factory's config depends only on schemas (no
    * pushdown here), so one factory built over an empty file list
    * serves every slice's partitions. */
  private def sliceFactory(): PartitionReaderFactory =
    Changelog.TaggingFactory(parquetBatch(Seq.empty).createReaderFactory())

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema
      override def description(): String = s"graft changelog $baseName"

      override def toBatch: Batch = {
        val m = currentMeta
        val fromSeq = Option(options.get("from-seq")).map(_.toLong).getOrElse(0L)
        val toSeq = Option(options.get("to-seq")).map(_.toLong)
          .orElse(m.currentSnapshot.map(_.sequenceNumber)).getOrElse(0L)
        new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            planSlices(m, fromSeq, toSeq)
          override def createReaderFactory(): PartitionReaderFactory = sliceFactory()
        }
      }

      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MicroBatchStream {
          private case class SeqOffset(seq: Long) extends Offset {
            override def json(): String = seq.toString
          }
          override def initialOffset(): Offset =
            if (options.getOrDefault("stream-from", "earliest") == "latest")
              SeqOffset(currentMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L))
            else SeqOffset(0L)
          override def latestOffset(): Offset =
            SeqOffset(currentMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L))
          override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
          override def commit(end: Offset): Unit = ()
          override def stop(): Unit = ()
          override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
            planSlices(currentMeta,
              start.asInstanceOf[SeqOffset].seq, end.asInstanceOf[SeqOffset].seq)
          override def createReaderFactory(): PartitionReaderFactory = sliceFactory()
        }
    }
}

object Changelog {

  /** Partition wrapper carrying the slice's change tag. */
  final case class TaggedPartition(changeType: String, seq: Long, inner: InputPartition)
      extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  /** Appends the per-partition constant (_change_type, _commit_seq). */
  final case class TaggingFactory(inner: PartitionReaderFactory)
      extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean = false
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val tagged = p match {
        case t: TaggedPartition => t
        case other => throw new IllegalStateException(s"unexpected partition: $other")
      }
      val delegate = inner.createReader(tagged.inner)
      new PartitionReader[InternalRow] {
        private val const = new GenericInternalRow(
          Array[Any](UTF8String.fromString(tagged.changeType), tagged.seq))
        private val joined = new JoinedRow
        override def next(): Boolean = delegate.next()
        override def get(): InternalRow = joined(delegate.get(), const)
        override def close(): Unit = delegate.close()
      }
    }
  }
}
