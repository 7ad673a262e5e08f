package graft.catalog

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, DeltaWriter, DeltaWriterFactory, WriterCommitMessage}
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Executor-side pieces of the SQL merge-on-read write path (the
  * `SupportsDelta` row-level operation in [[GraftTable]]): Spark's
  * delta rewrite plans feed each task a stream of DELETE row-ids and
  * INSERT row images; the task turns deletes into per-file Roaring
  * bitmaps (the C61 deletion-vector form) and forwards inserts to the
  * table's stock file writer.
  *
  * Scale shape: per-task state is one compressed bitmap per data file
  * the task deletes from — the commit messages carry exactly the bytes
  * of the final on-disk DV artifact, nothing proportional to row
  * count — and row images stream straight through the format's
  * columnar writer, so a 0.1%-selectivity UPDATE on a 100-TB table
  * moves O(changed rows), not O(affected files).
  *
  * Top-level (not nested in [[GraftTable]]) because the factory is
  * serialized to executors and must not capture the driver-side table.
  */
object MorDelta {

  /** Per-task result: the delegate data writer's commit message (null
    * when the task wrote no row images) plus this task's deletion
    * vectors, keyed by TABLE-RELATIVE data-file path, in portable
    * Roaring serialization. */
  final case class TaskCommit(inner: WriterCommitMessage, dvs: Map[String, Array[Byte]])
      extends WriterCommitMessage

  /** Wraps the table's stock file-writer factory: INSERT rows go to
    * the inner writer (created lazily — delete-only tasks write no
    * file), DELETE row-ids accumulate bitmaps. `basePath` is the
    * table-dir path prefix (with trailing slash) stripped from scan
    * `_file` values so stored coordinates are rename-safe, the same
    * policy as [[TableOps.positionalDelete]]. */
  final case class Factory(inner: DataWriterFactory, basePath: String)
      extends DeltaWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
      new Writer(() => inner.createWriter(partitionId, taskId), basePath)
  }

  final class Writer(mkInner: () => DataWriter[InternalRow], basePath: String)
      extends DeltaWriter[InternalRow] {
    private var inner: DataWriter[InternalRow] = _
    private val dvs = mutable.HashMap.empty[String, Roaring64NavigableMap]

    /** Table-relative form of a scan-produced `_file` value (which may
      * carry a URI scheme); paths outside the table dir (registered
      * externals) stay as-is. */
    private def rel(p: String): String = {
      val i = p.indexOf(basePath)
      if (i >= 0) p.substring(i + basePath.length) else p
    }

    override def delete(metadata: InternalRow, id: InternalRow): Unit = {
      // id is a reused projection row (_file STRING, _pos BIGINT) —
      // copy the values out before the iterator moves on
      val file = rel(id.getUTF8String(0).toString)
      dvs.getOrElseUpdate(file, new Roaring64NavigableMap()).addLong(id.getLong(1))
    }

    override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
      throw new IllegalStateException(
        "graft represents updates as delete+insert (representUpdateAsDeleteAndInsert)")

    // REINSERT is the image half of a split matched-UPDATE in MERGE
    // plans: Spark emits it PAIRED with a DELETE of the same row id,
    // so writing it as a plain append is exactly right — the DV masks
    // the old copy, this lands the new one
    override def reinsert(metadata: InternalRow, row: InternalRow): Unit = insert(row)

    override def insert(row: InternalRow): Unit = {
      if (inner == null) inner = mkInner()
      inner.write(row)
    }

    override def commit(): WriterCommitMessage =
      TaskCommit(
        if (inner != null) inner.commit() else null,
        dvs.iterator.map { case (f, bm) => f -> DeletionVectors.serialize(bm) }.toMap)

    override def abort(): Unit = if (inner != null) inner.abort()
    override def close(): Unit = if (inner != null) inner.close()
  }
}
