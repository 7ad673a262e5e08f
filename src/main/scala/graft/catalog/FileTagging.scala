package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.unsafe.types.UTF8String

/** `_file` metadata-column support: Spark's `_metadata` struct only
  * attaches to native file relations, so a DSv2 catalog table must
  * synthesize its own file-identity column. Partitions are re-planned
  * one-per-file (FilePartitions normally span files, so the file is
  * pinned at partition granularity) and a delegating reader appends
  * the constant path to every row. Row-based read path only — the
  * column is for auditing / maintenance queries, not the hot path. */
object FileTagging {

  /** One partition per data file (its split chunks stay together,
    * ordered by byte offset so concatenating them preserves the
    * file's row order — required for `_pos` ordinals), so the factory
    * can tag rows with a per-partition constant. */
  def perFilePartitions(inner: Array[InputPartition]): Array[InputPartition] = {
    val files = inner.flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(s"unexpected partition: $other")
    }
    files.groupBy(_.urlEncodedPath).toSeq.sortBy(_._1).zipWithIndex
      .map { case ((_, chunks), i) =>
        FilePartition(i, chunks.sortBy(_.start)): InputPartition }
      .toArray
  }

  final case class TaggingReaderFactory(inner: PartitionReaderFactory)
      extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean = false
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val path = p match {
        case fp: FilePartition =>
          java.net.URLDecoder.decode(fp.files.head.urlEncodedPath, "UTF-8")
        case other => throw new IllegalStateException(s"unexpected partition: $other")
      }
      val delegate = inner.createReader(p)
      new PartitionReader[InternalRow] {
        private val const = new GenericInternalRow(
          Array[Any](UTF8String.fromString(path)))
        private val joined = new JoinedRow
        override def next(): Boolean = delegate.next()
        override def get(): InternalRow = joined(delegate.get(), const)
        override def close(): Unit = delegate.close()
      }
    }
  }
}
