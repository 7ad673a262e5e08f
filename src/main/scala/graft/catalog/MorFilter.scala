package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types._

/** Merge-on-read equality-delete application at the reader level: rows
  * whose key tuple appears in a committed delete set are dropped
  * before they leave the scan. The key sets are collected driver-side
  * at scan build (delete files are O(deleted keys), small by design)
  * and ship to executors inside the reader factory.
  *
  * Null semantics match the DataFrame anti-join applied by
  * [[TableOps.read]]: a null in a row's key tuple never matches, and
  * delete tuples containing nulls are dropped at set build. */
object MorFilter {

  /** One delete set: positions/types of its key columns within the
    * EXTENDED read schema, plus the normalized dead tuples. */
  final case class KeySet(idx: Array[Int], types: Array[DataType], dead: Set[Vector[Any]])
      extends Serializable

  /** External (driver) value → comparison-normal form. */
  def normalize(v: Any): Any = v match {
    case n: Number => n.longValue()
    case s: String => s
    case b: java.lang.Boolean => b.booleanValue()
    case other => other
  }

  private def rowKey(row: InternalRow, ks: KeySet): Vector[Any] = {
    val out = Vector.newBuilder[Any]
    var i = 0
    while (i < ks.idx.length) {
      val at = ks.idx(i)
      if (row.isNullAt(at)) return null // null never matches a delete tuple
      out += (ks.types(i) match {
        case ByteType => row.getByte(at).toLong
        case ShortType => row.getShort(at).toLong
        case IntegerType => row.getInt(at).toLong
        case LongType => row.getLong(at)
        case StringType => row.getUTF8String(at).toString
        case BooleanType => row.getBoolean(at)
        case other => throw new IllegalStateException(s"unsupported key type ${other.sql}")
      })
      i += 1
    }
    out.result()
  }

  /** Wraps the parquet factory: drop dead rows, then project off the
    * key columns that were only read for the filter (they sit at the
    * END of the extended schema; the first `outArity` fields are the
    * caller-requested output). */
  final case class Factory(
      inner: PartitionReaderFactory,
      keySets: Seq[KeySet],
      outArity: Int,
      extended: StructType) extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean = false
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val delegate = inner.createReader(p)
      new PartitionReader[InternalRow] {
        private val proj = UnsafeProjection.create(
          extended.fields.take(outArity).toIndexedSeq.zipWithIndex.map {
            case (f, i) => BoundReference(i, f.dataType, f.nullable)
          })
        private var current: InternalRow = _
        override def next(): Boolean = {
          while (delegate.next()) {
            val row = delegate.get()
            val dead = keySets.exists { ks =>
              val k = rowKey(row, ks)
              k != null && ks.dead.contains(k)
            }
            if (!dead) { current = row; return true }
          }
          false
        }
        override def get(): InternalRow = proj(current)
        override def close(): Unit = delegate.close()
      }
    }
  }
}
