package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Merge-on-read delete application at the reader level: rows whose
  * key tuple appears in an applicable equality-delete set, or whose
  * (file, ordinal) appears in a positional-delete set, are dropped
  * before they leave the scan. Delete sets are collected driver-side
  * at scan build (delete files are O(deleted keys/rows), small by
  * design) and ship to executors inside the reader factory.
  *
  * Sequence semantics: an equality delete applies to a data file iff
  * the file's data sequence number is strictly below the delete's
  * ([[DataFileEntry.dataSeq]]/[[DataFileEntry.deleteSeq]]), so rows
  * appended after a delete commit are never masked — the per-file
  * applicability is resolved at scan build and baked into each file's
  * [[FileConf]]. Positional deletes name (file, ordinal) directly.
  *
  * Null semantics match the DataFrame anti-join applied by
  * [[TableOps.read]]: a null in a row's key tuple never matches, and
  * delete tuples containing nulls are dropped at set build. */
object MorFilter {

  /** One equality-delete set: positions/types of its key columns
    * within the EXTENDED read schema, the normalized dead tuples, and
    * the delete's sequence number (for per-file applicability). */
  final case class KeySet(
      idx: Array[Int], types: Array[DataType], dead: Set[Vector[Any]], deleteSeq: Long)
      extends Serializable

  /** Per-data-file delete state: the equality keysets that apply to
    * this file (seq-filtered) plus its dead row ordinals. */
  final case class FileConf(keySets: Seq[KeySet], deadPos: Set[Long]) extends Serializable {
    def isEmpty: Boolean = keySets.isEmpty && deadPos.isEmpty
  }

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

  /** Key-grouped MOR reading: a storage-partitioned-join partition
    * merges EVERY file of one partition key, but MOR state (equality
    * keyset applicability by sequence, positional dead ordinals) is
    * per-file. This factory re-splits the merged partition by file and
    * chains one [[PerFileFactory]] reader per file (chunks re-ordered
    * by byte offset), so each file gets its own delete conf and its
    * own ordinal counter — which is what lets BOTH delete flavors ride
    * under a shuffle-free join. */
  final case class ChainedPerFileFactory(perFile: PerFileFactory)
      extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean = false
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val fp = p match {
        case f: FilePartition => f
        case other => throw new IllegalStateException(s"unexpected partition: $other")
      }
      val perFileParts = fp.files.groupBy(_.urlEncodedPath).toSeq.sortBy(_._1)
        .map { case (_, chunks) => FilePartition(fp.index, chunks.sortBy(_.start)) }
      new PartitionReader[InternalRow] {
        private var i = 0
        private var cur: PartitionReader[InternalRow] = _
        @annotation.tailrec
        override def next(): Boolean = {
          if (cur == null) {
            if (i >= perFileParts.length) return false
            cur = perFile.createReader(perFileParts(i))
            i += 1
          }
          if (cur.next()) true
          else { cur.close(); cur = null; next() }
        }
        override def get(): InternalRow = cur.get()
        override def close(): Unit = if (cur != null) cur.close()
      }
    }
  }

  /** Per-file MOR reader factory. Partitions must be one-per-file
    * ([[FileTagging.perFilePartitions]]) so (a) the file identity and
    * its [[FileConf]] are per-partition constants and (b) the row
    * ordinal counter spans exactly one file in order.
    *
    * Each output row = the first `outArity` fields of the extended
    * delegate row, plus `metaCols` ("_file" / "_pos") appended in the
    * requested order. Ordinals are assigned BEFORE any dead-row
    * filtering, so they are absolute file positions — the coordinate
    * system positional deletes are written against. The delegate must
    * be built without filter pushdown whenever ordinals matter
    * (pos-deletes present or `_pos` requested): parquet row-group
    * skipping would silently shift them. */
  final case class PerFileFactory(
      inner: PartitionReaderFactory,
      confByPath: Map[String, FileConf],
      outArity: Int,
      extended: StructType,
      metaCols: Seq[String]) extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean = false
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val path = p match {
        case fp: FilePartition =>
          java.net.URLDecoder.decode(fp.files.head.urlEncodedPath, "UTF-8")
        case other => throw new IllegalStateException(s"unexpected partition: $other")
      }
      val conf = confByPath.getOrElse(
        new org.apache.hadoop.fs.Path(path).toUri.getPath, FileConf(Seq.empty, Set.empty))
      val delegate = inner.createReader(p)
      new PartitionReader[InternalRow] {
        private val proj = UnsafeProjection.create(
          extended.fields.take(outArity).toIndexedSeq.zipWithIndex.map {
            case (f, i) => BoundReference(i, f.dataType, f.nullable)
          })
        private val metaRow =
          if (metaCols.isEmpty) null
          else new GenericInternalRow(metaCols.map {
            case "_file" => UTF8String.fromString(path): Any
            case "_pos" => 0L: Any
            case other => throw new IllegalStateException(s"unknown metadata column $other")
          }.toArray)
        private val posSlot = metaCols.indexOf("_pos")
        private val joined = new JoinedRow
        private var ordinal = -1L
        private var current: InternalRow = _
        private var currentPos = -1L

        override def next(): Boolean = {
          while (delegate.next()) {
            ordinal += 1
            val row = delegate.get()
            if (!conf.deadPos.contains(ordinal)) {
              val eqDead = conf.keySets.exists { ks =>
                val k = rowKey(row, ks)
                k != null && ks.dead.contains(k)
              }
              if (!eqDead) { current = row; currentPos = ordinal; return true }
            }
          }
          false
        }
        override def get(): InternalRow = {
          val out = proj(current)
          if (metaRow == null) out
          else {
            if (posSlot >= 0) metaRow.update(posSlot, currentPos)
            joined(out, metaRow)
          }
        }
        override def close(): Unit = delegate.close()
      }
    }
  }
}
