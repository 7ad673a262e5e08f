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
  * before they leave the scan.
  *
  * Delete state is NEVER materialized on the driver: scan build only
  * PLANS a parquet sub-scan over the delete files (paths + offsets —
  * O(files) metadata) and ships that plan ([[DeleteScanHandle]])
  * inside the reader factory; each EXECUTOR reads the delete files
  * itself on first use and caches the decoded set per JVM (the
  * Iceberg `DeleteFilter` shape). A delete commit carrying millions
  * of keys costs the driver nothing and each executor one read +
  * one in-memory set, instead of a driver collect plus a copy in
  * every serialized task.
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

  /** A PLANNED (not executed) scan over a group of delete files: the
    * parquet reader factory plus its input partitions, both of which
    * Spark already makes serializable for normal task shipping. `id`
    * is the executor-side cache key — unique per scan build. */
  final case class DeleteScanHandle(
      id: String,
      partitions: Seq[InputPartition],
      factory: PartitionReaderFactory,
      schema: StructType) extends Serializable

  /** One equality-delete set: positions/types of its key columns
    * within the EXTENDED read schema, the handle that loads its dead
    * tuples executor-side, and the delete's sequence number (for
    * per-file applicability). */
  final case class KeySet(
      idx: Array[Int], types: Array[DataType], handle: DeleteScanHandle, deleteSeq: Long)
      extends Serializable

  /** Per-data-file delete state: the equality keysets that apply to
    * this file (seq-filtered) plus the positional-delete scan (shared
    * across files; each reader looks up its own ordinals), the
    * deletion-vector scan (same sharing — each reader picks its own
    * file's bitmap) and the table dir that relative delete
    * coordinates resolve against. */
  final case class FileConf(
      keySets: Seq[KeySet],
      posHandle: Option[DeleteScanHandle],
      tableDir: String,
      dvHandle: Option[DeleteScanHandle] = None,
      /** C70 — base row id of this file (`_row_id` = base + ordinal,
        * unless the file carries a materialized `__row_id` column). */
      firstRowId: Option[Long] = None,
      /** Spec-Iceberg positional deletes (externally-committed
        * snapshots): same (path, ordinal) decode, but the scan was
        * planned with the spec's `file_path`/`pos` column names. */
      posSpecHandle: Option[DeleteScanHandle] = None) extends Serializable {
    def isEmpty: Boolean =
      keySets.isEmpty && posHandle.isEmpty && dvHandle.isEmpty && posSpecHandle.isEmpty
  }

  /** Executor-side decoded-delete-set cache: access-ordered LRU, keyed
    * by handle id. Bounds memory on long-lived executors that scan
    * many MOR tables; within one scan every task hits the same entry. */
  private val cache = new java.util.LinkedHashMap[String, AnyRef](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, AnyRef]): Boolean =
      size() > 32
  }
  private def cached[T <: AnyRef](id: String)(load: => T): T = cache.synchronized {
    cache.get(id) match {
      case t: AnyRef if t != null => t.asInstanceOf[T]
      case _ => val t = load; cache.put(id, t); t
    }
  }

  private def foreachRow(h: DeleteScanHandle)(f: InternalRow => Unit): Unit =
    h.partitions.foreach { p =>
      val r = h.factory.createReader(p)
      try while (r.next()) f(r.get()) finally r.close()
    }

  /** Dead key tuples of one equality-delete group, loaded and decoded
    * on the executor (distinct via set insertion; null-containing
    * tuples dropped — they never match). */
  def deadKeys(h: DeleteScanHandle): Set[Vector[Any]] = cached(s"eq:${h.id}") {
    val types = h.schema.fields.map(_.dataType)
    val idx = types.indices.toArray
    val out = scala.collection.mutable.HashSet.empty[Vector[Any]]
    foreachRow(h) { row =>
      val k = extractKey(row, idx, types)
      if (k != null) out += k
    }
    out.toSet
  }

  /** file path (normalized absolute) → dead ordinals, loaded on the
    * executor. Table-relative coordinates (rename-safe) resolve
    * against the CURRENT table dir; legacy absolutes as-is. */
  def deadPositions(h: DeleteScanHandle, tableDir: String): Map[String, Set[Long]] =
    cached(s"pos:${h.id}") {
      def norm(p: String): String = new org.apache.hadoop.fs.Path(p).toUri.getPath
      val out = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.HashSet[Long]]
      foreachRow(h) { row =>
        val s = row.getUTF8String(0).toString
        val p =
          if (s.startsWith("/") || s.contains(":/")) norm(s)
          else norm(new org.apache.hadoop.fs.Path(tableDir, s).toString)
        out.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty) += row.getLong(1)
      }
      out.map { case (k, v) => k -> v.toSet }.toMap
    }

  /** file path (normalized absolute) → deletion-vector bitmap, loaded
    * on the executor. One decoded Roaring bitmap per referenced file —
    * ~128 KB for a million dead ordinals where the parquet-ordinal
    * path would hold a ~64 MB boxed `Set[Long]`. Overlapping DV
    * commits for the same file union (newer commits add dead rows;
    * coordinates never resurrect). */
  def deadVectors(
      h: DeleteScanHandle,
      tableDir: String): Map[String, org.roaringbitmap.longlong.Roaring64NavigableMap] =
    cached(s"dv:${h.id}") {
      def norm(p: String): String = new org.apache.hadoop.fs.Path(p).toUri.getPath
      val out = scala.collection.mutable.HashMap
        .empty[String, org.roaringbitmap.longlong.Roaring64NavigableMap]
      foreachRow(h) { row =>
        val s = row.getUTF8String(0).toString
        val p =
          if (s.startsWith("/") || s.contains(":/")) norm(s)
          else norm(new org.apache.hadoop.fs.Path(tableDir, s).toString)
        val bm = DeletionVectors.deserialize(row.getBinary(2))
        out.get(p) match {
          case Some(acc) => acc.or(bm)
          case None => out.put(p, bm)
        }
      }
      out.toMap
    }

  private def extractKey(row: InternalRow, idx: Array[Int], types: Array[DataType]): Vector[Any] = {
    val out = Vector.newBuilder[Any]
    var i = 0
    while (i < idx.length) {
      val at = idx(i)
      if (row.isNullAt(at)) return null
      out += (types(i) match {
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

  /** External (driver) value → comparison-normal form (kept for
    * callers that compare against executor-decoded tuples). */
  def normalize(v: Any): Any = v match {
    case n: Number => n.longValue()
    case s: String => s
    case b: java.lang.Boolean => b.booleanValue()
    case other => other
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
      val normPath = new org.apache.hadoop.fs.Path(path).toUri.getPath
      val conf = confByPath.getOrElse(normPath, FileConf(Seq.empty, None, ""))
      // Executor-side delete-set resolution: first reader on this JVM
      // loads each delete group once, later readers hit the cache.
      val eqSets: Seq[(Array[Int], Array[DataType], Set[Vector[Any]])] =
        conf.keySets.map(ks => (ks.idx, ks.types, deadKeys(ks.handle)))
      val deadPos: Set[Long] = {
        val graftSide = conf.posHandle match {
          case Some(h) => deadPositions(h, conf.tableDir).getOrElse(normPath, Set.empty)
          case None => Set.empty[Long]
        }
        val specSide = conf.posSpecHandle match {
          case Some(h) => deadPositions(h, conf.tableDir).getOrElse(normPath, Set.empty)
          case None => Set.empty[Long]
        }
        if (specSide.isEmpty) graftSide else graftSide ++ specSide
      }
      val deadVec: org.roaringbitmap.longlong.Roaring64NavigableMap =
        conf.dvHandle.flatMap(h => deadVectors(h, conf.tableDir).get(normPath)).orNull
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
            case "_row_id" => null: Any
            case other => throw new IllegalStateException(s"unknown metadata column $other")
          }.toArray)
        private val posSlot = metaCols.indexOf("_pos")
        private val rowIdSlot = metaCols.indexOf("_row_id")
        // materialized __row_id column position in the delegate row
        private val physRowIdIdx = extended.fieldNames.indexOf(RowLineage.PhysCol)
        private val joined = new JoinedRow
        private var ordinal = -1L
        private var current: InternalRow = _
        private var currentPos = -1L

        override def next(): Boolean = {
          while (delegate.next()) {
            ordinal += 1
            val row = delegate.get()
            if (!deadPos.contains(ordinal) &&
                (deadVec == null || !deadVec.contains(ordinal))) {
              val eqDead = eqSets.exists { case (idx, types, dead) =>
                val k = extractKey(row, idx, types)
                k != null && dead.contains(k)
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
            if (rowIdSlot >= 0) {
              // materialized id wins (survives rewrites); else the
              // manifest base + in-file ordinal; else null (lineage
              // off, or pre-lineage file)
              val id: Any =
                if (physRowIdIdx >= 0 && !current.isNullAt(physRowIdIdx))
                  current.getLong(physRowIdIdx)
                else conf.firstRowId match {
                  case Some(base) => base + currentPos
                  case None => null
                }
              metaRow.update(rowIdSlot, id)
            }
            joined(out, metaRow)
          }
        }
        override def close(): Unit = delegate.close()
      }
    }
  }
}
