package graft.catalog

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Per-file column statistics: collection from parquet footers at
  * commit time, and conservative file-skipping at scan time —
  * Iceberg-style scan planning (manifest min/max instead of listing +
  * opening every file). The reference catalog carries the same idea
  * via set-statistics (denali logic/updates.go SetStatisticsUpdate);
  * here the stats live per data file in the snapshot manifest where
  * the scanner can use them.
  *
  * Values are stored as strings in the manifest; the TABLE SCHEMA
  * decides how they compare at evaluation time (numeric / string /
  * date-days / timestamp-micros). Unknown shapes are never skipped —
  * pruning is only applied when a file is PROVABLY excluded.
  */
object Stats {

  /** Footer opens performed by [[collect]] since JVM start — spec
    * instrumentation proving that commit CAS retries and repeated
    * commits of the same files never re-open an already-collected
    * footer (local-mode executors share this JVM, so the distributed
    * collection path counts here too). */
  val footerReads = new java.util.concurrent.atomic.AtomicLong

  /** Read footer metadata for one file: row count + per-column
    * min/max/null-count aggregated across row groups. Dispatches on
    * extension: parquet footers or ORC file-tail statistics (C58). */
  def collect(conf: Configuration, file: String): DataFileEntry = {
    footerReads.incrementAndGet()
    if (file.endsWith(".orc")) collectOrc(conf, file) else collectParquet(conf, file)
  }

  /** ORC file-tail statistics → the same manifest stats shape the
    * parquet path produces. Numeric/string/boolean columns get
    * min/max/null-count; other types stay stat-less (conservative —
    * never pruned). */
  private def collectOrc(conf: Configuration, file: String): DataFileEntry = {
    import org.apache.orc.{OrcFile, ColumnStatistics}
    val reader = OrcFile.createReader(new Path(file), OrcFile.readerOptions(conf))
    try {
      val rows = reader.getNumberOfRows
      val schema = reader.getSchema // struct<...>
      val names = schema.getFieldNames.asScala.toSeq
      val children = schema.getChildren.asScala.toSeq
      val all = reader.getStatistics // indexed by flattened column id; 0 = root
      val cols = names.zip(children).flatMap { case (name, child) =>
        val cs: ColumnStatistics = all(child.getId)
        val nulls = Some(rows - cs.getNumberOfValues)
        val mm: Option[(String, String)] = cs match {
          case s: org.apache.orc.IntegerColumnStatistics if cs.getNumberOfValues > 0 =>
            Some((s.getMinimum.toString, s.getMaximum.toString))
          case s: org.apache.orc.DoubleColumnStatistics if cs.getNumberOfValues > 0 =>
            Some((s.getMinimum.toString, s.getMaximum.toString))
          case s: org.apache.orc.StringColumnStatistics
              if cs.getNumberOfValues > 0 && s.getMinimum != null && s.getMaximum != null =>
            Some((s.getMinimum, s.getMaximum))
          case _ => None
        }
        mm match {
          case Some((mn, mx)) => Some(name -> ColumnStats(Some(mn), Some(mx), nulls))
          case None if cs.getNumberOfValues < rows =>
            Some(name -> ColumnStats(None, None, nulls)) // null-count still usable
          case None => None
        }
      }.toMap
      val bytes = Try(new Path(file).getFileSystem(conf)
        .getFileStatus(new Path(file)).getLen).toOption
      DataFileEntry(file, Some(rows), cols, bytes = bytes)
    } finally reader.close()
  }

  private def collectParquet(conf: Configuration, file: String): DataFileEntry = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val mins = scala.collection.mutable.Map[String, String]()
      val maxs = scala.collection.mutable.Map[String, String]()
      val nulls = scala.collection.mutable.Map[String, Long]()
      var unusable = Set.empty[String] // min/max unusable; null counts may still be
      var nullsUnknown = Set.empty[String]
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val name = c.getPath.toDotString
          val st = c.getStatistics
          // null counts accumulate independently of min/max usability:
          // an all-null chunk has no min/max but a definite null count,
          // which IsNull pruning and COUNT(col) pushdown (C82) can use
          if (st != null && st.isNumNullsSet && st.getNumNulls >= 0)
            nulls(name) = nulls.getOrElse(name, 0L) + st.getNumNulls
          else nullsUnknown += name
          if (st == null || !st.hasNonNullValue || unusable.contains(name)) {
            unusable += name
          } else {
            val logical = c.getPrimitiveType.getLogicalTypeAnnotation
            (render(st.genericGetMin.asInstanceOf[AnyRef], logical),
             render(st.genericGetMax.asInstanceOf[AnyRef], logical)) match {
              case (Some(mn), Some(mx)) =>
                mins(name) = mins.get(name).map(old => minOf(old, mn, logical)).getOrElse(mn)
                maxs(name) = maxs.get(name).map(old => maxOf(old, mx, logical)).getOrElse(mx)
              case _ => unusable += name
            }
          }
        }
      }
      def knownNulls(name: String): Option[Long] =
        if (nullsUnknown.contains(name)) None else nulls.get(name)
      val withMinMax = (mins.keySet -- unusable).map { name =>
        name -> ColumnStats(Some(mins(name)), Some(maxs(name)), knownNulls(name))
      }.toMap
      // null-count-only entries (all-null columns, or min/max-unusable
      // types with known null counts) — same shape the ORC path keeps
      val nullOnly = (nulls.keySet -- withMinMax.keySet -- nullsUnknown).map { name =>
        name -> ColumnStats(None, None, Some(nulls(name)))
      }.toMap
      val cols = withMinMax ++ nullOnly
      val bytes = Try(new Path(file).getFileSystem(conf)
        .getFileStatus(new Path(file)).getLen).toOption
      DataFileEntry(file, Some(rows), cols, bytes = bytes)
    } finally reader.close()
  }

  private def isString(l: LogicalTypeAnnotation): Boolean =
    l != null && l.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]

  private def render(v: AnyRef, logical: LogicalTypeAnnotation): Option[String] = v match {
    case null => None
    case b: Binary if isString(logical) => Some(b.toStringUsingUTF8)
    case _: Binary => None // opaque binary — no usable ordering
    case n: Number => Some(n.toString)
    case b: java.lang.Boolean => Some(b.toString)
    case _ => None
  }

  /** String stats compare in UTF-8 BYTE order everywhere in this
    * file — parquet's unsigned-byte stat ordering and Spark's
    * UTF8String ordering agree on it, while Java String (UTF-16
    * code units) disagrees for strings mixing U+E000–U+FFFF with
    * supplementary-plane characters; aggregating or pruning in the
    * Java order could return a wrong pushed-down MIN/MAX (C82) or
    * mis-prune a file. */
  private def utf8Cmp(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  private def minOf(a: String, b: String, logical: LogicalTypeAnnotation): String =
    if (isString(logical)) { if (utf8Cmp(a, b) <= 0) a else b }
    else if (Try(a.toDouble).isSuccess) { if (a.toDouble <= b.toDouble) a else b }
    else a
  private def maxOf(a: String, b: String, logical: LogicalTypeAnnotation): String =
    if (isString(logical)) { if (utf8Cmp(a, b) >= 0) a else b }
    else if (Try(a.toDouble).isSuccess) { if (a.toDouble >= b.toDouble) a else b }
    else a

  // ---------- skipping ----------

  /** May `entry` contain rows matching `filter`? False only when the
    * file's stats PROVE no row can match. */
  def mayContain(entry: DataFileEntry, schema: StructType, filter: Filter): Boolean =
    filter match {
      case And(l, r) => mayContain(entry, schema, l) && mayContain(entry, schema, r)
      case Or(l, r) => mayContain(entry, schema, l) || mayContain(entry, schema, r)
      case Not(_) => true // conservative
      case EqualTo(c, v) => rangeOverlaps(entry, schema, c, v, v)
      case EqualNullSafe(c, v) => if (v == null) true else rangeOverlaps(entry, schema, c, v, v)
      case GreaterThan(c, v) => upperAllows(entry, schema, c, v, strict = true)
      case GreaterThanOrEqual(c, v) => upperAllows(entry, schema, c, v, strict = false)
      case LessThan(c, v) => lowerAllows(entry, schema, c, v, strict = true)
      case LessThanOrEqual(c, v) => lowerAllows(entry, schema, c, v, strict = false)
      case In(c, vs) => vs.isEmpty || vs.exists(v => rangeOverlaps(entry, schema, c, v, v))
      case IsNull(c) =>
        entry.stats.get(c).flatMap(_.nulls) match {
          case Some(0L) => false
          case _ => true
        }
      case IsNotNull(c) =>
        (entry.stats.get(c).flatMap(_.nulls), entry.rows) match {
          case (Some(n), Some(r)) => n < r
          case _ => true
        }
      case _ => true // StringStartsWith etc. — conservative
    }

  /** STRICT projection (Iceberg's strict-projection role): true only
    * when EVERY row of the file PROVABLY satisfies `filter` — the
    * overwrite-by-filter classifier's "replace whole file" test, so a
    * wrong true here loses rows. Hence: exact arithmetic (BigDecimal,
    * never the double keys [[mayContain]] can afford), null counts
    * consulted (a null row never satisfies a comparison), and false
    * for every shape not provable from min/max alone. */
  def mustAllMatch(entry: DataFileEntry, schema: StructType, filter: Filter): Boolean = {
    def noNulls(c: String): Boolean =
      entry.stats.get(c).flatMap(_.nulls).contains(0L)
    def dtOf(c: String): Option[DataType] =
      schema.fields.find(_.name == c).map(_.dataType)
    // (min, max) as exact comparables; None when stats are absent
    def bounds(c: String): Option[(Either[BigDecimal, String], Either[BigDecimal, String])] =
      for {
        dt <- dtOf(c); cs <- entry.stats.get(c); mnS <- cs.min; mxS <- cs.max
        mn <- exactStat(dt, mnS); mx <- exactStat(dt, mxS)
      } yield (mn, mx)
    def vKey(c: String, v: Any): Option[Either[BigDecimal, String]] =
      dtOf(c).flatMap(exactVal(_, v))
    // file is single-valued on c AND that value compares-equal to v
    def singleValueEq(c: String, v: Any): Boolean =
      (bounds(c), vKey(c, v)) match {
        case (Some((mn, mx)), Some(k)) =>
          exactCmp(mn, mx).contains(0) && exactCmp(mn, k).contains(0)
        case _ => false
      }
    filter match {
      case And(l, r) => mustAllMatch(entry, schema, l) && mustAllMatch(entry, schema, r)
      case Or(l, r) => mustAllMatch(entry, schema, l) || mustAllMatch(entry, schema, r)
      case EqualTo(c, v) => v != null && noNulls(c) && singleValueEq(c, v)
      case EqualNullSafe(c, v) =>
        if (v == null) mustAllMatch(entry, schema, IsNull(c))
        else noNulls(c) && singleValueEq(c, v)
      case In(c, vs) =>
        noNulls(c) && vs.nonEmpty && vs.exists(v => v != null && singleValueEq(c, v))
      case GreaterThan(c, v) =>
        noNulls(c) && ((bounds(c), vKey(c, v)) match {
          case (Some((mn, _)), Some(k)) => exactCmp(mn, k).exists(_ > 0)
          case _ => false
        })
      case GreaterThanOrEqual(c, v) =>
        noNulls(c) && ((bounds(c), vKey(c, v)) match {
          case (Some((mn, _)), Some(k)) => exactCmp(mn, k).exists(_ >= 0)
          case _ => false
        })
      case LessThan(c, v) =>
        noNulls(c) && ((bounds(c), vKey(c, v)) match {
          case (Some((_, mx)), Some(k)) => exactCmp(mx, k).exists(_ < 0)
          case _ => false
        })
      case LessThanOrEqual(c, v) =>
        noNulls(c) && ((bounds(c), vKey(c, v)) match {
          case (Some((_, mx)), Some(k)) => exactCmp(mx, k).exists(_ <= 0)
          case _ => false
        })
      case IsNull(c) =>
        (entry.stats.get(c).flatMap(_.nulls), entry.rows) match {
          case (Some(n), Some(r)) => n == r
          case _ => false
        }
      case IsNotNull(c) => noNulls(c)
      case _: AlwaysTrue => true
      case _ => false // Not, string matches, unknown shapes: not provable
    }
  }

  private def exactStat(dt: DataType, s: String): Option[Either[BigDecimal, String]] =
    dt match {
      case _: NumericType => Try(Left(BigDecimal(s))).toOption
      case StringType => Some(Right(s))
      case DateType => Try(Left(BigDecimal(s))).toOption // days since epoch
      case TimestampType | TimestampNTZType => Try(Left(BigDecimal(s))).toOption // micros
      case _ => None
    }

  private def exactVal(dt: DataType, v: Any): Option[Either[BigDecimal, String]] =
    (dt, v) match {
      case (_, null) => None
      case (_: NumericType, n: java.lang.Number) =>
        Try(Left(BigDecimal(n.toString))).toOption
      case (StringType, s: String) => Some(Right(s))
      case (StringType, s: org.apache.spark.unsafe.types.UTF8String) => Some(Right(s.toString))
      case (DateType, d: java.sql.Date) => Some(Left(BigDecimal(d.toLocalDate.toEpochDay)))
      case (DateType, d: java.time.LocalDate) => Some(Left(BigDecimal(d.toEpochDay)))
      case (TimestampType | TimestampNTZType, t: java.sql.Timestamp) =>
        Some(Left(BigDecimal(t.getTime) * 1000 + (t.getNanos / 1000) % 1000))
      case (TimestampType | TimestampNTZType, i: java.time.Instant) =>
        Some(Left(BigDecimal(i.getEpochSecond) * 1000000 + i.getNano / 1000))
      case _ => None
    }

  private def exactCmp(
      a: Either[BigDecimal, String], b: Either[BigDecimal, String]): Option[Int] =
    (a, b) match {
      case (Left(x), Left(y)) => Some(x.compare(y))
      case (Right(x), Right(y)) => Some(utf8Cmp(x, y))
      case _ => None
    }

  /** Comparable projection of a filter value / stored stat for the
    * column type; None ⇒ cannot compare ⇒ never skip. */
  private def key(dt: DataType, v: Any): Option[Either[Double, String]] = (dt, v) match {
    case (_, null) => None
    case (_: NumericType, n: Number) => Some(Left(n.doubleValue()))
    case (StringType, s: String) => Some(Right(s))
    case (StringType, s: org.apache.spark.unsafe.types.UTF8String) => Some(Right(s.toString))
    case (DateType, d: java.sql.Date) => Some(Left(d.toLocalDate.toEpochDay.toDouble))
    case (DateType, d: java.time.LocalDate) => Some(Left(d.toEpochDay.toDouble))
    case (TimestampType | TimestampNTZType, t: java.sql.Timestamp) =>
      Some(Left(t.getTime * 1000.0 + (t.getNanos / 1000) % 1000))
    case (TimestampType | TimestampNTZType, i: java.time.Instant) =>
      Some(Left(i.getEpochSecond * 1e6 + i.getNano / 1000.0))
    case (TimestampType | TimestampNTZType, l: java.time.LocalDateTime) =>
      Some(Left(l.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1e6))
    case _ => None
  }

  /** Stored stat string → comparable key (stats for date/timestamp
    * columns come from footers as primitive ints/longs). */
  private def statKey(dt: DataType, s: String): Option[Either[Double, String]] = dt match {
    case _: NumericType => Try(Left(s.toDouble)).toOption
    case StringType => Some(Right(s))
    case DateType => Try(Left(s.toDouble)).toOption // days since epoch
    case TimestampType | TimestampNTZType => Try(Left(s.toDouble)).toOption // micros
    case _ => None
  }

  private def colBounds(entry: DataFileEntry, schema: StructType, col: String)
      : Option[(Either[Double, String], Either[Double, String], DataType)] =
    for {
      field <- schema.fields.find(_.name == col)
      cs <- entry.stats.get(col)
      mnS <- cs.min; mxS <- cs.max
      mn <- statKey(field.dataType, mnS)
      mx <- statKey(field.dataType, mxS)
    } yield (mn, mx, field.dataType)

  private def cmp(a: Either[Double, String], b: Either[Double, String]): Option[Int] =
    (a, b) match {
      case (Left(x), Left(y)) => Some(java.lang.Double.compare(x, y))
      case (Right(x), Right(y)) => Some(utf8Cmp(x, y))
      case _ => None
    }

  private def rangeOverlaps(e: DataFileEntry, schema: StructType, col: String,
      lo: Any, hi: Any): Boolean =
    colBounds(e, schema, col) match {
      case Some((mn, mx, dt)) =>
        (key(dt, lo), key(dt, hi)) match {
          case (Some(l), Some(h)) =>
            cmp(h, mn).forall(_ >= 0) && cmp(l, mx).forall(_ <= 0)
          case _ => true
        }
      case None => true
    }

  /** Could entries `a` and `b` both hold an EQUAL value of `col`?
    * Bounds come from both manifests; conservative — missing stats or
    * incomparable types ⇒ true. Drives equality-delete application
    * skipping: a delete file whose key range is provably disjoint
    * from a data file's range on ANY key column cannot mask any of
    * its rows, so the reader never probes that pairing. */
  def rangesMayOverlap(a: DataFileEntry, b: DataFileEntry,
      schema: StructType, col: String): Boolean =
    (colBounds(a, schema, col), colBounds(b, schema, col)) match {
      case (Some((amn, amx, _)), Some((bmn, bmx, _))) =>
        cmp(bmx, amn).forall(_ >= 0) && cmp(bmn, amx).forall(_ <= 0)
      case _ => true
    }

  /** Is any row possibly > v (or >= v)? Requires max compared to v. */
  private def upperAllows(e: DataFileEntry, schema: StructType, col: String,
      v: Any, strict: Boolean): Boolean =
    colBounds(e, schema, col) match {
      case Some((_, mx, dt)) =>
        key(dt, v) match {
          case Some(k) => cmp(mx, k).forall(c => if (strict) c > 0 else c >= 0)
          case None => true
        }
      case None => true
    }

  /** Is any row possibly < v (or <= v)? Requires min compared to v. */
  private def lowerAllows(e: DataFileEntry, schema: StructType, col: String,
      v: Any, strict: Boolean): Boolean =
    colBounds(e, schema, col) match {
      case Some((mn, _, dt)) =>
        key(dt, v) match {
          case Some(k) => cmp(mn, k).forall(c => if (strict) c < 0 else c <= 0)
          case None => true
        }
      case None => true
    }
}

/** Minimal serializable wrapper for a Hadoop `Configuration` (the
  * standard Spark closure pattern: `Configuration` is Writable but not
  * Serializable) — lets [[TableOps]] ship the filesystem conf to
  * executors for the distributed footer-stat job. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
