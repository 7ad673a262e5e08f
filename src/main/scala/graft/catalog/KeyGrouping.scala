package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Key-grouped (storage-partitioned-join) support: derives a partition
  * key per data file from the snapshot manifest, with no directory
  * layout or extra metadata — a file whose stats pin every identity
  * partition-spec column to one value (min == max) IS that key's file.
  */
object KeyGrouping {

  /** Spec fields + per-file key (grouping tuple, reported InternalRow)
    * when EVERY file is single-valued on EVERY spec dimension; None
    * disables key-grouped reporting. Identity fields key on the source
    * column's stats; bucket fields (C74) key on the hidden `__pt_`
    * column's stats — the reported partitioning then carries the
    * `bucket(n, col)` transform, which Spark resolves through the
    * catalog's V2 function (GraftFunctions) and aligns across join
    * sides: two co-bucketed tables join with ZERO shuffle even though
    * their raw key values never appear in any directory layout. */
  def keysFor(meta: TableMetadata, schema: StructType, entries: Seq[DataFileEntry])
      : Option[(Seq[PartitionField], Map[String, (Seq[Any], InternalRow)])] = {
    val spec = meta.specs.find(_.specId == meta.defaultSpecId)
      .map(_.fields).getOrElse(Seq.empty)
    def kind(f: PartitionField): String = Transforms.parse(f.transform).kind
    if (spec.isEmpty || entries.isEmpty ||
        !spec.forall(f => kind(f) == "identity" || kind(f) == "bucket"))
      return None
    // bucket SPJ aligns stored __pt_ values with partition keys Spark
    // computes through the catalog's bucket() function — an unmarked
    // (old-hash) table could split one join key across groups, so
    // bucket dims require the current-hash marker (identity dims are
    // value-based and safe either way)
    if (spec.exists(f => kind(f) == "bucket") && !Transforms.hashCurrent(meta))
      return None
    // (stat column to read, value type) per spec dimension
    val dims = spec.map { f =>
      if (kind(f) == "bucket") Some((Transforms.ptColName(f), IntegerType: DataType))
      else schema.fields.find(_.name == f.name)
        .filter(sf => supported(sf.dataType)).map(sf => (f.name, sf.dataType))
    }
    if (dims.exists(_.isEmpty)) return None

    val perFile = entries.map { e =>
      val vals = dims.flatten.map { case (c, dt) =>
        e.stats.get(c) match {
          case Some(ColumnStats(Some(mn), Some(mx), _)) if mn == mx => parse(dt, mn)
          case _ => None
        }
      }
      if (vals.exists(_.isEmpty)) return None
      val key = vals.map(_.get)
      new Path(e.path).toUri.getPath -> (key, new GenericInternalRow(key.toArray): InternalRow)
    }.toMap
    Some((spec, perFile))
  }

  /** The reported partitioning expression for one spec dimension. */
  def partitionExpr(f: PartitionField)
      : org.apache.spark.sql.connector.expressions.Expression =
    Transforms.parse(f.transform) match {
      case Transforms.Parsed("bucket", n) =>
        org.apache.spark.sql.connector.expressions.Expressions.bucket(n, f.name)
      case _ => org.apache.spark.sql.connector.expressions.Expressions.identity(f.name)
    }

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
         StringType | DateType | FloatType | DoubleType => true
    case _ => false
  }

  private def parse(dt: DataType, s: String): Option[Any] =
    scala.util.Try[Any] {
      dt match {
        case ByteType => s.toDouble.toByte
        case ShortType => s.toDouble.toShort
        case IntegerType => s.toDouble.toInt
        case LongType => s.toDouble.toLong
        case BooleanType => s.toBoolean
        case StringType => UTF8String.fromString(s)
        case DateType => s.toDouble.toInt // days since epoch
        case FloatType => s.toFloat
        case DoubleType => s.toDouble
        case other => throw new IllegalArgumentException(other.sql)
      }
    }.toOption

  /** A parquet FilePartition carrying its partition-key value — what
    * Spark's SPJ planner groups and aligns across join sides. */
  final case class KeyedFilePartition(inner: FilePartition, key: InternalRow)
      extends InputPartition with HasPartitionKey {
    override def partitionKey(): InternalRow = key
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  /** Delegating factory that strips the key wrapper before handing the
    * partition to the stock parquet reader factory. */
  final case class UnwrappingReaderFactory(inner: PartitionReaderFactory)
      extends PartitionReaderFactory {
    private def unwrap(p: InputPartition): InputPartition = p match {
      case KeyedFilePartition(fp, _) => fp
      case other => other
    }
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      inner.createReader(unwrap(p))
    override def createColumnarReader(p: InputPartition)
        : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
      inner.createColumnarReader(unwrap(p))
    override def supportColumnarReads(p: InputPartition): Boolean =
      inner.supportColumnarReads(unwrap(p))
  }
}
