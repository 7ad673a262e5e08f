package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.functions.IcebergBucket

/** C72 — V2 FunctionCatalog surface: the `bucket(n, col)` transform
  * function, which is what lets Spark RESOLVE a bucket expression in
  * a write's required distribution/ordering (and in key-grouped scan
  * reporting). The function is exactly the engine's bucket hash —
  * the Iceberg-spec Appendix-B murmur3_x86_32
  * ([[graft.functions.IcebergBucket]]), the same value
  * [[Transforms.clusterExpr]] materializes into the hidden `__pt_`
  * column — so rows a SQL INSERT sorts by this function land in files
  * whose `__pt_` footer stats agree with scan-side pruning, and
  * external Iceberg engines agree with both.
  */
object GraftFunctions {

  def load(ident: Identifier): UnboundFunction = {
    val ok = ident.name == "bucket" &&
      (ident.namespace.isEmpty || ident.namespace.sameElements(Array("system")))
    if (!ok) throw new NoSuchElementException(
      s"undefined function: ${(ident.namespace :+ ident.name).mkString(".")}")
    BucketUnbound
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array(Identifier.of(namespace, "bucket"))
    else Array.empty

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): Iceberg-spec (hash & MaxInt) % n — graft's hidden-partition hash"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields.head.dataType == IntegerType,
        s"bucket expects (INT n, col), got $inputType")
      val dt = inputType.fields(1).dataType
      require(Transforms.supports("bucket[1]", dt), s"bucket does not support $dt")
      new BucketBound(dt)
    }
  }

  /** Row-at-a-time bucket evaluation; bucket(null) is null (Iceberg
    * spec), matching the materialized `__pt_` value exactly — null
    * sort keys group together, which is all a write distribution
    * needs. */
  final class BucketBound(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = true
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      if (input.isNullAt(1)) return null
      val h = dt match {
        case ByteType => IcebergBucket.hashLong(input.getByte(1).toLong)
        case ShortType => IcebergBucket.hashLong(input.getShort(1).toLong)
        case IntegerType | DateType => IcebergBucket.hashLong(input.getInt(1).toLong)
        case LongType | TimestampType | TimestampNTZType =>
          IcebergBucket.hashLong(input.getLong(1))
        case StringType => IcebergBucket.hashBytes(input.getUTF8String(1).getBytes)
        case BinaryType => IcebergBucket.hashBytes(input.getBinary(1))
        case d: DecimalType => IcebergBucket.hashDecimal(
          input.getDecimal(1, d.precision, d.scale).toJavaBigDecimal.unscaledValue())
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      Integer.valueOf(IcebergBucket.bucket(h, n))
    }
  }
}
