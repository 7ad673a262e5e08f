package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** C72 — V2 FunctionCatalog surface: the `bucket(n, col)` transform
  * function, which is what lets Spark RESOLVE a bucket expression in
  * a write's required distribution/ordering (and in key-grouped scan
  * reporting). The function is exactly the engine's bucket hash —
  * `pmod(murmur3(col, seed 42), n)`, the same value
  * [[Transforms.clusterExpr]] materializes into the hidden `__pt_`
  * column — so rows a SQL INSERT sorts by this function land in files
  * whose `__pt_` footer stats agree with scan-side pruning.
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
      "bucket(n, col): pmod(murmur3(col, 42), n) — graft's hidden-partition hash"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields.head.dataType == IntegerType,
        s"bucket expects (INT n, col), got $inputType")
      val dt = inputType.fields(1).dataType
      require(Transforms.supports("bucket[1]", dt), s"bucket does not support $dt")
      new BucketBound(dt)
    }
  }

  /** Row-at-a-time bucket evaluation; a NULL input hashes like
    * catalyst's `hash(null)` (the seed rides through), so the sort
    * value always equals the materialized `__pt_` value. */
  final class BucketBound(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val h =
        if (input.isNullAt(1)) 42
        else Murmur3HashFunction.hash(input.get(1, dt), dt, 42).toInt
      Integer.valueOf(((h % n) + n) % n)
    }
  }
}
