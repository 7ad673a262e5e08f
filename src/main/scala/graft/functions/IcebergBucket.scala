package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-spec `bucket[N]` transform hashing (spec Appendix B:
  * 32-bit Murmur3, x86 variant, seed 0, over the spec's per-type byte
  * encodings; bucket value = `(hash & Integer.MAX_VALUE) % N`). This
  * is the hash EXTERNAL engines (Trino, pyiceberg, DuckDB-iceberg)
  * compute, so files graft writes under a bucket partition spec carry
  * bucket values any Iceberg reader agrees with — which is what lets
  * [[graft.catalog.IcebergExport]] export bucket specs faithfully
  * instead of degrading to unpartitioned.
  *
  * Spec encodings (Appendix B "Bucket transform details"):
  *  - int/long/date/time/timestamp[tz]: the 64-bit value's 8
  *    little-endian bytes (ints hash AS longs so the transform is
  *    stable under INT→BIGINT type widening; dates hash their day
  *    ordinal, timestamps their microsecond count)
  *  - string: UTF-8 bytes
  *  - binary/fixed: raw bytes
  *  - decimal: minimum-width two's-complement big-endian bytes of the
  *    unscaled value (`BigInteger.toByteArray`)
  *  - uuid: 16 big-endian bytes
  * NULL is never hashed: bucket(null) is null (spec: "transforms must
  * return null for a null input value").
  *
  * The Murmur3 here is a self-contained implementation pinned by the
  * spec's own test vectors in FunctionsSpec — NOT Spark's
  * `Murmur3Hash` (seed 42, different string tail handling) and not
  * dependent on hashing utilities whose byte-tail behavior differs
  * across versions.
  */
object IcebergBucket {

  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593

  private def mixK1(k0: Int): Int = {
    var k1 = k0 * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }

  private def mixH1(h0: Int, k1: Int): Int = {
    var h1 = h0 ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }

  private def fmix(h0: Int, len: Int): Int = {
    var h = h0 ^ len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  /** murmur3_x86_32(data, seed 0). */
  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    val nblocks = len >>> 2
    var h1 = 0
    var i = 0
    while (i < nblocks) {
      val b = i << 2
      val k = (data(b) & 0xff) | ((data(b + 1) & 0xff) << 8) |
        ((data(b + 2) & 0xff) << 16) | ((data(b + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 1
    }
    var k1 = 0
    val tail = nblocks << 2
    val rem = len & 3
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      h1 ^= mixK1(k1)
    }
    fmix(h1, len)
  }

  /** murmur3_x86_32 of the long's 8 little-endian bytes — the block
    * reads are little-endian 4-byte words, so this is just the low
    * then high int, no byte array needed. */
  def hashLong(v: Long): Int = {
    var h1 = mixH1(0, mixK1(v.toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix(h1, 8)
  }

  def hashDecimal(unscaled: java.math.BigInteger): Int =
    hashBytes(unscaled.toByteArray)

  def hashUuid(u: java.util.UUID): Int = {
    val bb = java.nio.ByteBuffer.allocate(16) // big-endian by default
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    hashBytes(bb.array())
  }

  /** Spec bucket: `(hash & Integer.MAX_VALUE) % N` — always in [0, N). */
  def bucket(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n

  // ---- typed, codegen-callable entry points ----
  def bucketLong(v: Long, n: Int): Int = bucket(hashLong(v), n)
  def bucketUTF8(s: UTF8String, n: Int): Int = bucket(hashBytes(s.getBytes), n)
  def bucketBinary(b: Array[Byte], n: Int): Int = bucket(hashBytes(b), n)
  def bucketDecimal(d: org.apache.spark.sql.types.Decimal, n: Int): Int =
    bucket(hashDecimal(d.toJavaBigDecimal.unscaledValue()), n)

  /** Bucket of an EXTERNAL (JVM) value — the `sources.Filter` value
    * space the scan-pruning side sees. None for null or an
    * unbucketable type (callers derive no predicate then). */
  def bucketOfExternal(v: Any, n: Int): Option[Int] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val h = v match {
      case null => return None
      case b: Byte => hashLong(b.toLong)
      case s: Short => hashLong(s.toLong)
      case i: Int => hashLong(i.toLong)
      case l: Long => hashLong(l)
      case s: String => hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case s: UTF8String => hashBytes(s.getBytes)
      case b: Array[Byte] => hashBytes(b)
      case d: java.sql.Date => hashLong(DateTimeUtils.fromJavaDate(d).toLong)
      case d: java.time.LocalDate => hashLong(d.toEpochDay)
      case t: java.sql.Timestamp => hashLong(DateTimeUtils.fromJavaTimestamp(t))
      case t: java.time.Instant => hashLong(DateTimeUtils.instantToMicros(t))
      case t: java.time.LocalDateTime => hashLong(DateTimeUtils.localDateTimeToMicros(t))
      case d: java.math.BigDecimal => hashDecimal(d.unscaledValue())
      case d: BigDecimal => hashDecimal(d.underlying().unscaledValue())
      case d: org.apache.spark.sql.types.Decimal => hashDecimal(d.toJavaBigDecimal.unscaledValue())
      case u: java.util.UUID => hashUuid(u)
      case _ => return None
    }
    Some(bucket(h, n))
  }
}

/** `iceberg_bucket(col, N)` as a native unary expression: NULL in →
  * NULL out, codegen is a single static call (stays inside
  * whole-stage codegen). The write path materializes this as the
  * hidden `__pt_` column; [[graft.catalog.Transforms.bucketOf]] and
  * the V2 FunctionCatalog's `bucket()` compute the identical value,
  * so write-side clustering, scan-side pruning and SQL-visible
  * bucketing always agree. */
case class IcebergBucketExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"bucket count must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | StringType | BinaryType |
         _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket does not support ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case ByteType => IcebergBucket.bucketLong(input.asInstanceOf[Byte].toLong, n)
    case ShortType => IcebergBucket.bucketLong(input.asInstanceOf[Short].toLong, n)
    case IntegerType | DateType => IcebergBucket.bucketLong(input.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType | TimestampNTZType =>
      IcebergBucket.bucketLong(input.asInstanceOf[Long], n)
    case StringType => IcebergBucket.bucketUTF8(input.asInstanceOf[UTF8String], n)
    case BinaryType => IcebergBucket.bucketBinary(input.asInstanceOf[Array[Byte]], n)
    case _: DecimalType =>
      IcebergBucket.bucketDecimal(input.asInstanceOf[org.apache.spark.sql.types.Decimal], n)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType => "bucketLong"
      case StringType => "bucketUTF8"
      case BinaryType => "bucketBinary"
      case _: DecimalType => "bucketDecimal"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    defineCodeGen(ctx, ev, c => s"graft.functions.IcebergBucket.$fn($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)
}
