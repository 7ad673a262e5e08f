package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text-hash signatures for the dedup family
  * (SURVEY.md §2.3 L2/L3). Each replaces an interpreted
  * higher-order-function chain that ran one lambda per (token × bit)
  * with a single fused loop, while producing BIT-IDENTICAL output to
  * the SQL formulation it replaced (same xxhash64 seed 42, same
  * vote/affine arithmetic), so downstream candidate sets are
  * unchanged. */
object TextHashes {

  /** Production hash mode: the dedup family's PER-TOKEN hash switches
    * from the cross-engine md5 prefix to xxhash64 (~3× cheaper per
    * shingle, the dominant dedup CPU cost at corpus scale). Default
    * stays the md5 oracle mode — that is what lets the driver's DuckDB
    * oracle replay MinHash/SimHash signatures bit-for-bit. Derived
    * ONE-TIME constants (MinHash permutation coefficients, hyperplane
    * weights) stay md5-based in both modes: their cost is per JVM, not
    * per row. Opt in per JVM with `-Dgraft.hash.mode=production` /
    * `GRAFT_HASH_MODE=production`, or at runtime via
    * [[setProductionMode]] (flushes the per-mode memo caches).
    * Signatures from the two modes are incompatible — never mix modes
    * across the corpus inside one dedup run. */
  @volatile private var production0: Boolean =
    sys.props.get("graft.hash.mode").orElse(sys.env.get("GRAFT_HASH_MODE"))
      .contains("production")

  def productionMode: Boolean = production0

  def setProductionMode(on: Boolean): Unit = synchronized {
    if (production0 != on) {
      production0 = on
      SimHash64.clearMemo()
    }
  }

  /** Per-token 60-bit hash (SimHash bit source): md5 prefix in oracle
    * mode, xxhash64 in production. */
  @inline def token60(s: UTF8String): Long =
    if (production0) XXH64.hashUTF8String(s, 42L) >>> 4 else md5Low60(s)

  /** Per-shingle base hash for the MinHash affine permutations. */
  @inline def shingleBase(s: UTF8String, p: Long): Long =
    if (production0) pmod(XXH64.hashUTF8String(s, 42L), p) else pmod(md5Low32(s), p)

  /** Spark SQL's xxhash64(string) with its default seed. */
  @inline def hashString(s: UTF8String, seed: Long = 42L): Long =
    XXH64.hashUTF8String(s, seed)

  /** Spark SQL's xxhash64(int) — ints hash via their 8-byte widening
    * on the long path used by sequence() elements cast in graft's SQL
    * (sequence produces ints; xxhash64 hashes IntegerType as 4-byte).
    */
  @inline def hashInt(i: Int, seed: Long = 42L): Long =
    XXH64.hashInt(i, seed)

  @inline def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  // ---- cross-engine (md5-prefix) hashes -------------------------------
  // Any engine with md5() reproduces these: the value IS the first 8/15
  // hex chars of the digest read as an unsigned integer —
  //   Spark:  CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT)
  //   DuckDB: CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
  // That's what lets the MinHash/SimHash pipelines ship DuckDB oracles
  // instead of rows-only checks.

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  @inline private def md5First8(bytes: Array[Byte]): Long = {
    val d = md5Local.get(); d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xFFL) << 56) | ((h(1) & 0xFFL) << 48) | ((h(2) & 0xFFL) << 40) |
      ((h(3) & 0xFFL) << 32) | ((h(4) & 0xFFL) << 24) | ((h(5) & 0xFFL) << 16) |
      ((h(6) & 0xFFL) << 8) | (h(7) & 0xFFL)
  }

  /** First 8 hex chars of md5 as an unsigned 32-bit value. */
  @inline def md5Low32(s: UTF8String): Long = md5First8(s.getBytes) >>> 32
  @inline def md5Low32(s: String): Long =
    md5First8(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) >>> 32

  /** First 15 hex chars of md5 as an unsigned 60-bit value (60 keeps
    * every engine's signed-BIGINT cast overflow-free). */
  @inline def md5Low60(s: UTF8String): Long = md5First8(s.getBytes) >>> 4
}

/** `graft_simhash(words)` → 60-bit SimHash of the distinct word set:
  * bit b is set when Σ_words (bit b of md5-low-60(word) ? +1 : -1) > 0.
  * The word hash is the cross-engine md5 prefix (TextHashes), so an
  * ANSI-SQL engine reproduces signatures — and the driver's DuckDB
  * oracle hash-matches the pair output instead of a rows-only check. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val Bits = 60

  // Word hashes follow a Zipfian vocabulary — memoize the md5 for the
  // hot head of the distribution, bounded so an adversarial vocabulary
  // can't grow the executor heap. ~64k entries ≈ a few MB.
  private val memoCap = 1 << 16
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[functions] def clearMemo(): Unit = memo.clear()

  private def hashWord(w: org.apache.spark.unsafe.types.UTF8String): Long = {
    val key = w.toString
    val cached = memo.get(key)
    if (cached != null) cached.longValue()
    else {
      val h = TextHashes.token60(w)
      if (memo.size < memoCap) memo.put(key, h)
      h
    }
  }

  /** One pass: hash each word, accumulate the 60 bit-votes, pack. */
  def compute(words: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val h = hashWord(words.getUTF8String(i))
        var b = 0
        while (b < Bits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** `graft_hyperplane(vec, table, planes)` → LSH hyperplane bucket code
  * for a float vector: bit p = sign(dot(vec, w_p)) with deterministic
  * pseudo-random weights w_p[i] = (md5_low32("t_p_i") mod 1000) / 1000
  * - 0.5 — the cross-engine md5 prefix, so the DuckDB oracle replays
  * bucket codes bit-for-bit (products and the left-to-right double
  * accumulation are IEEE-identical). One fused loop per vector. */
case class HyperplaneCode(child: Expression, tableId: Int, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane expects ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneCode.compute(input.asInstanceOf[ArrayData], tableId, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneCode.compute($c, $tableId, $planes)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCode =
    copy(child = newChild)
}

object HyperplaneCode {
  /** Weight for (table, plane, dim) — cross-engine md5 prefix of the
    * "t_p_i" seed string; SQL mirror:
    * (('0x'||substr(md5(t||'_'||p||'_'||i),1,8))::BIGINT % 1000)
    * / 1000.0 - 0.5. Cached per (table, plane) — md5 runs once per
    * weight per JVM, not once per vector element. */
  private val wcache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  private def weights(table: Int, p: Int, n: Int): Array[Double] = {
    val key = (table.toLong << 32) | (p.toLong & 0xFFFFFFFFL)
    val cached = wcache.get(key)
    if (cached != null && cached.length >= n) cached
    else {
      val arr = Array.tabulate(math.max(n, 64))(i =>
        TextHashes.pmod(TextHashes.md5Low32(s"${table}_${p}_$i"), 1000L) / 1000.0 - 0.5)
      wcache.put(key, arr)
      arr
    }
  }

  def compute(vec: ArrayData, table: Int, planes: Int): Long = {
    val n = vec.numElements()
    var code = 0L
    var p = 0
    while (p < planes) {
      val w = weights(table, p, n)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += vec.getFloat(i).toDouble * w(i)
        i += 1
      }
      if (dot > 0) code += (1L << p)
      p += 1
    }
    code
  }
}

/** `graft_minhash(shingles)` → the 64-permutation MinHash signature:
  * base = md5-low-32(s) mod p; sig_j = min_s (base·a_j + b_j) mod p
  * with p = 2^31-1 and md5-derived coefficients (a_j from "a<j>", b_j
  * from "b<j>") — every ingredient reproducible in ANSI SQL, so the
  * LSH pipeline ships a DuckDB oracle. */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P = 2147483647L // 2^31 - 1

  // Coefficients are a pure function of the permutation index —
  // precomputed once per JVM from the cross-engine md5 prefix:
  // a_j = (md5_low32("a" + j) mod (p-1)) + 1
  // b_j =  md5_low32("b" + j) mod p
  private lazy val coefA: Array[Long] =
    Array.tabulate(64)(j => TextHashes.pmod(TextHashes.md5Low32("a" + j), P - 1) + 1)
  private lazy val coefB: Array[Long] =
    Array.tabulate(64)(j => TextHashes.pmod(TextHashes.md5Low32("b" + j), P))

  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val sig = Array.fill(64)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = TextHashes.shingleBase(shingles.getUTF8String(i), P)
        var j = 0
        while (j < 64) {
          val v = (base * coefA(j) + coefB(j)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
