package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_hilbert(array<long> cells, bits)` — n-dimensional Hilbert
  * index via the Skilling transform (John Skilling, "Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004 — the standard public
  * n-D formulation): coordinates → transpose form by inverting the
  * undo/exchange pass and Gray decoding, then bit-interleave. One
  * fused per-row loop, fully codegen'd.
  *
  * This is the >2-dimension clustering path
  * ([[graft.catalog.ZOrder.withHilbert]] keeps its unrolled Column
  * formulation for 2 dims); any Hilbert orientation serves clustering
  * equally — the property that matters is that consecutive curve
  * positions are ALWAYS Manhattan-adjacent cells, which the spec
  * asserts by exhaustive grid walk. */
case class HilbertIndex(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert expects ARRAY<BIGINT>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(input: Any): Any =
    HilbertIndex.index(input.asInstanceOf[ArrayData].toLongArray(), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HilbertIndex.index($c.toLongArray(), $bits)")

  override protected def withNewChildInternal(newChild: Expression): HilbertIndex =
    copy(child = newChild)
}

object HilbertIndex {

  /** Skilling AxesToTranspose + interleave: `cells(i)` in
    * [0, 2^bits); returns the Hilbert distance in [0, 2^(n*bits)).
    * n*bits must stay under 63. */
  def index(cellsIn: Array[Long], bits: Int): Long = {
    val n = cellsIn.length
    val x = new Array[Long](n)
    System.arraycopy(cellsIn, 0, x, 0, n)
    // inverse undo: top-down exchange/invert against x(0)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose → scalar: bit b of x(j) lands at b*n + (n-1-j)
    var d = 0L
    var b = 0
    while (b < bits) {
      var j = 0
      while (j < n) {
        d |= ((x(j) >> b) & 1L) << (b * n + (n - 1 - j))
        j += 1
      }
      b += 1
    }
    d
  }
}
