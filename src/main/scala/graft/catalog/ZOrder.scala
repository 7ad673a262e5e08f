package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional file
  * skipping: rows are ordered by the bit-interleave of their
  * range-normalized cluster columns, so each written file covers a
  * compact HYPER-RECTANGLE of the key space instead of a slab along
  * one column. Manifest min/max stats then prune files for predicates
  * on ANY clustered column — the property single-column sort cannot
  * give (Delta's OPTIMIZE ZORDER, Iceberg's zorder rewrite strategy).
  *
  * Everything is plain Column arithmetic (shift/or/and) — fully
  * codegen'd, no UDF; 16 bits of resolution per dimension, which is
  * file-granularity clustering, not a total order. Bounds for the
  * normalization come from one driver-side agg over the input.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so consecutive bits land 2 apart
    * (the classic Morton magic-number ladder). */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Bits-per-dimension for a k-column interleave: 16 where the full
    * product fits under the Long sign bit, 15 for k=4 (60 bits). */
  def bitsPerDim(k: Int): Int = math.min(16, 62 / k)

  /** Total interleaved bits — callers tile files on the TOP bits. */
  def totalBits(k: Int): Int = k * bitsPerDim(k)

  /** Generic bit spread: bit i of `c` lands at position i*k. The
    * magic-number ladder only exists for k=2; for wider interleaves
    * the per-bit shift-mask chain is still a linear, fully codegen'd
    * expression (16 shifts/ors per dimension). */
  private def spreadK(c: Column, k: Int): Column =
    (0 until bitsPerDim(k)).map { i =>
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k): Column
    }.reduce(_ bitwiseOR _)

  /** Morton value of 2-4 (numeric) columns, each normalized to
    * [[bitsPerDim]] bits over [min, max]. Nulls sort first (z-value 0
    * slot). Dimension j contributes its spread bits shifted by j. */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= 4, "z-order over 2-4 columns")
    val k = cols.size
    val side = (1L << bitsPerDim(k)) - 1
    val aggCols = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).collect().head
    val normalized = cols.zipWithIndex.map { case (c, i) =>
      val mn = bounds.getDouble(2 * i)
      val mx = bounds.getDouble(2 * i + 1)
      val scaled =
        if (mx > mn)
          ((col(c).cast("double") - lit(mn)) / lit(mx - mn) * lit(side.toDouble)).cast("long")
        else lit(0L)
      val v = coalesce(scaled, lit(0L))
      if (k == 2) spread16(v) else spreadK(v, k)
    }
    normalized.zipWithIndex.map { case (s, j) => shiftleft(s, j): Column }
      .reduce(_ bitwiseOR _)
  }

  /** Hilbert-curve index — z-order's locality upgrade: the Hilbert
    * curve never makes the long diagonal jumps Morton order does, so
    * file tiles have strictly better worst-case locality (adjacent
    * curve positions are ALWAYS adjacent cells). 8 bits per dimension
    * = 65k grid cells, plenty for FILE-granularity clustering (files
    * per table « 65k tiles).
    *
    * The classic xy→d loop is unrolled into one `withColumn` level per
    * bit. Each level's state (x, y, d) is a NAMED column, which keeps
    * the plan linear — Catalyst's CollapseProject declines to inline
    * expressions it would duplicate, so codegen evaluates level by
    * level instead of exponentially expanding the when-trees.
    * Appends `outCol`; temp state columns are dropped. */
  /** Hilbert bits per dimension (8 → 256 cells/dim) and the total
    * curve length in bits for a k-column clustering. */
  val HilbertBits = 8
  def hilbertTotalBits(k: Int): Int = k * HilbertBits

  def withHilbert(df: DataFrame, cols: Seq[String], outCol: String): DataFrame = {
    require(cols.size >= 2 && cols.size <= 4, "hilbert over 2-4 columns")
    if (cols.size > 2) return withHilbertN(df, cols, outCol)
    val bits = 8
    val side = (1L << bits) - 1 // 255
    val aggCols = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).collect().head
    def norm(c: String, i: Int): Column = {
      val mn = bounds.getDouble(2 * i)
      val mx = bounds.getDouble(2 * i + 1)
      val scaled =
        if (mx > mn) ((col(c).cast("double") - lit(mn)) / lit(mx - mn) * lit(side.toDouble)).cast("long")
        else lit(0L)
      coalesce(scaled, lit(0L))
    }
    var out = df
      .withColumn("__hx", norm(cols.head, 0))
      .withColumn("__hy", norm(cols(1), 1))
      .withColumn(outCol, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      out = out
        .withColumn("__rx", rx)
        .withColumn("__ry", ry)
        .withColumn(outCol,
          col(outCol) + lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // rotate the quadrant: flip (within the FULL n-1 side, per the
        // canonical xy→d loop) when rx==1, then swap — only on ry==0
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(side) - col("__hy")).otherwise(col("__hy")))
          .otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(side) - col("__hx")).otherwise(col("__hx")))
          .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx")).withColumn("__hy", col("__ny"))
        .drop("__nx", "__ny", "__rx", "__ry")
    }
    out.drop("__hx", "__hy")
  }

  /** 3-4 dimension Hilbert clustering: normalization identical to the
    * 2-D path (range-scale each column to [0, 255], nulls to cell 0),
    * but the curve index comes from the codegen'd
    * [[graft.functions.HilbertIndex]] Skilling-transform expression —
    * one fused per-row loop instead of an unrolled 28-level Column
    * chain (the 2-D unroll stays: it is spec-pinned bit-for-bit
    * against the classic xy→d walk). */
  private def withHilbertN(df: DataFrame, cols: Seq[String], outCol: String): DataFrame = {
    val bits = HilbertBits
    val side = (1L << bits) - 1
    val aggCols = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).collect().head
    def norm(c: String, i: Int): Column = {
      val mn = bounds.getDouble(2 * i)
      val mx = bounds.getDouble(2 * i + 1)
      val scaled =
        if (mx > mn) ((col(c).cast("double") - lit(mn)) / lit(mx - mn) * lit(side.toDouble)).cast("long")
        else lit(0L)
      coalesce(scaled, lit(0L))
    }
    val cells = array(cols.zipWithIndex.map { case (c, i) => norm(c, i) }: _*)
    df.withColumn(outCol,
      org.apache.spark.sql.execution.datasources.GraftBridge.column(
        graft.functions.HilbertIndex(
          org.apache.spark.sql.execution.datasources.GraftBridge.expression(cells), bits)))
  }

  /** Reference Hilbert xy→d (same unrolled algorithm, driver-side) —
    * used by the spec to pin the Column version bit-for-bit. */
  def hilbertIndex(xIn: Long, yIn: Long): Long = {
    val bits = 8
    var x = xIn; var y = yIn; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 255 - x; y = 255 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
