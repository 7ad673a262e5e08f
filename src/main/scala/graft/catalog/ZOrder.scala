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

  /** Morton value of two (numeric) columns, each normalized to
    * 16 bits over [min, max]. Nulls sort first (z-value 0 slot).
    * (The spread ladder places bits 2 apart — exactly two dims; a
    * wider ladder would generalize to 3-4.) */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size == 2, "z-order over exactly 2 columns")
    val aggCols = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).collect().head
    val normalized = cols.zipWithIndex.map { case (c, i) =>
      val mn = bounds.getDouble(2 * i)
      val mx = bounds.getDouble(2 * i + 1)
      val scaled =
        if (mx > mn)
          ((col(c).cast("double") - lit(mn)) / lit(mx - mn) * lit(65535.0)).cast("long")
        else lit(0L)
      spread16(coalesce(scaled, lit(0L)))
    }
    // dimension k contributes its spread bits shifted by k
    normalized.zipWithIndex.map { case (s, k) => shiftleft(s, k): Column }
      .reduce(_ bitwiseOR _)
  }
}
