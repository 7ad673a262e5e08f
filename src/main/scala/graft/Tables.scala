package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning:
  * filters and projections written against these frames reach the
  * parquet scan (`PushedFilters`/`ReadSchema`). At cluster scale the
  * same call reads a partitioned directory layout unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  /** `events.ts` normalized to nanos-since-epoch BIGINT whatever the
    * parquet physical type is. The driver's generator has shipped it
    * as TIMESTAMP(NANOS) (readable only as long, via
    * `legacy.parquet.nanosAsLong`) in some rounds and TIMESTAMP(MICROS)
    * in others; every downstream query derives epoch seconds as
    * `ts div 1e9`, so dispatch on the loaded type here instead of
    * spreading both cases across the operators. Sessions run in UTC,
    * so the NTZ→TZ cast is the identity wall-clock mapping. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "unix_micros(CAST(ts AS TIMESTAMP)) * CAST(1000 AS BIGINT)"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** Cross-engine-exact aggregate helpers.
  *
  * A plain `sum(double)` accumulates in a partition-dependent order, so
  * Spark and the DuckDB oracle disagree in the last ulps and the
  * driver's value-hash comparison fails. Casting each row to
  * DECIMAL(18,4) first makes the sum exact and order-independent in
  * BOTH engines; the final cast back to double is then deterministic.
  * SQL mirror: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
  */
object Exact {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.DecimalType

  val D: DecimalType = DecimalType(18, 4)

  /** Order-independent exact sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-independent exact mean (exact sum / count). */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(lit(1))

  /** SQL-side mirrors for oracle strings. */
  def sqlSum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlAvg(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"

  /** Product expressions must cast INPUTS to decimal, not the product:
    * the test data's money columns are exact 2dp decimals, so the
    * input cast is unambiguous, while casting a computed double at a
    * 1e-4 rounding boundary diverges between engines. These SQL
    * fragments parse identically in Spark SQL and DuckDB, so both
    * sides share one string. Rates (discount/tax) are < 10 → (3,2).
    */
  def discPrice(p: String, disc: String): String =
    s"CAST($p AS DECIMAL(12,2)) * (1 - CAST($disc AS DECIMAL(3,2)))"
  def discPriceTaxed(p: String, disc: String, tax: String): String =
    s"${discPrice(p, disc)} * (1 + CAST($tax AS DECIMAL(3,2)))"
  def prodSum(e: String): String = s"CAST(SUM($e) AS DOUBLE)"
}
