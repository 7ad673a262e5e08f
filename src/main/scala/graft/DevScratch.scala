package graft
// Dev-only scratch main for r16 experiments — NOT part of the driver
// contract; deleted before round end.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._

object DevScratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run$i rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    // variant A: current q_unpivot shape
    time("A_current") {
      val wide = lineitem(spark, d)
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("qty"),
             dsum(col("l_extendedprice")).as("price"),
             dsum(col("l_discount")).as("disc"))
      wide.select(col("l_returnflag"),
          expr("stack(3, 'qty', qty, 'price', price, 'disc', disc) AS (measure, value)"))
        .orderBy("l_returnflag", "measure").count()
    }
    // variant B: agg only, no stack/sort
    time("B_agg_only") {
      lineitem(spark, d)
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("qty"),
             dsum(col("l_extendedprice")).as("price"),
             dsum(col("l_discount")).as("disc")).count()
    }
    // variant C: double sums (no decimal)
    time("C_double_sums") {
      lineitem(spark, d)
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity")).as("qty"),
             sum(col("l_extendedprice")).as("price"),
             sum(col("l_discount")).as("disc")).count()
    }
    // variant D: q1-like (filter + 2-col group + decimal sums)
    time("D_q1_shape") {
      lineitem(spark, d)
        .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("a"),
             dsum(col("l_extendedprice")).as("b"),
             dsum(col("l_discount")).as("c")).count()
    }
    // variant E: scan only
    time("E_scan_count") {
      lineitem(spark, d)
        .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
        .write.format("noop").mode("overwrite").save()
      0L
    }
    spark.stop()
  }
}
