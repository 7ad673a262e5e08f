package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` for named queries to files
  * (the plans/r15/ evidence the optimization rounds commit). Usage:
  *   PlanDump <outDir> <query1,query2,...> [sfDir]
  * Session config matches Bench so the captured plans are the plans
  * the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",").toSeq
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n.txt"), plan)
      println(s"[plandump] wrote $outDir/$n.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
