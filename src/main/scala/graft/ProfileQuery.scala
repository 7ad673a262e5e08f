package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only profiler: run ONE declared query and print a per-Spark-job
  * wall-time table (job id, duration, description/callsite) so fixed
  * per-job overheads are visible without the UI. Not part of the
  * driver contract — the driver only runs Verify/Bench.
  * Usage: ProfileQuery <queryName> [sfDir] [repeats]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions",
        sys.env.getOrElse("GRAFT_RETAINED", "1000"))
      .config("spark.ui.retainedJobs", sys.env.getOrElse("GRAFT_RETAINED", "1000"))
      .config("spark.ui.retainedStages", sys.env.getOrElse("GRAFT_RETAINED", "1000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, je.time - t0, desc)); ()
        }
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to repeats).foreach { i =>
      if (name == "dedup_cdc") graft.pipeline.TextPipeline.clearCdcWalkMemo(sfDir)
      done.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      import scala.jdk.CollectionConverters._
      val all = done.asScala.toSeq.sortBy(_._1)
      println(f"== run $i: $name%s rows=$n%d wall=$dt%.3f s jobs=${all.size}%d jobtime=${all.map(_._2).sum / 1000.0}%.3f s")
      all.foreach { case (id, ms, desc) =>
        println(f"  job $id%4d ${ms / 1000.0}%8.3f s  ${desc.take(110)}%s")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
