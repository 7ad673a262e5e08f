package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.Event

/** R26/R27 — Structured Streaming over MemoryStream: windowed counts
  * with watermark, and stateful session closure. */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")

  test("R26: windowed counts with watermark finalize per 5-min window") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = Streams.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, 1, "click", 1.0, ts(0, 10)),
        Event(2, 1, "click", 2.0, ts(1, 20)),
        Event(3, 2, "view", 5.0, ts(6, 0)))
      q.processAllAvailable()
      // advance the watermark far enough to close the first windows
      input.addData(Event(4, 3, "click", 1.0, ts(30, 0)))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, event_type, n_events, total_value FROM win_counts")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains((ts(0), "click", 2L, 3.0)))
      assert(rows.contains((ts(5), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("R27: flatMapGroupsWithState closes sessions on gap") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = Streams.sessionize(input.toDS(), gapSec = 60)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 10s apart (one session), then a 5-min jump
      // (closes it and opens another)
      input.addData(
        Event(1, 1, "click", 0, ts(0, 0)),
        Event(2, 1, "click", 0, ts(0, 10)))
      q.processAllAvailable()
      input.addData(Event(3, 1, "click", 0, ts(5, 0)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, duration_sec FROM sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.contains((1L, 2L, 10L))) // the closed first session
    } finally q.stop()
  }

  test("streaming dedup drops duplicates across micro-batches") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = Streams.dedupStream(input.toDF())
      .select("event_id", "value")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, 1, "click", 1.0, ts(0)),
        Event(1, 1, "click", 1.0, ts(0)), // dup within batch
        Event(2, 1, "click", 2.0, ts(1)))
      q.processAllAvailable()
      input.addData(Event(2, 1, "click", 2.0, ts(1))) // dup across batches
      input.addData(Event(3, 2, "view", 3.0, ts(2)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("R82: dropDuplicatesWithinWatermark drops retries with shifted timestamps") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = Streams.dedupRetries(input.toDF())
      .select("event_id", "value")
      .writeStream.format("memory").queryName("dedup_retry_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, 1, "click", 1.0, ts(0)),
        Event(2, 1, "click", 2.0, ts(1)))
      q.processAllAvailable()
      // the retry arrives later WITH A DIFFERENT TIMESTAMP — the case
      // plain dropDuplicates("event_id", "ts") would emit twice
      input.addData(Event(1, 1, "click", 1.0, ts(2)))
      input.addData(Event(3, 2, "view", 3.0, ts(3)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_retry_out")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("R27: batch and streaming sessionization agree on closed sessions") {
    import spark.implicits._
    // run the stateful function in batch mode over real event data —
    // same code path Spark uses for batch flatMapGroupsWithState
    val events = Tables.events(spark, sfDir)
      .filter($"user_id" < 5)
      .selectExpr("event_id", "user_id", "event_type", "value",
        "CAST(ts div 1000000000 AS TIMESTAMP) AS ts")
      .as[Event]
    val sessions = Streams.sessionize(events).collect()
    // oracle: the batch window-based sessionizer (R21) over the same slice
    val expected = graft.operators.Relational.qSessionize(spark, sfDir)
      .filter($"user_id" < 5).count()
    // streaming emits only CLOSED sessions; per user the final open
    // session is still pending, so counts differ by exactly one per user
    val users = events.select("user_id").distinct().count()
    assert(sessions.length == expected - users)
    assert(sessions.forall(s => s.duration_sec >= 0 && s.n_events > 0))
  }

  test("R58: stream-stream interval join matches only in-window pairs") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val impressions = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val q = Streams.intervalJoin(
        impressions.toDF().toDF("user_id", "ts"),
        clicks.toDF().toDF("user_id", "ts"),
        windowSec = 600L)
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      impressions.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData(
        (1L, ts(5)),   // in window (300s after user 1's impression)
        (2L, ts(20)),  // out of window (1200s > 600s)
        (3L, ts(5)))   // no impression for user 3
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, lag_sec FROM attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 300L)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("R75: transformWithState keeps per-key running totals across batches") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = Streams.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("running_totals")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(1, 1, "click", 2.0, ts(0, 0)),
        Event(2, 1, "click", 3.0, ts(0, 5)),
        Event(3, 2, "view", 7.0, ts(0, 9)))
      q.processAllAvailable()
      input.addData(Event(4, 1, "buy", 5.0, ts(1, 0)))
      q.processAllAvailable()
      // memory sink in Update mode appends each update row; the
      // LATEST row per key carries the running total across batches
      val rows = spark.sql(
        """SELECT user_id, n_events, total_value FROM running_totals
           WHERE (user_id, n_events) IN (
             SELECT user_id, max(n_events) FROM running_totals GROUP BY user_id)""")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, 3L, 10.0), (2L, 1L, 7.0)), s"got $rows")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("R93: stream-static enrichment re-reads the dim per batch, so dim upserts apply to later batches") {
    import org.apache.hadoop.fs.Path
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.str")
    spark.sql("CREATE TABLE graft.str.dim (user_id BIGINT, segment STRING)")
    spark.sql("INSERT INTO graft.str.dim VALUES (1, 'bronze'), (2, 'silver')")
    spark.sql("CREATE TABLE graft.str.enriched " +
      "(event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, ts TIMESTAMP, segment STRING)")
    val dimDir = new Path(s"$warehouse/str/dim")
    val sinkDir = new Path(s"$warehouse/str/enriched")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-enrich-ckpt-").toString

    val input = MemoryStream[Event]
    val q = Streams.enrichAgainstTable(
      input.toDF(), cat.ops, dimDir, Seq("user_id"), sinkDir, ckpt)
    try {
      input.addData(Event(1, 1, "click", 1.0, ts(0)), Event(2, 2, "view", 2.0, ts(1)))
      q.processAllAvailable()
      // dim upsert BETWEEN batches: user 1 promoted, user 3 appears
      cat.ops.upsert(spark,
        dimDir, Seq((1L, "gold"), (3L, "bronze")).toDF("user_id", "segment"),
        Seq("user_id"))
      input.addData(Event(3, 1, "click", 3.0, ts(2)), Event(4, 3, "view", 4.0, ts(3)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.sql(
      "SELECT event_id, segment FROM graft.str.enriched ORDER BY event_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // batch 1 saw the original dim; batch 2 sees the upserted one
    assert(out.toSeq == Seq(
      (1L, "bronze"), (2L, "silver"), (3L, "gold"), (4L, "bronze")), out.mkString(", "))
  }

  test("R96: observable metrics surface per micro-batch and via batch Observation") {
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    import spark.implicits._

    // batch: Observation collects the same observe() metrics
    val obs = org.apache.spark.sql.Observation("batch_metrics")
    Seq((1L, 2.0), (2L, 3.5)).toDF("id", "value")
      .observe(obs, count(lit(1)).as("n_rows"), sum(col("value")).as("total_value"))
      .collect()
    assert(obs.get("n_rows") == 2L && obs.get("total_value") == 5.5)

    // streaming: each micro-batch's metrics ride its progress event
    val input = MemoryStream[Event]
    val q = Streams.observedEvents(input.toDF())
      .writeStream.format("memory").queryName("obs_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, 1, "click", 1.0, ts(0)),
        Event(2, 1, "view", 2.0, ts(1)),
        Event(3, 2, "click", 4.0, ts(2)))
      q.processAllAvailable()
      val om = q.lastProgress.observedMetrics
      assert(om.containsKey("event_metrics"), s"got ${om.keySet()}")
      val m = om.get("event_metrics")
      assert(m.getAs[Long]("n_rows") == 3L)
      assert(m.getAs[Double]("total_value") == 7.0)
      assert(m.getAs[Long]("null_types") == 0L)
      // next batch reports ITS OWN numbers, not cumulative ones
      input.addData(Event(4, 3, "click", 10.0, ts(3)))
      q.processAllAvailable()
      val m2 = q.lastProgress.observedMetrics.get("event_metrics")
      assert(m2.getAs[Long]("n_rows") == 1L && m2.getAs[Double]("total_value") == 10.0)
    } finally q.stop()
  }
}
