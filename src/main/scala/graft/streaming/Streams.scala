package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming jobs (SURVEY.md §2 R26-R27): the streaming
  * face of the engine. Batch and stream share the event schema, so
  * the same pipeline logic serves both (Spark's unified model).
  *
  * Scale notes: windowed counts are a streaming shuffle on
  * (window, event_type) with watermark-bounded state;
  * flatMapGroupsWithState keys state by user_id — at 100 TB/day both
  * partition across the cluster and state size is bounded by the
  * watermark / idle timeout, not the stream length.
  */
object Streams {

  /** Typed event row for streaming inputs (events.parquet shape, with
    * ts already converted from nanos). */
  final case class Event(event_id: Long, user_id: Long, event_type: String,
      value: Double, ts: Timestamp)

  final case class SessionOut(user_id: Long, n_events: Long, start: Timestamp,
      end: Timestamp, duration_sec: Long)

  /** Open-session state for [[sessionize]]. */
  final case class SessState(start: Long, end: Long, n: Long)

  /** R26 — tumbling-window event counts with a 10-minute watermark:
    * late events beyond the watermark are dropped, windows finalize
    * incrementally. Works on any streaming DataFrame with
    * (ts, event_type); pair with `readStream` in production and
    * MemoryStream in tests. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** R96 — observable metrics: named aggregate metrics attached to
    * the stream itself; every micro-batch's values surface in that
    * batch's `StreamingQueryProgress.observedMetrics` (the same
    * `observe` on a batch frame pairs with
    * `org.apache.spark.sql.Observation`). The metrics ride the
    * existing pass as accumulators — ZERO extra jobs or scans — which
    * is what makes data-quality circuit breakers affordable at 100 TB:
    * a row-count / null-rate / value-sum check costs nothing beyond
    * the pipeline it guards, and a monitor can stop the query when a
    * batch's metrics breach a bound. */
  def observedEvents(events: DataFrame): DataFrame =
    events.observe("event_metrics",
      count(lit(1)).as("n_rows"),
      sum(col("value")).as("total_value"),
      count(when(col("event_type").isNull, 1)).as("null_types"))

  /** Streaming sink into a graft catalog table: each micro-batch
    * commits as one append snapshot through the CAS metadata protocol,
    * so a stream lands in the same table that batch queries, time
    * travel and file skipping see. EXACTLY-ONCE: the micro-batch id is
    * recorded (keyed by the checkpoint, so independent streams don't
    * collide) in the same metadata commit as the snapshot
    * ([[graft.catalog.TableOps.commitStreamBatch]]); a replayed batch
    * after a failure is recognized and skipped, never double-applied.
    */
  def writeToCatalogTable(
      df: DataFrame,
      ops: graft.catalog.TableOps,
      tableDir: org.apache.hadoop.fs.Path,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val sinkKey =
      s"graft.stream.${Integer.toHexString(checkpoint.hashCode)}.last-batch"
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ops.commitStreamBatch(tableDir, batch, sinkKey, batchId)
      }
      .start()
  }

  /** R93 — stream-static enrichment with per-batch dim refresh: each
    * micro-batch joins against the CURRENT state of a graft catalog
    * dim table (re-resolved through the metadata pointer inside
    * foreachBatch, so upserts/MOR deletes to the dim between batches
    * are visible to the next batch — the slowly-changing-dimension
    * pattern a plan-pinned static join cannot express), then commits
    * exactly-once through the same batch-id-keyed snapshot protocol
    * as [[writeToCatalogTable]].
    *
    * Scale: the dim read is a fresh snapshot resolution (metadata
    * only) + broadcast per batch; the stream side never shuffles for
    * the join. */
  def enrichAgainstTable(
      events: DataFrame,
      ops: graft.catalog.TableOps,
      dimDir: org.apache.hadoop.fs.Path,
      joinCols: Seq[String],
      sinkDir: org.apache.hadoop.fs.Path,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val sinkKey =
      s"graft.stream.${Integer.toHexString(checkpoint.hashCode)}.last-batch"
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dim = ops.read(batch.sparkSession, dimDir)
        val enriched = batch.join(broadcast(dim), joinCols, "left")
        ops.commitStreamBatch(sinkDir, enriched, sinkKey, batchId)
      }
      .start()
  }

  /** Streaming exact deduplication — the streaming face of the dedup
    * family (§2.3 L1): drop events already seen, with state bounded by
    * the watermark (an event older than the watermark can no longer
    * have an unseen duplicate in-flight, so its key is evictable).
    * At 100 TB/day the state is keyed and partitioned by the id. */
  def dedupStream(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("event_id", "ts")

  /** R82 — `dropDuplicatesWithinWatermark`: dedup on the business key
    * ALONE. At-least-once sources re-deliver records whose retries
    * carry DIFFERENT event timestamps; R33's dropDuplicates cannot
    * drop those (its dedup key must include the timestamp for state to
    * ever expire). Here the first arrival wins, a later duplicate of
    * the key is dropped as long as it lands within the watermark
    * delay, and the key's state expires once the watermark passes its
    * first-seen time — state stays bounded by key-arrival rate ×
    * delay, keyed and shuffle-partitioned on the id at any scale. */
  def dedupRetries(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Incremental reads of catalog-table appends: a parquet file-stream
    * source over the table's write directories — each new data file is
    * one unit of discovery, so downstream processing is incremental
    * without re-reading history. Caveat (documented trade-off of the
    * file-source path): files become visible when written, marginally
    * before their snapshot commit. For strictly committed-only deltas
    * use `spark.readStream.table("graft.ns.t")` — the catalog table is
    * a DSv2 micro-batch source over snapshot sequence numbers
    * (GraftTable.GraftMicroBatchStream), which this helper predates. */
  def readCatalogAppends(
      spark: SparkSession,
      ops: graft.catalog.TableOps,
      tableDir: org.apache.hadoop.fs.Path): DataFrame = {
    val (_, meta) = ops.load(tableDir).getOrElse(
      throw new IllegalArgumentException(s"table does not exist at $tableDir"))
    val schema = graft.catalog.SchemaBridge.toSpark(meta.currentSchema)
    spark.readStream.schema(schema).parquet(s"${ops.dataDir(tableDir)}/*")
  }

  /** R58 — stream-stream interval join (the attribution shape): each
    * right-stream event joins left-stream events of the same user
    * that happened in the preceding `windowSec`. Watermarks on BOTH
    * sides bound the join state — Spark evicts left rows once no
    * future right row can reach back to them, so state size tracks
    * the interval, not the stream length. At 100 TB/day the join
    * shuffles both streams on user_id and state stays
    * watermark-bounded per partition. */
  def intervalJoin(
      left: DataFrame,   // (user_id, ts, ...) — the earlier event (impression)
      right: DataFrame,  // (user_id, ts, ...) — the later event (click)
      windowSec: Long = 3600L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).alias("l")
    val r = right.withWatermark("ts", watermarkDelay).alias("r")
    l.join(r,
      expr(s"""l.user_id = r.user_id AND
               r.ts BETWEEN l.ts AND l.ts + INTERVAL $windowSec SECONDS"""))
      .select(col("l.user_id").as("user_id"),
        col("l.ts").as("left_ts"), col("r.ts").as("right_ts"),
        (unix_timestamp(col("r.ts")) - unix_timestamp(col("l.ts"))).as("lag_sec"))
  }

  /** R27 — stateful gap-based sessionization with
    * flatMapGroupsWithState: per-user state holds the open session;
    * emits one row per CLOSED session (30-minute gap). With
    * `idleTimeoutSec` set, a processing-time timeout also flushes
    * sessions whose user went silent (bounds state for users that
    * never return — the production setting at 100 TB/day). */
  def sessionize(
      events: Dataset[Event],
      gapSec: Long = 1800L,
      idleTimeoutSec: Option[Long] = None): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def flush(userId: Long, st: SessState): SessionOut =
      SessionOut(userId, st.n, new Timestamp(st.start), new Timestamp(st.end),
        (st.end - st.start) / 1000L)

    val timeoutConf =
      if (idleTimeoutSec.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), timeoutConf) {
        case (userId, rows, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = Seq.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.end <= gapSec * 1000L =>
                  cur = Some(st.copy(end = math.max(st.end, t), n = st.n + 1))
                case Some(st) =>
                  closed :+= flush(userId, st)
                  cur = Some(SessState(t, t, 1))
                case None =>
                  cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach(state.update)
            idleTimeoutSec.foreach(t => state.setTimeoutDuration(s"$t seconds"))
            closed.iterator
          }
      }
  }

  /** Per-key running totals for [[runningTotals]]. */
  final case class RunState(n: Long, total: Double)
  final case class RunOut(user_id: Long, n_events: Long, total_value: Double)

  /** R75 — arbitrary stateful processing via `transformWithState`
    * (the Structured Streaming state API v2): per-user running
    * event count + value total held in a typed `ValueState`, one
    * updated row emitted per key per micro-batch. The v2 API is the
    * production successor to R27's `flatMapGroupsWithState`: typed
    * state handles (value/list/map) with per-state TTL, timers, and
    * schema-evolvable state — all backed by the RocksDB state store,
    * which is what bounds memory at 100 TB/day (state lives off-heap
    * and spills; keys partition across the cluster).
    *
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (transformWithState's only supported
    * store). */
  def runningTotals(events: org.apache.spark.sql.Dataset[Event])
      : org.apache.spark.sql.Dataset[RunOut] = {
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val stEnc: Encoder[RunState] = Encoders.product[RunState]
    implicit val outEnc: Encoder[RunOut] = Encoders.product[RunOut]
    val processor = new StatefulProcessor[Long, Event, RunOut] {
      @transient private var st: ValueState[RunState] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[RunState]("running", stEnc, TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[Event],
          timers: TimerValues): Iterator[RunOut] = {
        val prev = Option(st.get()).getOrElse(RunState(0L, 0.0))
        var n = prev.n
        var tot = prev.total
        rows.foreach { e => n += 1; tot += e.value }
        st.update(RunState(n, tot))
        Iterator.single(RunOut(key, n, tot))
      }
    }
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(processor, TimeMode.None(), OutputMode.Update())
  }
}
