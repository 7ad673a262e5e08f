package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.operators.Relational

/** Physical-plan assertions (SURVEY.md §6): the plans must be the ones
  * that survive a 100× scale-up — dims broadcast, filters pushed to
  * the parquet scan, projections pruned, top-K as TakeOrdered, no
  * stray cartesian products. */
class PlanSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def planOf(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("q6: filters and projection reach the parquet scan") {
    val plan = planOf(Relational.q6FilterAgg(spark, sfDir))
    // the printer elides long PushedFilters lists; assert the scan got
    // a non-empty pushdown including the shipdate bound
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan.take(800))
    // only the 4 needed columns are read, not all 11
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp"),
      plan.take(1200))
  }

  test("q5: star join broadcasts every dim, shuffles only facts") {
    val plan = planOf(Relational.q5LocalSupplier(spark, sfDir))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    val shuffles = "ShuffledHashJoin|SortMergeJoin".r.findAllIn(plan).size
    // region, nation, supplier broadcast (customer may AQE-broadcast
    // at this SF too); fact-fact joins at most 2 shuffle joins
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts")
    assert(shuffles <= 2, s"expected <=2 shuffle joins, got $shuffles")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q3: top-K is TakeOrderedAndProject, never a full sort") {
    val plan = planOf(Relational.q3ShippingPriority(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }

  test("q1: aggregation is two-phase (partial map-side combine)") {
    val plan = planOf(Relational.q1PricingSummary(spark, sfDir))
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs")
    assert(plan.contains("partial_sum"), "map-side combine expected")
    assert(plan.contains("*("), "agg should be inside WholeStageCodegen (the *(n) marker)")
  }

  test("anti/semi joins plan as join types, not subquery loops") {
    val anti = planOf(Relational.qAntiCustomers(spark, sfDir))
    assert(anti.contains("LeftAnti"), anti.take(600))
    val semi = planOf(Relational.q18LargeVolume(spark, sfDir))
    assert(!semi.contains("CartesianProduct"))
  }

  test("as-of join is a single user_id shuffle, no range cross join") {
    val plan = planOf(Relational.qAsofJoin(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "as-of must not fall back to a cross join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges")
  }

  test("q7/q9: role-playing dims and pattern-filtered parts broadcast") {
    val q7 = planOf(Relational.q7VolumeShipping(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(q7).size >= 3,
      "supplier + both nation roles must broadcast")
    assert(!q7.contains("CartesianProduct"))
    val q9 = planOf(Relational.q9ProductProfit(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(q9).size >= 3,
      "part/supplier/nation must broadcast")
    // the LIKE filter prunes the part scan before the join
    assert(q9.contains("bolt"), "part name pattern should appear as a scan-side filter")
  }

  test("q19: disjunctive predicate keeps the equi-join + broadcast part") {
    val plan = planOf(Relational.q19Disjunctive(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the OR blocks must not defeat equi-join extraction")
  }

  test("q13/q15: stacked aggregations stay hash-based, max filter broadcasts") {
    val q13 = planOf(Relational.q13CustDistribution(spark, sfDir))
    assert("HashAggregate".r.findAllIn(q13).size >= 3,
      "two groupBys should be partial+final hash aggregates")
    val q15 = planOf(Relational.q15TopSupplier(spark, sfDir))
    assert(q15.contains("BroadcastHashJoin") || q15.contains("BroadcastNestedLoopJoin"),
      "the scalar max should join via broadcast, never a shuffle")
  }

  test("q_explode_words: generator then re-aggregation with partial combine") {
    val plan = planOf(Relational.qExplodeWords(spark, sfDir))
    assert(plan.contains("Generate explode"), plan.take(600))
    assert(plan.contains("partial_count"), "word counts must map-side combine")
    assert(plan.contains("TakeOrderedAndProject"), "top-20 must not full-sort")
  }

  test("q21: one fact pass — per-order window counts, no semi/anti self-joins") {
    val plan = planOf(Relational.q21BlameSupplier(spark, sfDir))
    // r15 shape: the EXISTS/NOT-EXISTS pair is answered by two
    // distinct-supplier window counts over the join's own l_orderkey
    // partitioning — lineitem⋈orders is evaluated ONCE (no semi/anti
    // probes, no exchange-reuse of a tripled subtree), and the windows
    // introduce no exchange of their own.
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("LeftSemi") && !plan.contains("LeftAnti"),
      s"q21 must not self-join the fact side:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"))
    // exactly one l_orderkey exchange feeds join + both windows
    // (count in the FINAL plan only — AQE's explain echoes the
    // initial plan after it)
    val finalPlan = plan.split("== Initial Plan ==").head
    val orderkeyExchanges = "Exchange hashpartitioning\\(l_orderkey".r
      .findAllIn(finalPlan).size
    assert(orderkeyExchanges <= 1,
      s"the windows must reuse the join partitioning, plan:\n${finalPlan.take(1500)}")
  }

  test("q11: global-total scalar is broadcast, never a cross join") {
    val plan = planOf(Relational.q11ValueConcentration(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(1000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("decontaminate: gram join is an equi-join with the eval side broadcast") {
    val plan = planOf(graft.pipeline.TextPipeline.decontaminate(spark, sfDir))
    // tiny distinct eval-gram set → AQE or static planning broadcasts it
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_range_join: equi key carries the join, range is a residual, no cross join") {
    val plan = planOf(Relational.qRangeJoin(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "range predicate must ride the user equi-join as a residual")
  }

  test("q_window_dist / q_regression: one shuffle each, windows sort once") {
    val wd = planOf(Relational.qWindowDist(spark, sfDir))
    assert("Window".r.findAllIn(wd).size >= 1, wd.take(600))
    // both window frames share one partition ordering → a single
    // exchange on the partition key (plus the output range sort);
    // count the FINAL plan only — the AQE dump repeats the initial one
    val finalPlan = wd.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges\n$wd")
    assert("Window".r.findAllIn(finalPlan).size == 1,
      "all five window functions must fold into ONE Window operator")
    val rg = planOf(Relational.qRegression(spark, sfDir))
    assert(rg.contains("partial_"), "moment sums must map-side combine")
  }

  test("pipeline batch: pii/boilerplate/shard/incremental plans scale") {
    import graft.pipeline.TextPipeline
    // pii: map-only scan + tiny agg, no join at all
    val pii = planOf(TextPipeline.piiScrub(spark, sfDir))
    assert(!pii.contains("Join"), "pii scrub must be a pure map pass")
    // incremental dedup: hash anti join on digests, never nested loop
    val inc = planOf(TextPipeline.dedupIncremental(spark, sfDir))
    assert(inc.contains("LeftAnti"), inc.take(800))
    assert(!inc.contains("BroadcastNestedLoopJoin") && !inc.contains("CartesianProduct"))
    // boilerplate: explode then two-level agg with partial combine
    val bp = planOf(TextPipeline.boilerplate(spark, sfDir))
    assert(bp.contains("Generate explode"), bp.take(800))
    assert(bp.contains("partial_"), "gram counting must map-side combine")
  }

  test("latest-per-key / dense-grid: one window shuffle; tiny dims broadcast") {
    val lk = planOf(Relational.qLatestPerKey(spark, sfDir))
    val finalPlan = lk.split("== Initial Plan ==").head
    // exactly one Window operator; WindowGroupLimit operators are the
    // rank<=1 pushdown — a bonus, not a second window sort
    assert("Window \\[".r.findAllIn(finalPlan).size == 1, finalPlan.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size <= 1,
      s"latest-per-key is one shuffle\n$finalPlan")
    val dg = planOf(Relational.qDenseGrid(spark, sfDir))
    // the cross join multiplies two distinct-value sets of a handful
    // of rows each — it must plan as a broadcast nested loop over
    // broadcast sides, never shuffle the fact table into it
    assert(dg.contains("BroadcastNestedLoopJoin") || dg.contains("CartesianProduct"),
      dg.take(600))
    assert(dg.contains("BroadcastHashJoin") || dg.contains("BroadcastNestedLoopJoin"),
      "fact attach must broadcast the tiny grid")
  }

  test("semantic dedup: both argmax passes broadcast; no corpus cross join") {
    import graft.pipeline.Vectors
    val plan = planOf(Vectors.dedupSemantic(spark, sfDir))
    // centroid sides are k×dim — every corpus-side join against them
    // must be a broadcast nested loop (cross join with broadcast
    // side), never a shuffled cartesian of the corpus
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnl >= 2, s"seed + refined-centroid argmaxes must broadcast\n${plan.take(800)}")
    // the pair join blocks on the learned cluster id (equi join)
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), plan.take(800))
  }

  test("L48/L49: ingest probe is equi-join only; scalar max broadcasts, no cartesian") {
    import graft.pipeline.TextPipeline
    // L48: both probe joins (incoming vs corpus bands, incoming vs
    // smaller incoming) are hash equi-joins on (band, bucket) — the
    // shape that stays a bucketed lookup at 100 TB
    val p48 = planOf(TextPipeline.dedupIngestNeardup(spark, sfDir))
    assert(!p48.contains("CartesianProduct"), p48.take(800))
    assert(!p48.contains("BroadcastNestedLoopJoin"), p48.take(800))
    // L49: the corpus-max scalar rides a 1-row broadcast (nested-loop
    // on one row, NOT a cartesian over the corpus); the keep filter is
    // map-side
    val p49 = planOf(TextPipeline.sampleQualityWeighted(spark, sfDir))
    assert(!p49.contains("CartesianProduct"), p49.take(800))
    assert(p49.contains("BroadcastNestedLoopJoin"), p49.take(800))
  }

  test("catalog table scans keep pushdown through GraftTable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.plans")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.mode("append").saveAsTable("graft.plans.orders")
    val df = spark.sql(
      "SELECT o_orderkey FROM graft.plans.orders WHERE o_totalprice > 100000.0")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,100000.0)]"),
      plan.take(1000))
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      plan.take(1000))
  }

  test("q_lateral_profile: LATERAL decorrelates to an aggregate join, no loops") {
    val plan = planOf(Relational.qLateralProfile(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // the correlated aggregate becomes a plain two-phase HashAggregate
    // feeding an equi-join on the correlation key
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(800))
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey)") ||
           plan.contains("PushedFilters: [IsNotNull(o_orderstatus)") ||
           plan.contains("EqualTo(o_orderstatus,O)"), "status filter reaches the scan: " + plan.take(1200))
  }

  test("dedup_paragraph: one gram-key shuffle, dup set rejoined as semi, never doc x doc") {
    val plan = planOf(graft.pipeline.TextPipeline.paragraphDedup(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("LeftSemi"), "dup-hash filter must be a semi join: " + plan.take(800))
    // paragraph explode is a generator inside codegen, not a UDF
    assert(plan.contains("Generate posexplode"), plan.take(800))
  }

  test("length_buckets / mix_sources: map-only classify + tiny two-phase agg") {
    val lb = planOf(graft.pipeline.TextPipeline.lengthBuckets(spark, sfDir))
    assert("HashAggregate".r.findAllIn(lb).size >= 2, "partial+final agg: " + lb.take(600))
    assert(!lb.contains("Join"), "L33 must be join-free: " + lb.take(600))
    val mx = planOf(graft.pipeline.TextPipeline.mixSources(spark, sfDir))
    assert(mx.contains("BroadcastNestedLoopJoin") || mx.contains("BroadcastHashJoin"),
      "single-row totals must broadcast: " + mx.take(600))
    assert(!mx.contains("CartesianProduct"), mx.take(600))
  }

  test("split_leakage: shingle equi-join carries the pair search") {
    val plan = planOf(graft.pipeline.TextPipeline.splitLeakage(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
           plan.contains("BroadcastHashJoin"), "equi-join expected: " + plan.take(800))
  }

  test("round-7b relational batch: map/variant/ignore-nulls/try/spine/struct shapes") {
    // R76 maps: two-phase aggs, no extra exchange for the map ops
    val mapPlan = planOf(Relational.qMapFuncs(spark, sfDir))
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(mapPlan).size >= 2, mapPlan.take(800))
    assert(!mapPlan.contains("CartesianProduct"))
    // R77 variant: pure map over the scan — no join, no extra shuffle
    val vPlan = planOf(Relational.qVariant(spark, sfDir))
    assert(!vPlan.contains("Join"), vPlan.take(800))
    assert(vPlan.contains("PushedFilters: [IsNotNull(o_orderkey)"), vPlan.take(800))
    // R78 ignore-nulls windows: ONE window exchange (both frames share
    // the same partitioning+ordering)
    val wPlan = planOf(Relational.qWindowIgnoreNulls(spark, sfDir))
    assert("Window".r.findAllIn(wPlan).size >= 1)
    assert("hashpartitioning".r.findAllIn(wPlan).size <= 2, // window + final sort
      "windows over one key must not re-shuffle: " + wPlan.take(1000))
    // R80 spine join: the generated calendar never shuffles the fact
    // side twice, and the join is broadcast (24-row spine)
    val sPlan = planOf(Relational.qSeqSpine(spark, sfDir))
    assert(sPlan.contains("BroadcastHashJoin") || sPlan.contains("BroadcastNestedLoopJoin"),
      sPlan.take(1000))
    assert(!sPlan.contains("CartesianProduct"))
    // R81 struct ops: map-only — no exchange before the output sort
    val stPlan = planOf(Relational.qStructFuncs(spark, sfDir))
    assert(!stPlan.contains("Join"))
  }

  test("round-7b pipeline batch: winnow join keyed on fingerprint; hardneg broadcasts") {
    val wPlan = planOf(graft.pipeline.TextPipeline.winnowDedup(spark, sfDir))
    assert(!wPlan.contains("CartesianProduct"), wPlan.take(800))
    assert(wPlan.contains("SortMergeJoin") || wPlan.contains("ShuffledHashJoin") ||
           wPlan.contains("BroadcastHashJoin"), "fingerprint equi-join expected")
    val hPlan = planOf(graft.pipeline.Vectors.mineHardneg(spark, sfDir))
    assert(hPlan.contains("BroadcastNestedLoopJoin") || hPlan.contains("BroadcastHashJoin"),
      "query side must broadcast: " + hPlan.take(800))
    val rPlan = planOf(graft.pipeline.Vectors.embedRandproj(spark, sfDir))
    assert(!rPlan.contains("Exchange") || rPlan.contains("rangepartitioning"),
      "randproj is map-only up to the output sort: " + rPlan.take(800))
  }

  test("round-7c batch: bitmap partial aggs, funnel single shuffle, outlier broadcasts") {
    // R85 bitmap distinct: two-level agg, the inner one map-side
    // partial — the shuffle carries (group, bucket, bitmap) rows
    val bPlan = planOf(Relational.qBitmapDistinct(spark, sfDir))
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(bPlan).size >= 3, bPlan.take(1000))
    assert(!bPlan.contains("expand"), "bitmap path must not use the count-distinct Expand")
    // R88 funnel: all three cascaded windows share ONE user_id
    // partitioning — a single exchange feeds them
    val fPlan = planOf(Relational.qFunnel(spark, sfDir))
    val userParts = "hashpartitioning\\(user_id".r.findAllIn(fPlan).size
    assert(userParts >= 1 && !fPlan.contains("CartesianProduct"), fPlan.take(1000))
    // AQE prints final+initial plans, so each physical exchange
    // appears twice in the string — <=2 means ONE real exchange
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(fPlan).size <= 2,
      "cascaded funnel windows must reuse one user_id exchange: " + fPlan.take(1200))
    // L39 outliers: centroids and moments broadcast; the corpus is
    // never on the build side of a shuffle join
    val oPlan = planOf(graft.pipeline.Vectors.embedOutliers(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(oPlan).size >= 2,
      "centroid + moment joins must broadcast: " + oPlan.take(1000))
    // R87 interpolation: spine joins fact buckets without a cartesian
    val iPlan = planOf(Relational.qInterpolate(spark, sfDir))
    assert(!iPlan.contains("CartesianProduct"), iPlan.take(800))
    // L41 bpe pairs: explode feeds a two-phase count (map-side combine)
    val pPlan = planOf(graft.pipeline.TextPipeline.bpePairs(spark, sfDir))
    assert(pPlan.contains("partial_count"), "map-side combine expected: " + pPlan.take(800))
  }

  test("R92 approx_percentile stays within the sketch's rank-error bound of the exact quantiles") {
    import org.apache.spark.sql.functions._
    // accuracy 1000 ⇒ rank error ≤ n/1000 per the GK-sketch contract;
    // translate rank tolerance to a VALUE window via the sorted data
    val prices = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_totalprice").cast("double")).as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect().sorted
    val n = prices.length
    assert(n > 100, s"need data, got $n rows")
    val approx = Relational.qApproxQuantile(spark, sfDir)
      .filter(col("status") === "F").collect().head
    for ((p, idx) <- Seq(0.25 -> 2, 0.5 -> 3, 0.75 -> 4)) {
      val got = approx.getDouble(idx)
      val lo = prices(math.max(0, (p * n).toInt - n / 1000 - 1))
      val hi = prices(math.min(n - 1, (p * n).toInt + n / 1000 + 1))
      assert(got >= lo && got <= hi,
        s"p=$p estimate $got outside rank-error window [$lo, $hi] (n=$n)")
    }
  }

  test("SQL UPDATE plans WriteDelta under merge-on-read, ReplaceData under copy-on-write") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.plan")
    spark.sql("CREATE TABLE graft.plan.cow (id BIGINT, v STRING)")
    spark.sql("""CREATE TABLE graft.plan.mor (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.update.mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.plan.cow VALUES (1,'a')")
    spark.sql("INSERT INTO graft.plan.mor VALUES (1,'a')")
    def explain(t: String): String =
      spark.sql(s"EXPLAIN EXTENDED UPDATE graft.plan.$t SET v = 'z' WHERE id = 1")
        .collect().head.getString(0)
    val cow = explain("cow")
    assert(cow.contains("ReplaceData") && !cow.contains("WriteDelta"),
      cow.take(600))
    val mor = explain("mor")
    assert(mor.contains("WriteDelta") && !mor.contains("ReplaceData"),
      mor.take(600))
    // the delta plan's row identity is the positional coordinate pair
    assert(mor.contains("_file") && mor.contains("_pos"), mor.take(1200))
  }

  test("gram df-ceiling: the cap is an aggregate + anti join, hot set broadcast") {
    val plan = planOf(graft.pipeline.TextPipeline.ngramJaccard(spark, sfDir))
    // hot-gram detection is a two-phase count (map-side combine)…
    assert(plan.contains("partial_count"), plan.take(800))
    // …and the cap applies as an anti join against the (tiny) hot set —
    // broadcast, so the ceiling itself adds no extra shuffle on the
    // shingle frame
    assert(plan.contains("LeftAnti"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"))
  }

  test("R89 inverse distribution: the shuffle payload is the value histogram, not raw rows") {
    val plan = planOf(Relational.qInverseDist(spark, sfDir))
    // frequency-table agg is two-phase: partial on (flag, qty) map-side
    assert(plan.contains("partial_count"), "map-side combine expected: " + plan.take(800))
    assert(!plan.contains("CartesianProduct"))
    // the median frame joins back via broadcast, not a shuffle join
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }
}
