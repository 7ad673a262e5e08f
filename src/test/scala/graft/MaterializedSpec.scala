package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** Incrementally-maintained aggregates over the CDC feed: refresh cost
  * tracks churn, results match a full recompute, watermark + snapshot
  * commit atomically. */
class MaterializedSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  private def fullAgg(): Map[Long, (Double, Long)] =
    spark.sql(
      "SELECT k, sum(CAST(v AS DOUBLE)) AS s, count(*) AS n FROM graft.mv.src GROUP BY k")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  private def mvState(dstDir: Path): Map[Long, (Double, Long)] =
    cat.ops.read(spark, dstDir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Double]("value_sum"), r.getAs[Long]("n_rows"))).toMap

  private def assertAgree(dstDir: Path): Unit = {
    val (full, mv) = (fullAgg(), mvState(dstDir))
    assert(mv.keySet == full.keySet, s"keys: mv=${mv.keySet} full=${full.keySet}")
    full.foreach { case (k, (s, n)) =>
      assert(mv(k)._2 == n, s"count for $k")
      assert(math.abs(mv(k)._1 - s) < 1e-9, s"sum for $k: ${mv(k)._1} vs $s")
    }
  }

  test("refreshSumCount tracks inserts, deletes and updates incrementally") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.src (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.src VALUES (1, 1.5), (1, 2.5), (2, 10.0)")
    val srcDir = new Path(s"$warehouse/mv/src")
    val dstDir = new Path(s"$warehouse/mv/agg")

    Materialized.refreshSumCount(spark, cat.ops, srcDir, dstDir, Seq("k"), "v")
    assertAgree(dstDir)
    val seq1 = cat.ops.load(dstDir).get._2.properties("graft.mv.last-seq").toLong

    // idempotent when the source hasn't moved
    Materialized.refreshSumCount(spark, cat.ops, srcDir, dstDir, Seq("k"), "v")
    assert(cat.ops.load(dstDir).get._2.properties("graft.mv.last-seq").toLong == seq1)

    // churn: new group, delete one row of group 1, rewrite group 2's value
    spark.sql("INSERT INTO graft.mv.src VALUES (3, 7.0), (1, 4.0)")
    spark.sql("DELETE FROM graft.mv.src WHERE k = 1 AND v = 1.5")
    spark.sql("UPDATE graft.mv.src SET v = 20.0 WHERE k = 2")
    Materialized.refreshSumCount(spark, cat.ops, srcDir, dstDir, Seq("k"), "v")
    assertAgree(dstDir)
    assert(cat.ops.load(dstDir).get._2.properties("graft.mv.last-seq").toLong > seq1)

    // a group deleted entirely disappears from the aggregate
    spark.sql("DELETE FROM graft.mv.src WHERE k = 3")
    Materialized.refreshSumCount(spark, cat.ops, srcDir, dstDir, Seq("k"), "v")
    assertAgree(dstDir)
    assert(!mvState(dstDir).contains(3L))

    // the aggregate table keeps history: pre-refresh state time-travels
    val snaps = cat.ops.load(dstDir).get._2.snapshots.sortBy(_.sequenceNumber)
    assert(snaps.size >= 3)
    assert(cat.ops.read(spark, dstDir, snapshotId = Some(snaps.head.snapshotId))
      .collect().nonEmpty)
  }

  test("continuous refresh follows the changelog stream") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.csrc (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.csrc VALUES (1, 2.0), (2, 3.0)")
    val srcDir = new Path(s"$warehouse/mv/csrc")
    val dstDir = new Path(s"$warehouse/mv/cagg")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mv-").toString

    val q = Materialized.refreshContinuously(spark, cat.ops,
      "graft.mv.`csrc$changes`", srcDir, dstDir, Seq("k"), "v", ckpt)
    try {
      q.processAllAvailable()
      def mv() = cat.ops.read(spark, dstDir).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
      assert(mv() == Map(1L -> (2.0, 1L), 2L -> (3.0, 1L)), s"got ${mv()}")

      spark.sql("INSERT INTO graft.mv.csrc VALUES (1, 5.0)")
      q.processAllAvailable()
      assert(mv() == Map(1L -> (7.0, 2L), 2L -> (3.0, 1L)), s"got ${mv()}")

      spark.sql("DELETE FROM graft.mv.csrc WHERE k = 2")
      q.processAllAvailable()
      assert(mv() == Map(1L -> (7.0, 2L)), s"got ${mv()}")
    } finally q.stop()
  }

  test("refreshJoinCount maintains a two-source join aggregate incrementally") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.ja (ka BIGINT, av DOUBLE)")
    spark.sql("CREATE TABLE graft.mv.jb (kb BIGINT, bv DOUBLE)")
    val aDir = new Path(s"$warehouse/mv/ja")
    val bDir = new Path(s"$warehouse/mv/jb")
    val dstDir = new Path(s"$warehouse/mv/jagg")
    def fullJoin(): Map[Long, Long] =
      spark.sql("""SELECT ka, COUNT(*) AS n FROM graft.mv.ja JOIN graft.mv.jb
                   ON ka = kb GROUP BY ka""")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def mv(): Map[Long, Long] =
      cat.ops.read(spark, dstDir).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def refresh() =
      Materialized.refreshJoinCount(spark, cat.ops, aDir, bDir, dstDir, "ka", "kb")

    spark.sql("INSERT INTO graft.mv.ja VALUES (1, 1.0), (1, 2.0), (2, 5.0)")
    spark.sql("INSERT INTO graft.mv.jb VALUES (1, 10.0), (2, 20.0), (2, 21.0), (3, 30.0)")
    refresh()
    assert(mv() == fullJoin(), s"after initial load: ${mv()} vs ${fullJoin()}")

    // idempotent with no source movement
    val w1 = cat.ops.load(dstDir).get._2.properties("graft.mv.last-seq-a")
    refresh()
    assert(cat.ops.load(dstDir).get._2.properties("graft.mv.last-seq-a") == w1)

    // churn on BOTH sides between refreshes: ΔA⋈B_new + A_old⋈ΔB must
    // count each new pair exactly once (incl. ΔA×ΔB cross pairs)
    spark.sql("INSERT INTO graft.mv.ja VALUES (3, 7.0), (4, 9.0)")
    spark.sql("INSERT INTO graft.mv.jb VALUES (1, 11.0), (4, 40.0)")
    refresh()
    assert(mv() == fullJoin(), s"after dual append: ${mv()} vs ${fullJoin()}")

    // deletes retract pairs; a key with no pairs left disappears
    spark.sql("DELETE FROM graft.mv.jb WHERE kb = 2")
    spark.sql("DELETE FROM graft.mv.ja WHERE ka = 1 AND av = 1.0")
    refresh()
    assert(mv() == fullJoin(), s"after deletes: ${mv()} vs ${fullJoin()}")
    assert(!mv().contains(2L), "key 2 lost all partners and must vanish")

    // one-sided churn only
    spark.sql("UPDATE graft.mv.ja SET av = 99.0 WHERE ka = 3")
    refresh()
    assert(mv() == fullJoin(), s"after one-sided update: ${mv()} vs ${fullJoin()}")
  }

  test("refreshMinMax folds inserts, repairs only extreme-touching deletes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.mm (k BIGINT, v DOUBLE)")
    val srcDir = new Path(s"$warehouse/mv/mm")
    val dstDir = new Path(s"$warehouse/mv/mmagg")
    def full(): Map[Long, (Double, Double, Long)] =
      spark.sql("SELECT k, min(v), max(v), count(*) FROM graft.mv.mm GROUP BY k")
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    def mv(): Map[Long, (Double, Double, Long)] =
      cat.ops.read(spark, dstDir).collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    def refresh() = Materialized.refreshMinMax(spark, cat.ops, srcDir, dstDir, Seq("k"), "v")

    spark.sql("INSERT INTO graft.mv.mm VALUES (1, 3.0), (1, 7.0), (2, 10.0)")
    refresh()
    assert(mv() == full(), s"initial: ${mv()} vs ${full()}")

    // pure inserts tighten without repair (new max on 1, new group 3)
    spark.sql("INSERT INTO graft.mv.mm VALUES (1, 9.0), (3, 5.0)")
    refresh()
    assert(mv() == full(), s"insert fold: ${mv()} vs ${full()}")

    // interior delete: min/max unchanged, count down
    spark.sql("INSERT INTO graft.mv.mm VALUES (1, 5.0)")
    refresh()
    spark.sql("DELETE FROM graft.mv.mm WHERE k = 1 AND v = 5.0")
    refresh()
    assert(mv() == full(), s"interior delete: ${mv()} vs ${full()}")

    // extreme delete: stored max 9 removed → repair finds 7
    spark.sql("DELETE FROM graft.mv.mm WHERE k = 1 AND v = 9.0")
    refresh()
    assert(mv() == full(), s"extreme delete: ${mv()} vs ${full()}")
    assert(mv()(1L) == ((3.0, 7.0, 2L)))

    // group born AND shrunk within one refresh window
    spark.sql("INSERT INTO graft.mv.mm VALUES (4, 1.0), (4, 2.0)")
    spark.sql("DELETE FROM graft.mv.mm WHERE k = 4 AND v = 2.0")
    refresh()
    assert(mv() == full(), s"same-window churn: ${mv()} vs ${full()}")
    assert(mv()(4L) == ((1.0, 1.0, 1L)))

    // full-group delete disappears
    spark.sql("DELETE FROM graft.mv.mm WHERE k = 2")
    refresh()
    assert(mv() == full(), s"group drop: ${mv()} vs ${full()}")
    assert(!mv().contains(2L))
  }

  test("refreshApproxDistinct: incremental HLL union equals full rebuild exactly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.hll (k BIGINT, v STRING)")
    val srcDir = new Path(s"$warehouse/mv/hll")
    val dstDir = new Path(s"$warehouse/mv/hllagg")
    // the cross-check: the MV's estimate must EQUAL the estimate of a
    // from-scratch sketch over the current table (HLL union is
    // register-wise max ⇒ incremental == rebuild, not just ≈), and
    // stay within 5% of the exact distinct count
    def rebuilt(): Map[Long, Long] =
      spark.sql("SELECT k, hll_sketch_estimate(hll_sketch_agg(v)) FROM graft.mv.hll GROUP BY k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def exact(): Map[Long, Long] =
      spark.sql("SELECT k, count(DISTINCT v) FROM graft.mv.hll GROUP BY k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def mv(): Map[Long, (Long, Long)] =
      cat.ops.read(spark, dstDir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    def refresh() = Materialized.refreshApproxDistinct(
      spark, cat.ops, srcDir, dstDir, Seq("k"), "v")

    // initial load: two groups, 300 + 40 distinct values
    spark.range(300).selectExpr("1L AS k", "concat('a', id) AS v")
      .union(spark.range(40).selectExpr("2L AS k", "concat('b', id) AS v"))
      .createOrReplaceTempView("hll_batch1")
    spark.sql("INSERT INTO graft.mv.hll SELECT * FROM hll_batch1")
    refresh()
    assert(mv().view.mapValues(_._1).toMap == rebuilt(), "initial estimate == rebuild")
    mv().foreach { case (k, (est, _)) =>
      val ex = exact()(k)
      assert(math.abs(est - ex).toDouble / ex <= 0.05, s"group $k: est $est vs exact $ex")
    }

    // incremental append: 150 new + 100 OVERLAPPING values on group 1
    // (idempotent per item: re-unioning seen values must not inflate)
    spark.range(250).selectExpr("1L AS k", "concat('a', id + 150) AS v")
      .createOrReplaceTempView("hll_batch2")
    spark.sql("INSERT INTO graft.mv.hll SELECT * FROM hll_batch2")
    refresh()
    assert(mv().view.mapValues(_._1).toMap == rebuilt(), "union fold == rebuild")
    assert(mv()(1L)._2 == 550L, "n_rows tracks raw inserts")

    // delete on group 2 → recompute-on-retract repairs that group only
    spark.sql("DELETE FROM graft.mv.hll WHERE k = 2 AND v < 'b2'")
    refresh()
    assert(mv().view.mapValues(_._1).toMap == rebuilt(), "post-delete repair == rebuild")
    assert(mv()(2L)._2 == exact()(2L), "repaired group count is exact")

    // full-group delete disappears
    spark.sql("DELETE FROM graft.mv.hll WHERE k = 2")
    refresh()
    assert(!mv().contains(2L))
    assert(mv().view.mapValues(_._1).toMap == rebuilt())
  }

  test("merge-on-read deletes flow through the refresh") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.src2 (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.src2 VALUES (1, 1.0), (1, 2.0), (2, 3.0)")
    val srcDir = new Path(s"$warehouse/mv/src2")
    val dstDir = new Path(s"$warehouse/mv/agg2")
    Materialized.refreshSumCount(spark, cat.ops, srcDir, dstDir, Seq("k"), "v")

    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, srcDir, Seq(2L).toDF("k"))
    Materialized.refreshSumCount(spark, cat.ops, srcDir, dstDir, Seq("k"), "v")
    val mv = cat.ops.read(spark, dstDir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Double]("value_sum"), r.getAs[Long]("n_rows"))).toMap
    assert(mv == Map(1L -> (3.0, 2L)), s"got $mv")
  }

  // ---------- C88: transparent MV rewrite ----------

  private def mvScanCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name.startsWith("mv:") => r
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          if r.table.name.startsWith("mv:") => r
    }.size

  private def hasAggregate(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty

  test("C88: fresh MV answers SUM/COUNT/AVG aggregates; stale or time-travel falls back") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.rw (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.rw VALUES (1, 1.0), (1, 2.0), (2, 10.0)")
    val srcDir = new Path(s"$warehouse/mv/rw")
    val mvDir = new Path(s"$warehouse/mv/rw_agg")
    Materialized.refreshSumCount(spark, cat.ops, srcDir, mvDir, Seq("k"), "v")
    Materialized.enableRewrite(cat.ops, srcDir, mvDir)

    val q = "SELECT k, sum(v) AS s, count(*) AS n, avg(v) AS a " +
      "FROM graft.mv.rw GROUP BY k ORDER BY k"
    def run() = spark.sql(q)

    // fresh: the aggregate is GONE, replaced by an MV scan
    val fresh = run()
    assert(mvScanCount(fresh) == 1 && !hasAggregate(fresh),
      s"fresh MV must answer the query:\n${fresh.queryExecution.optimizedPlan}")
    assert(fresh.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq((1L, 3.0, 2L, 1.5), (2L, 10.0, 1L, 10.0)))

    // disabled by config: same query keeps its aggregate
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(mvScanCount(run()) == 0 && hasAggregate(run()))
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")

    // stale: a new source commit kills the rewrite until refresh
    spark.sql("INSERT INTO graft.mv.rw VALUES (2, 5.0), (3, 8.0)")
    val stale = run()
    assert(mvScanCount(stale) == 0 && hasAggregate(stale),
      "stale MV must NEVER answer the query")
    assert(stale.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq((1L, 3.0, 2L), (2L, 15.0, 2L), (3L, 8.0, 1L)))
    Materialized.refreshSumCount(spark, cat.ops, srcDir, mvDir, Seq("k"), "v")
    val refreshed = run()
    assert(mvScanCount(refreshed) == 1 && !hasAggregate(refreshed))
    assert(refreshed.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq((1L, 3.0, 2L), (2L, 15.0, 2L), (3L, 8.0, 1L)))

    // time travel is pinned history — never rewritten (even though the
    // MV is fresh for the head)
    val firstSnap = cat.ops.load(srcDir).get._2.snapshots.minBy(_.sequenceNumber)
    val tt = spark.sql(s"SELECT k, sum(v) AS s, count(*) AS n FROM " +
      s"graft.mv.rw VERSION AS OF ${firstSnap.snapshotId} GROUP BY k")
    assert(mvScanCount(tt) == 0 && hasAggregate(tt))
    assert(tt.collect().length == 2)

    // HAVING composes for free: the post-aggregation filter sits ABOVE
    // the replaced Aggregate, so it applies to the MV's answers
    val hv = spark.sql("SELECT k, sum(v) AS s FROM graft.mv.rw GROUP BY k " +
      "HAVING sum(v) > 5 ORDER BY k")
    assert(mvScanCount(hv) == 1 && !hasAggregate(hv),
      s"HAVING must not block the rewrite:\n${hv.queryExecution.optimizedPlan}")
    assert(hv.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((2L, 15.0), (3L, 8.0)))

    // a KEY-only filter commutes with the grouping: it re-applies on
    // the MV and the rewrite still fires, with filtered answers
    val kf = spark.sql("SELECT k, sum(v) AS s FROM graft.mv.rw WHERE k >= 2 GROUP BY k ORDER BY k")
    assert(mvScanCount(kf) == 1 && !hasAggregate(kf),
      s"key-only filter must not block the rewrite:\n${kf.queryExecution.optimizedPlan}")
    assert(kf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((2L, 15.0), (3L, 8.0)))

    // shapes the MV cannot answer keep their aggregate: VALUE-filtered
    // source, non-key grouping, sum of a different column, DISTINCT
    Seq(
      "SELECT k, sum(v) AS s FROM graft.mv.rw WHERE v > 1 GROUP BY k",
      "SELECT v, count(*) AS n FROM graft.mv.rw GROUP BY v",
      "SELECT k, count(DISTINCT v) AS n FROM graft.mv.rw GROUP BY k"
    ).foreach { sqlText =>
      val df = spark.sql(sqlText)
      assert(mvScanCount(df) == 0 && hasAggregate(df), s"must not rewrite: $sqlText")
    }
  }

  test("C47×C88: fresh join MV answers key,COUNT(*) over A⋈B; any lag or odd shape falls back") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.jra (ka BIGINT, av DOUBLE)")
    spark.sql("CREATE TABLE graft.mv.jrb (kb BIGINT, bv DOUBLE)")
    spark.sql("INSERT INTO graft.mv.jra VALUES (1, 1.0), (1, 2.0), (2, 5.0), (9, 9.0)")
    spark.sql("INSERT INTO graft.mv.jrb VALUES (1, 10.0), (2, 20.0), (2, 21.0), (3, 30.0)")
    val aDir = new Path(s"$warehouse/mv/jra")
    val bDir = new Path(s"$warehouse/mv/jrb")
    val mvDir = new Path(s"$warehouse/mv/jr_agg")
    Materialized.refreshJoinCount(spark, cat.ops, aDir, bDir, mvDir, "ka", "kb")
    Materialized.enableRewrite(cat.ops, aDir, mvDir)

    def hasJoin(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty
    val base = "FROM graft.mv.jra JOIN graft.mv.jrb ON ka = kb"
    def run(sqlText: String) = spark.sql(sqlText)
    val expected = Seq((1L, 2L), (2L, 2L)) // 9 has no partner, 3 none in A

    // fresh: the JOIN is gone, answered from the MV's O(groups) rows
    val fresh = run(s"SELECT ka, COUNT(*) AS n $base GROUP BY ka ORDER BY ka")
    assert(mvScanCount(fresh) == 1 && !hasJoin(fresh),
      s"fresh join MV must answer:\n${fresh.queryExecution.optimizedPlan}")
    assert(fresh.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == expected)

    // grouping on the OTHER side's key names the same groups
    val byB = run(s"SELECT kb, COUNT(*) AS n $base GROUP BY kb ORDER BY kb")
    assert(mvScanCount(byB) == 1 && !hasJoin(byB))
    assert(byB.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == expected)

    // global COUNT(*): MV rows re-aggregate (rollup), join still gone
    val glob = run(s"SELECT COUNT(*) AS n $base")
    assert(mvScanCount(glob) == 1 && !hasJoin(glob))
    assert(glob.collect().head.getLong(0) == 4L)

    // key-only filter commutes and re-applies on the MV key
    val kf = run(s"SELECT ka, COUNT(*) AS n $base WHERE ka >= 2 GROUP BY ka")
    assert(mvScanCount(kf) == 1 && !hasJoin(kf),
      s"key filter must not block:\n${kf.queryExecution.optimizedPlan}")
    assert(kf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 2L)))

    // lag on B: falls back to the real join until refreshed
    spark.sql("INSERT INTO graft.mv.jrb VALUES (9, 90.0)")
    val stale = run(s"SELECT ka, COUNT(*) AS n $base GROUP BY ka ORDER BY ka")
    assert(mvScanCount(stale) == 0 && hasJoin(stale), "stale join MV must fall back")
    assert(stale.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      expected :+ (9L, 1L))
    Materialized.refreshJoinCount(spark, cat.ops, aDir, bDir, mvDir, "ka", "kb")
    val refreshed = run(s"SELECT ka, COUNT(*) AS n $base GROUP BY ka ORDER BY ka")
    assert(mvScanCount(refreshed) == 1 && !hasJoin(refreshed))
    assert(refreshed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      expected :+ (9L, 1L))

    // shapes the join MV cannot answer keep their join: a non-COUNT
    // aggregate, a value filter, an extra join conjunct, an outer join,
    // grouping on a non-key column
    Seq(
      s"SELECT ka, SUM(av) AS s $base GROUP BY ka",
      s"SELECT ka, COUNT(*) AS n $base WHERE av > 1 GROUP BY ka",
      "SELECT ka, COUNT(*) AS n FROM graft.mv.jra JOIN graft.mv.jrb " +
        "ON ka = kb AND av < bv GROUP BY ka",
      "SELECT ka, COUNT(*) AS n FROM graft.mv.jra LEFT JOIN graft.mv.jrb " +
        "ON ka = kb GROUP BY ka",
      s"SELECT av, COUNT(*) AS n $base GROUP BY av"
    ).foreach { sqlText =>
      val df = run(sqlText)
      assert(mvScanCount(df) == 0 && hasJoin(df), s"must not rewrite: $sqlText")
    }
  }

  test("C88: MIN/MAX MVs answer MIN/MAX/COUNT(*); sum shapes never match them") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.mmrw (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.mmrw VALUES (1, 1.0), (1, 9.0), (2, 4.0)")
    val srcDir = new Path(s"$warehouse/mv/mmrw")
    val mvDir = new Path(s"$warehouse/mv/mmrw_agg")
    Materialized.refreshMinMax(spark, cat.ops, srcDir, mvDir, Seq("k"), "v")
    Materialized.enableRewrite(cat.ops, srcDir, mvDir)

    val q = spark.sql("SELECT k, min(v) AS lo, max(v) AS hi, count(*) AS n " +
      "FROM graft.mv.mmrw GROUP BY k ORDER BY k")
    assert(mvScanCount(q) == 1 && !hasAggregate(q),
      s"minmax MV must answer:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq ==
      Seq((1L, 1.0, 9.0, 2L), (2L, 4.0, 4.0, 1L)))
    // a SUM over the same table must NOT be answered by a minmax MV
    val qs = spark.sql("SELECT k, sum(v) AS s FROM graft.mv.mmrw GROUP BY k")
    assert(mvScanCount(qs) == 0 && hasAggregate(qs))
    // delete the stored max → repair path; rewrite keeps matching after refresh
    spark.sql("DELETE FROM graft.mv.mmrw WHERE v = 9.0")
    Materialized.refreshMinMax(spark, cat.ops, srcDir, mvDir, Seq("k"), "v")
    val q2 = spark.sql("SELECT k, min(v) AS lo, max(v) AS hi FROM graft.mv.mmrw GROUP BY k ORDER BY k")
    assert(mvScanCount(q2) == 1)
    assert(q2.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((1L, 1.0, 1.0), (2L, 4.0, 4.0)))
  }

  test("C88: CALL graft.system.refresh_mv drives create + refresh + rewrite registration") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.prw (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.prw VALUES (1, 2.0), (2, 4.0), (2, 6.0)")
    val res = spark.sql(
      "CALL graft.system.refresh_mv('mv.prw', 'mv.prw_agg', 'k', 'v')").collect()
    assert(res.head.getString(1) == "true")
    val q = spark.sql("SELECT k, sum(v) AS s, count(*) AS n FROM graft.mv.prw GROUP BY k ORDER BY k")
    assert(mvScanCount(q) == 1 && !hasAggregate(q),
      s"procedure-registered MV must answer:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq((1L, 2.0, 1L), (2L, 10.0, 2L)))
    // second CALL after churn advances the watermark and re-answers;
    // while stale, the maintenance advisor flags the MV
    spark.sql("INSERT INTO graft.mv.prw VALUES (1, 8.0)")
    val advice = spark.sql("CALL graft.system.maintenance_plan('mv.prw')")
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(advice.exists { case (a, why) =>
      a == "refresh_mv" && why.contains("behind the head") }, advice.toSeq.toString)
    spark.sql("CALL graft.system.refresh_mv('mv.prw', 'mv.prw_agg', 'k', 'v')")
    val advice2 = spark.sql("CALL graft.system.maintenance_plan('mv.prw')")
      .collect().map(_.getString(0))
    assert(!advice2.contains("refresh_mv"), advice2.toSeq.toString)
    val q2 = spark.sql("SELECT k, sum(v) AS s FROM graft.mv.prw GROUP BY k ORDER BY k")
    assert(mvScanCount(q2) == 1)
    assert(q2.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 10.0), (2L, 10.0)))
  }

  test("C88: NULL values — AVG divides by n_vals; all-NULL-group SUM is NULL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.nrw (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.nrw VALUES " +
      "(1, 1.0), (1, CAST(NULL AS DOUBLE)), (2, CAST(NULL AS DOUBLE)), (3, 4.0)")
    val srcDir = new Path(s"$warehouse/mv/nrw")
    val mvDir = new Path(s"$warehouse/mv/nrw_agg")
    Materialized.refreshSumCount(spark, cat.ops, srcDir, mvDir, Seq("k"), "v")
    Materialized.enableRewrite(cat.ops, srcDir, mvDir)

    val q = "SELECT k, sum(v) AS s, avg(v) AS a, count(*) AS n " +
      "FROM graft.mv.nrw GROUP BY k ORDER BY k"
    def collectQ() = spark.sql(q).collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      r.getLong(3))).toSeq
    val rewritten = spark.sql(q)
    assert(mvScanCount(rewritten) == 1 && !hasAggregate(rewritten),
      s"NULL-bearing values must still rewrite (n_vals covers them):\n" +
        rewritten.queryExecution.optimizedPlan)
    val expected = Seq(
      (1L, Some(1.0), Some(1.0), 2L), // AVG skips the NULL: 1.0/1, NOT 1.0/2
      (2L, None, None, 1L),           // all-NULL group: SUM and AVG are NULL
      (3L, Some(4.0), Some(4.0), 1L))
    assert(collectQ() == expected, collectQ().toString)
    // ground truth: the non-rewritten plan agrees exactly
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(collectQ() == expected)
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")

    // deleting a NULL row exercises the n_vals delta sign for deletes
    spark.sql("DELETE FROM graft.mv.nrw WHERE k = 1 AND v IS NULL")
    Materialized.refreshSumCount(spark, cat.ops, srcDir, mvDir, Seq("k"), "v")
    val after = spark.sql(q)
    assert(mvScanCount(after) == 1)
    assert(collectQ() == Seq(
      (1L, Some(1.0), Some(1.0), 1L),
      (2L, None, None, 1L),
      (3L, Some(4.0), Some(4.0), 1L)), collectQ().toString)
  }

  test("C88: options-based time travel and branch reads are never MV-answered") {
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.trw (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.trw VALUES (1, 1.0), (2, 2.0)")
    val srcDir = new Path(s"$warehouse/mv/trw")
    val firstSnap = cat.ops.load(srcDir).get._2.currentSnapshotId.get
    spark.sql("INSERT INTO graft.mv.trw VALUES (1, 10.0)")
    val mvDir = new Path(s"$warehouse/mv/trw_agg")
    Materialized.refreshSumCount(spark, cat.ops, srcDir, mvDir, Seq("k"), "v")
    Materialized.enableRewrite(cat.ops, srcDir, mvDir)

    // head read rewrites (sanity)
    val head = spark.table("graft.mv.trw")
      .groupBy("k").agg(sum("v").as("s")).orderBy("k")
    assert(mvScanCount(head) == 1, head.queryExecution.optimizedPlan.toString)

    // option-based snapshot pin: MUST fall back and answer from history
    val tt = spark.read.option("snapshot-id", firstSnap.toString)
      .table("graft.mv.trw")
      .groupBy("k").agg(sum("v").as("s")).orderBy("k")
    assert(mvScanCount(tt) == 0 && hasAggregate(tt),
      s"options time travel must not be MV-answered:\n${tt.queryExecution.optimizedPlan}")
    assert(tt.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.0), (2L, 2.0)))

    // ref (branch) read: same rule
    cat.ops.commit(srcDir, Seq.empty, Seq(
      MetadataUpdate.SetSnapshotRef("wap", firstSnap, "branch")))
    Materialized.refreshSumCount(spark, cat.ops, srcDir, mvDir, Seq("k"), "v")
    val br = spark.read.option("ref", "wap").table("graft.mv.trw")
      .groupBy("k").agg(sum("v").as("s")).orderBy("k")
    assert(mvScanCount(br) == 0 && hasAggregate(br),
      s"branch read must not be MV-answered:\n${br.queryExecution.optimizedPlan}")
    assert(br.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.0), (2L, 2.0)))
  }

  test("refresh_mv dispatches on the destination's MV kind instead of dying mid-flight") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.krw (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.krw VALUES (1, 1.0), (1, 9.0), (2, 4.0)")
    val srcDir = new Path(s"$warehouse/mv/krw")
    val mmDir = new Path(s"$warehouse/mv/krw_mm")
    Materialized.refreshMinMax(spark, cat.ops, srcDir, mmDir, Seq("k"), "v")
    spark.sql("INSERT INTO graft.mv.krw VALUES (2, 7.0)")
    // CALL against the EXISTING minmax MV refreshes it as minmax
    spark.sql("CALL graft.system.refresh_mv('mv.krw', 'mv.krw_mm', 'k', 'v')")
    val mm = cat.ops.read(spark, mmDir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Double]("value_min"), r.getAs[Double]("value_max"))).toMap
    assert(mm == Map(1L -> (1.0, 9.0), 2L -> (4.0, 7.0)), mm.toString)
    val headSeq = cat.ops.load(srcDir).get._2.currentSnapshot.get.sequenceNumber
    assert(cat.ops.load(mmDir).get._2.properties("graft.mv.last-seq").toLong == headSeq)
  }

  test("C88 drill-up: grouping on a SUBSET of MV keys re-aggregates the MV rows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.duo (k1 BIGINT, k2 BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.duo VALUES " +
      "(1, 10, 1.0), (1, 11, 2.0), (1, 11, CAST(NULL AS DOUBLE)), " +
      "(2, 10, CAST(NULL AS DOUBLE)), (2, 12, 8.0), (3, 13, CAST(NULL AS DOUBLE))")
    val srcDir = new Path(s"$warehouse/mv/duo")
    val mvDir = new Path(s"$warehouse/mv/duo_agg")
    Materialized.refreshSumCount(spark, cat.ops, srcDir, mvDir, Seq("k1", "k2"), "v")
    Materialized.enableRewrite(cat.ops, srcDir, mvDir)

    def check(q: String): Unit = {
      val df = spark.sql(q)
      assert(mvScanCount(df) == 1,
        s"drill-up must answer from the MV: $q\n${df.queryExecution.optimizedPlan}")
      val got = df.collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      val want = try spark.sql(q).collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
      assert(got == want, s"$q: $got vs $want")
    }
    // drill-up to k1: SUM/COUNT/AVG re-derive, NULL-correct (k3's
    // group is all-NULL → SUM/AVG NULL; k1=1 avg divides by 2 values)
    check("SELECT k1, sum(v) AS s, count(*) AS n, avg(v) AS a " +
      "FROM graft.mv.duo GROUP BY k1 ORDER BY k1")
    // global aggregate: no GROUP BY at all
    check("SELECT sum(v) AS s, count(*) AS n, avg(v) AS a FROM graft.mv.duo")
    // key-only filter composes with the roll-up
    check("SELECT k1, sum(v) AS s FROM graft.mv.duo WHERE k2 >= 11 GROUP BY k1 ORDER BY k1")
    // exact grouping still projects (no re-aggregation needed)
    val exactQ = spark.sql(
      "SELECT k1, k2, sum(v) AS s FROM graft.mv.duo GROUP BY k1, k2")
    assert(mvScanCount(exactQ) == 1 && !hasAggregate(exactQ))

    // grouping on a NON-key column keeps the full aggregate
    val nk = spark.sql("SELECT v, count(*) AS n FROM graft.mv.duo GROUP BY v")
    assert(mvScanCount(nk) == 0 && hasAggregate(nk))

    // minmax MV drills up too (MIN of mins / MAX of maxes)
    spark.sql("CREATE TABLE graft.mv.duomm (k1 BIGINT, k2 BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.duomm VALUES (1, 10, 1.0), (1, 11, 9.0), (2, 12, 4.0)")
    val mmSrc = new Path(s"$warehouse/mv/duomm")
    val mmDir = new Path(s"$warehouse/mv/duomm_agg")
    Materialized.refreshMinMax(spark, cat.ops, mmSrc, mmDir, Seq("k1", "k2"), "v")
    Materialized.enableRewrite(cat.ops, mmSrc, mmDir)
    val mm = spark.sql("SELECT k1, min(v) AS lo, max(v) AS hi, count(*) AS n " +
      "FROM graft.mv.duomm GROUP BY k1 ORDER BY k1")
    assert(mvScanCount(mm) == 1, mm.queryExecution.optimizedPlan.toString)
    assert(mm.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq ==
      Seq((1L, 1.0, 9.0, 2L), (2L, 4.0, 4.0, 1L)))

    // an HLL MV never re-aggregates (sketch union ≠ column roll-up)
    spark.sql("CREATE TABLE graft.mv.duohll (k1 BIGINT, k2 BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mv.duohll VALUES (1, 10, 'a'), (2, 12, 'b')")
    val hSrc = new Path(s"$warehouse/mv/duohll")
    val hDir = new Path(s"$warehouse/mv/duohll_agg")
    Materialized.refreshApproxDistinct(spark, cat.ops, hSrc, hDir, Seq("k1", "k2"), "v")
    Materialized.enableRewrite(cat.ops, hSrc, hDir)
    val hq = spark.sql("SELECT k1, count(*) AS n FROM graft.mv.duohll GROUP BY k1")
    assert(mvScanCount(hq) == 0 && hasAggregate(hq),
      "hll MV must not answer a drill-up")
  }

  test("C88: metadata probe caches across compiles (hint-stamp validated)") {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.spark.sql.functions.sum
    val reads = new java.util.concurrent.atomic.AtomicInteger()
    val store = new FsStore(spark.sparkContext.hadoopConfiguration) {
      override def readString(p: HPath): String = {
        reads.incrementAndGet(); super.readString(p)
      }
    }
    val ops = new TableOps(store)
    val wh = java.nio.file.Files.createTempDirectory("graft-mvcache-")
    val srcDir = new HPath(wh.toString, "src")
    val mvDir = new HPath(wh.toString, "agg")
    import spark.implicits._
    val df = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("k", "v")
    ops.create(srcDir, TableMetadata.create(
      srcDir.toString, SchemaBridge.fromSpark(df.schema),
      PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
    ops.write(srcDir, df, "append")
    Materialized.refreshSumCount(spark, ops, srcDir, mvDir, Seq("k"), "v")
    Materialized.enableRewrite(ops, srcDir, mvDir)
    val (_, meta) = ops.load(srcDir).get
    val t = new GraftTable(srcDir.toString, srcDir, meta, ops)
    def compile(): Unit = {
      val d = org.apache.spark.sql.execution.datasources.GraftBridge
        .ofRows(spark, t).groupBy("k").agg(sum("v").as("s"))
      assert(mvScanCount(d) == 1, d.queryExecution.optimizedPlan.toString)
    }
    compile() // cold: full load + parse
    val before = reads.get()
    compile(); compile(); compile()
    val warm = reads.get() - before
    // a warm probe is ONE hint read per compile (stamp match ⇒ no
    // metadata re-read/re-parse); leave slack for incidental reads
    assert(warm <= 6, s"probe must be cached across compiles: $warm reads for 3")
    // a refresh bumps the stamp: the NEXT compile reloads and the MV
    // keeps answering with fresh state
    spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(2L, 5.0)), df.schema).createOrReplaceTempView("mvc_add")
    ops.write(srcDir, spark.table("mvc_add"), "append")
    Materialized.refreshSumCount(spark, ops, srcDir, mvDir, Seq("k"), "v")
    val (_, meta2) = ops.load(srcDir).get
    val t2 = new GraftTable(srcDir.toString, srcDir, meta2, ops)
    val d2 = org.apache.spark.sql.execution.datasources.GraftBridge
      .ofRows(spark, t2).groupBy("k").agg(sum("v").as("s")).orderBy("k")
    assert(mvScanCount(d2) == 1)
    assert(d2.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 3.0), (2L, 8.0)))
  }

  test("enableRewrite: concurrent registrations of different MVs both survive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    spark.sql("CREATE TABLE graft.mv.crw (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.mv.crw VALUES (1, 1.0)")
    val srcDir = new Path(s"$warehouse/mv/crw")
    val mvDirs = (0 until 6).map(i => new Path(s"$warehouse/mv/crw_agg$i"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      val futs = mvDirs.map(d => pool.submit(new Runnable {
        def run(): Unit = { Materialized.enableRewrite(cat.ops, srcDir, d); () }
      }))
      futs.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val registered = cat.ops.load(srcDir).get._2
      .properties(RewriteToMaterializedView.RewriteProp)
      .split(",").map(_.trim).toSet
    assert(registered == mvDirs.map(_.toString).toSet,
      s"lost registrations: $registered vs ${mvDirs.map(_.toString).toSet}")
  }
}
