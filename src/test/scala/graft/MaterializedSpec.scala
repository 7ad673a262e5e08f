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
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

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
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(mv == Map(1L -> (3.0, 2L)), s"got $mv")
  }
}
