package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** C69 — INSERT OVERWRITE: filter-scoped (static partition / explicit
  * predicate) and dynamic partition overwrite. The contract under
  * test: untouched partitions keep their files VERBATIM (same paths,
  * stats intact), fully-matching files drop without being read, and
  * straddling files rewrite copy-on-write with rows where the
  * predicate is false or null surviving. */
class OverwriteSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  private def entries(dir: Path) =
    cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)

  private def withSQLConf[A](kv: (String, String)*)(body: => A): A = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("static INSERT OVERWRITE PARTITION replaces one partition, keeps the rest verbatim") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ow")
    spark.sql("CREATE TABLE graft.ow.stat (id BIGINT, day BIGINT) PARTITIONED BY (day) " +
      "TBLPROPERTIES ('graft.write.target-file-count'='4')")
    spark.range(0, 4000).selectExpr("id", "id % 4 AS day")
      .write.mode("append").saveAsTable("graft.ow.stat")
    val dir = new Path(s"$warehouse/ow/stat")
    val before = entries(dir)

    spark.sql("INSERT OVERWRITE graft.ow.stat PARTITION (day = 2) SELECT id FROM range(10)")

    assert(spark.sql("SELECT count(*) FROM graft.ow.stat WHERE day = 2")
      .collect().head.getLong(0) == 10)
    assert(spark.sql("SELECT count(*) FROM graft.ow.stat WHERE day <> 2")
      .collect().head.getLong(0) == 3000)
    // partitions day∈{0,1,3} kept as the SAME files, stats intact
    val after = entries(dir)
    val kept = before.map(_.path).toSet.intersect(after.map(_.path).toSet)
    assert(kept.nonEmpty, "stat-disjoint files must be kept, not rewritten")
    assert(after.filter(e => kept(e.path)).forall(_.stats.nonEmpty))
    // time travel to the pre-overwrite snapshot still sees all rows
    val m2 = cat.ops.load(dir).get._2
    val prev = m2.snapshots.sortBy(_.sequenceNumber).dropRight(1).last
    assert(spark.sql(s"SELECT count(*) FROM graft.ow.stat VERSION AS OF ${prev.snapshotId}")
      .collect().head.getLong(0) == 4000)
  }

  test("overwrite(condition) straddling files rewrites survivors; null rows survive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ow")
    spark.sql("CREATE TABLE graft.ow.straddle (id BIGINT, v BIGINT)")
    // one file spanning ids 0..99, incl. null v rows
    spark.range(0, 100).selectExpr("id", "IF(id % 10 = 0, NULL, id) AS v")
      .coalesce(1).write.mode("append").saveAsTable("graft.ow.straddle")

    import org.apache.spark.sql.functions.col
    spark.range(1000, 1003).selectExpr("id", "id AS v")
      .writeTo("graft.ow.straddle").overwrite(col("v") >= 50L)

    val out = spark.table("graft.ow.straddle")
    // survivors: non-null v < 50 (ids 1..49 minus the four null
    // 10-multiples = 45) plus the 10 null-v rows (predicate NULL ⇒
    // survives), plus 3 new rows
    assert(out.count() == 45 + 10 + 3)
    assert(out.where("v IS NULL").count() == 10)
    assert(out.where("v >= 50 AND id < 1000").count() == 0)
    assert(out.where("id >= 1000").count() == 3)
  }

  test("dynamic partition overwrite replaces only incoming partitions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ow")
    spark.sql("CREATE TABLE graft.ow.dyn (id BIGINT, day BIGINT) PARTITIONED BY (day) " +
      "TBLPROPERTIES ('graft.write.target-file-count'='4')")
    spark.range(0, 4000).selectExpr("id", "id % 4 AS day")
      .write.mode("append").saveAsTable("graft.ow.dyn")
    val dir = new Path(s"$warehouse/ow/dyn")
    val before = entries(dir)

    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      spark.sql("INSERT OVERWRITE graft.ow.dyn " +
        "SELECT id, CAST(1 AS BIGINT) AS day FROM range(7) " +
        "UNION ALL SELECT id, CAST(3 AS BIGINT) AS day FROM range(5)")
    }

    assert(spark.sql("SELECT count(*) FROM graft.ow.dyn WHERE day = 1")
      .collect().head.getLong(0) == 7)
    assert(spark.sql("SELECT count(*) FROM graft.ow.dyn WHERE day = 3")
      .collect().head.getLong(0) == 5)
    assert(spark.sql("SELECT count(*) FROM graft.ow.dyn WHERE day IN (0, 2)")
      .collect().head.getLong(0) == 2000)
    val after = entries(dir)
    val kept = before.map(_.path).toSet.intersect(after.map(_.path).toSet)
    assert(kept.nonEmpty, "day 0/2 files must be kept verbatim")
  }

  test("drop-whole classification: single-partition files are not read or rewritten") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ow")
    spark.sql("CREATE TABLE graft.ow.drop (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    // one append per day ⇒ each file single-valued on day
    (0L to 2L).foreach { d =>
      spark.range(0, 100).selectExpr("id", s"CAST($d AS BIGINT) AS day")
        .coalesce(1).write.mode("append").saveAsTable("graft.ow.drop")
    }
    val dir = new Path(s"$warehouse/ow/drop")
    val before = entries(dir)
    assert(before.size == 3)

    spark.sql("INSERT OVERWRITE graft.ow.drop PARTITION (day = 1) SELECT id FROM range(3)")

    val after = entries(dir)
    // day-1's old file dropped whole; day-0/2 files identical; exactly
    // one new file added — nothing was rewritten
    assert(after.size == 3)
    assert(before.map(_.path).toSet.intersect(after.map(_.path).toSet).size == 2)
    assert(spark.table("graft.ow.drop").count() == 203)
  }

  test("full INSERT OVERWRITE (no partition clause, static) truncates then inserts") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ow")
    spark.sql("CREATE TABLE graft.ow.full (id BIGINT)")
    spark.range(0, 50).write.mode("append").saveAsTable("graft.ow.full")
    spark.sql("INSERT OVERWRITE graft.ow.full SELECT id FROM range(5)")
    assert(spark.table("graft.ow.full").count() == 5)
  }

  test("survivor rewrites on bucket tables keep __pt_ stats (pruning parity)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ow")
    spark.sql("""CREATE TABLE graft.ow.bk (k BIGINT, v BIGINT)
                 PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO graft.ow.bk SELECT CAST(id % 50 AS BIGINT), id FROM range(1000)")
    val dir = new Path(s"$warehouse/ow/bk")
    assert(entries(dir).forall(_.stats.contains("__pt_k")))

    import org.apache.spark.sql.functions.col
    // straddles every bucket file (v range cuts across all buckets)
    spark.range(5000, 5003).selectExpr("CAST(id AS BIGINT) AS k", "id AS v")
      .writeTo("graft.ow.bk").overwrite(col("v") >= 500L)

    val after = entries(dir)
    assert(after.filter(_.isData).forall(_.stats.contains("__pt_k")),
      s"survivor files must keep bucket stats: ${after.map(_.stats.keySet)}")
    assert(spark.sql("SELECT count(*) FROM graft.ow.bk WHERE v < 500").collect()
      .head.getLong(0) == 500)
  }

  test("overwrite aborts cleanly when MOR deletes are pending") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ow")
    spark.sql("CREATE TABLE graft.ow.mor (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    spark.range(0, 100).selectExpr("id", "id % 2 AS day")
      .write.mode("append").saveAsTable("graft.ow.mor")
    val dir = new Path(s"$warehouse/ow/mor")
    cat.ops.mergeOnReadDelete(spark, dir, spark.range(0, 5).selectExpr("id"))
    val e = intercept[Exception] {
      spark.sql("INSERT OVERWRITE graft.ow.mor PARTITION (day = 0) SELECT id FROM range(3)")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("merge-on-read")), e.toString)
  }
}
