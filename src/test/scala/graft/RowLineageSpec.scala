package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** C70 — row lineage: stable `_row_id` assignment at commit time
  * (per-file id blocks in the manifest), id stability across reads,
  * monotone id allocation across commits incl. concurrent ones,
  * materialization through lineage-preserving compaction, and
  * survival through MOR deletes and filter overwrites. */
class RowLineageSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  private def ids(table: String): Map[Long, Long] =
    spark.sql(s"SELECT id, _row_id FROM $table").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("appends assign dense unique id blocks; ids are stable across reads") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
    spark.sql("CREATE TABLE graft.rl.a (id BIGINT) " +
      "TBLPROPERTIES ('graft.row-lineage.enabled'='true')")
    spark.range(0, 100).write.mode("append").saveAsTable("graft.rl.a")
    spark.range(100, 150).write.mode("append").saveAsTable("graft.rl.a")

    val m1 = ids("graft.rl.a")
    assert(m1.size == 150)
    assert(m1.values.toSeq.distinct.size == 150, "row ids must be unique")
    assert(m1.values.min == 0L && m1.values.max == 149L,
      s"dense block allocation expected, got [${m1.values.min}, ${m1.values.max}]")
    // stable: a second read sees the identical assignment
    assert(ids("graft.rl.a") == m1)
    // counter advanced in table properties
    val dir = new Path(s"$warehouse/rl/a")
    assert(cat.ops.load(dir).get._2.properties("graft.row-lineage.next-row-id") == "150")
  }

  test("non-lineage tables read _row_id as null") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
    spark.sql("CREATE TABLE graft.rl.off (id BIGINT)")
    spark.range(0, 10).write.mode("append").saveAsTable("graft.rl.off")
    val rows = spark.sql("SELECT _row_id FROM graft.rl.off").collect()
    assert(rows.length == 10 && rows.forall(_.isNullAt(0)))
  }

  test("compactLineage materializes ids; mapping survives the rewrite and later appends") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
    spark.sql("CREATE TABLE graft.rl.c (id BIGINT) " +
      "TBLPROPERTIES ('graft.row-lineage.enabled'='true')")
    (0 until 4).foreach(i =>
      spark.range(i * 25, (i + 1) * 25).write.mode("append").saveAsTable("graft.rl.c"))
    val dir = new Path(s"$warehouse/rl/c")
    val before = ids("graft.rl.c")
    assert(cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2).size >= 4)

    cat.ops.compactLineage(spark, dir, numFiles = 2)

    assert(cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .count(_.isData) <= 2, "compaction must reduce the file count")
    assert(ids("graft.rl.c") == before,
      "row-id ↔ row mapping must survive compaction (materialized ids win)")

    // appends after compaction continue from the advanced counter —
    // no clashes with materialized ids
    spark.range(1000, 1010).write.mode("append").saveAsTable("graft.rl.c")
    val after = ids("graft.rl.c")
    assert(after.size == 110 && after.values.toSeq.distinct.size == 110)
    assert(after.filter(_._1 < 1000) == before)
  }

  test("MOR delete keeps surviving ids; filter overwrite keeps straddle-survivor ids") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
    spark.sql("CREATE TABLE graft.rl.d (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.row-lineage.enabled'='true')")
    spark.range(0, 100).selectExpr("id", "id AS v")
      .coalesce(1).write.mode("append").saveAsTable("graft.rl.d")
    val dir = new Path(s"$warehouse/rl/d")
    def mapping(): Map[Long, Long] =
      spark.sql("SELECT id, _row_id FROM graft.rl.d").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = mapping()

    // MOR equality delete of ids 0-9: ordinals of survivors unchanged
    cat.ops.mergeOnReadDelete(spark, dir, spark.range(0, 10).toDF("id"))
    val afterDel = mapping()
    assert(afterDel.size == 90)
    assert(afterDel.forall { case (k, rid) => before(k) == rid })

    // clear MOR state, then overwrite a straddling range: survivors
    // of the rewritten file keep their ids (materialized on rewrite)
    cat.ops.applyDeletes(spark, dir)
    import org.apache.spark.sql.functions.col
    spark.range(2000, 2003).selectExpr("id", "id AS v")
      .writeTo("graft.rl.d").overwrite(col("v") >= 50L)
    // (applyDeletes is a plain rewrite — it re-mints ids; uniqueness
    // and survivor-set correctness are the invariants here)
    val afterOw = mapping()
    assert(afterOw.filter(_._1 < 2000).keySet == (10L until 50L).toSet)
    assert(afterOw.filter(_._1 >= 2000).size == 3)
    assert(afterOw.values.toSeq.distinct.size == afterOw.size, "ids stay unique")
  }

  test("overwrite straddle survivors keep exact ids when no intermediate rewrite occurred") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
    spark.sql("CREATE TABLE graft.rl.e (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.row-lineage.enabled'='true')")
    spark.range(0, 100).selectExpr("id", "id AS v")
      .coalesce(1).write.mode("append").saveAsTable("graft.rl.e")
    val before = spark.sql("SELECT id, _row_id FROM graft.rl.e").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    import org.apache.spark.sql.functions.col
    spark.range(3000, 3002).selectExpr("id", "id AS v")
      .writeTo("graft.rl.e").overwrite(col("v") >= 60L)

    val after = spark.sql("SELECT id, _row_id FROM graft.rl.e").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.filter(_._1 < 3000) == before.filter(_._1 < 60),
      "survivors of the straddling rewrite keep their pre-overwrite ids")
  }

  test("concurrent appends never reuse an id block") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
    spark.sql("CREATE TABLE graft.rl.race (id BIGINT) " +
      "TBLPROPERTIES ('graft.row-lineage.enabled'='true')")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until 4).map { i =>
      Future {
        spark.range(i * 100, i * 100 + 100).write.mode("append")
          .saveAsTable("graft.rl.race")
      }
    }
    Await.result(Future.sequence(fs), 120.seconds)
    val m = ids("graft.rl.race")
    assert(m.size == 400)
    assert(m.values.toSeq.distinct.size == 400, "CAS-retried commits must restamp id blocks")
    assert(m.values.min == 0L && m.values.max == 399L)
  }

  test("RTAS on a lineage-enabled table stamps fresh id blocks") {
    // Regression (ADVICE r12): replaceTableData skipped the stampRowIds
    // step commitFilesOnce applies — an RTAS whose merged properties
    // keep lineage enabled committed files with no firstRowId and no
    // next-row-id advance, breaking _row_id reads after the replace.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
    spark.sql("CREATE TABLE graft.rl.rtas (id BIGINT) " +
      "TBLPROPERTIES ('graft.row-lineage.enabled'='true')")
    spark.range(0, 50).write.mode("append").saveAsTable("graft.rl.rtas")
    val dir = new Path(s"$warehouse/rl/rtas")
    val before = cat.ops.load(dir).get._2
      .properties("graft.row-lineage.next-row-id").toLong
    assert(before == 50)

    spark.sql("REPLACE TABLE graft.rl.rtas AS SELECT explode(sequence(100L, 119L)) AS id")
    val meta = cat.ops.load(dir).get._2
    assert(meta.properties("graft.row-lineage.enabled") == "true",
      "SetProperties merges — lineage stays enabled across the replace")
    assert(meta.properties("graft.row-lineage.next-row-id").toLong == before + 20,
      "the replace commit must advance next-row-id past its block")
    val m = ids("graft.rl.rtas")
    assert(m.size == 20)
    assert(m.values.toSet == (before until before + 20).toSet,
      "replace rows get FRESH ids above the pre-replace block (never reused)")
  }
}
