package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** Merge-on-read equality deletes: O(keys) DELETE commits, read-time
  * application, purge via applyDeletes, and copy-on-write guards. */
class MorSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  test("equality delete hides rows without rewriting data files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mor.t VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    val dir = new Path(s"$warehouse/mor/t")
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)

    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, dir, Seq(2L, 4L).toDF("id"))

    // SQL scan path applies the deletes
    assert(spark.sql("SELECT id FROM graft.mor.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // with column pruning that drops the key column
    assert(spark.sql("SELECT v FROM graft.mor.t ORDER BY v")
      .collect().map(_.getString(0)).toSeq == Seq("a", "c"))
    // with a pushed filter
    assert(spark.sql("SELECT count(*) FROM graft.mor.t WHERE id > 1")
      .collect().head.getLong(0) == 1)
    // DataFrame read helper agrees
    assert(cat.ops.read(spark, dir).count() == 2)

    // zero data files rewritten: every pre-delete data file still referenced
    val after = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    val beforeData = before.filter(_.isData).map(_.path).toSet
    assert(beforeData.subsetOf(after.filter(_.isData).map(_.path).toSet))
    assert(after.count(_.isEqDelete) == 1)

    // pre-delete snapshot time-travels without the delete applied
    val (_, m) = cat.ops.load(dir).get
    val prev = m.snapshots.sortBy(_.sequenceNumber).dropRight(1).last
    assert(spark.sql(s"SELECT count(*) FROM graft.mor.t VERSION AS OF ${prev.snapshotId}")
      .collect().head.getLong(0) == 4)
  }

  test("applyDeletes purges delete files; copy-on-write ops are guarded") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.g (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mor.g VALUES (1,'a'), (2,'b'), (3,'c')")
    val dir = new Path(s"$warehouse/mor/g")
    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, dir, Seq(2L).toDF("id"))

    // raw-file rewrites would resurrect dead rows → they must refuse
    val e = intercept[Exception] {
      spark.sql("UPDATE graft.mor.g SET v = 'X' WHERE id = 1")
    }
    assert(e.getMessage != null)
    intercept[IllegalStateException] {
      cat.ops.upsert(spark, dir, Seq((1L, "z")).toDF("id", "v"), Seq("id"))
    }

    cat.ops.applyDeletes(spark, dir)
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(entries.forall(_.isData), "applyDeletes drops delete entries")
    assert(spark.sql("SELECT id FROM graft.mor.g ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))

    // after the purge, copy-on-write works again
    spark.sql("UPDATE graft.mor.g SET v = 'X' WHERE id = 1")
    assert(spark.sql("SELECT v FROM graft.mor.g WHERE id = 1").collect().head.getString(0) == "X")
  }

  test("delete commits retry through concurrent appends, nothing lost") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.race (id BIGINT)")
    spark.sql("INSERT INTO graft.mor.race SELECT id FROM range(0, 100)")
    val dir = new Path(s"$warehouse/mor/race")
    import spark.implicits._

    // 4 concurrent appenders + 4 concurrent key-deleters on one table
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val appends = (1 to 4).map(i => Future {
      cat.ops.write(dir, spark.range(1000L * i, 1000L * i + 10).toDF("id"), "append")
    })
    val deletes = (0 until 4).map(i => Future {
      cat.ops.mergeOnReadDelete(spark, dir, Seq(i.toLong, (i + 10).toLong).toDF("id"))
    })
    Await.result(Future.sequence(appends ++ deletes), 120.seconds)
    pool.shutdown()

    // all 8 commits landed: 100 base - 8 deleted + 40 appended
    assert(spark.sql("SELECT count(*) FROM graft.mor.race").collect().head.getLong(0) == 132)
    val (_, m) = cat.ops.load(dir).get
    assert(m.snapshots.size == 9, s"expected 9 snapshots, got ${m.snapshots.size}")
  }

  test("string keys and multi-column keys") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.mk (id BIGINT, lang STRING, v DOUBLE)")
    spark.sql("INSERT INTO graft.mor.mk VALUES (1,'en',0.1), (1,'de',0.2), (2,'en',0.3)")
    val dir = new Path(s"$warehouse/mor/mk")
    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, dir, Seq((1L, "en")).toDF("id", "lang"))
    assert(spark.sql("SELECT id, lang FROM graft.mor.mk ORDER BY id, lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "de"), (2L, "en")))
    // second delete with a different key set composes
    cat.ops.mergeOnReadDelete(spark, dir, Seq("de").toDF("lang"))
    assert(spark.sql("SELECT id, lang FROM graft.mor.mk ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "en")))
  }
}
