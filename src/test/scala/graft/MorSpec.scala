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

  test("sequence ordering: re-inserted keys survive an earlier equality delete") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.seq (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mor.seq VALUES (1,'a'), (2,'b')")
    val dir = new Path(s"$warehouse/mor/seq")
    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, dir, Seq(2L).toDF("id"))
    // re-insert the deleted key AFTER the delete: the delete's sequence
    // number is below the new file's, so the new row must be visible
    spark.sql("INSERT INTO graft.mor.seq VALUES (2,'b2'), (3,'c')")

    assert(spark.sql("SELECT id, v FROM graft.mor.seq ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(cat.ops.read(spark, dir).count() == 3)
    // the delete still masks the ORIGINAL row: purge and check content
    cat.ops.applyDeletes(spark, dir)
    assert(spark.sql("SELECT id, v FROM graft.mor.seq ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("positional delete removes rows by (file, ordinal), O(matched) commit") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.pos (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mor.pos VALUES (1,'x'), (1,'x'), (2,'y')")
    spark.sql("INSERT INTO graft.mor.pos VALUES (3,'z'), (4,'y')")
    val dir = new Path(s"$warehouse/mor/pos")
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)

    import org.apache.spark.sql.functions.col
    cat.ops.positionalDelete(spark, dir, col("v") === "y")

    // both 'y' rows dead, duplicates of (1,'x') both alive
    assert(spark.sql("SELECT id FROM graft.mor.pos ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 1L, 3L))
    // filter + pruning paths agree (pos path reads without pushdown)
    assert(spark.sql("SELECT count(*) FROM graft.mor.pos WHERE id >= 1")
      .collect().head.getLong(0) == 3)
    assert(spark.sql("SELECT v FROM graft.mor.pos ORDER BY v")
      .collect().map(_.getString(0)).toSeq == Seq("x", "x", "z"))
    // helper read agrees; zero data files rewritten
    assert(cat.ops.read(spark, dir).count() == 3)
    val after = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(before.filter(_.isData).map(_.path).toSet
      .subsetOf(after.filter(_.isData).map(_.path).toSet))
    // parallel delete-file write: one part per source partition that
    // held matched rows (no coalesce(1) funnel)
    assert(after.count(_.isPosDelete) >= 1)

    // appends after the positional delete are untouched by it
    spark.sql("INSERT INTO graft.mor.pos VALUES (5,'y')")
    assert(spark.sql("SELECT count(*) FROM graft.mor.pos").collect().head.getLong(0) == 4)

    // copy-on-write guarded while pending; purge restores it
    intercept[Exception] { spark.sql("DELETE FROM graft.mor.pos WHERE id = 3") }
    cat.ops.applyDeletes(spark, dir)
    assert(cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2).forall(_.isData))
    assert(spark.sql("SELECT count(*) FROM graft.mor.pos").collect().head.getLong(0) == 4)
    spark.sql("DELETE FROM graft.mor.pos WHERE id = 3")
    assert(spark.sql("SELECT count(*) FROM graft.mor.pos").collect().head.getLong(0) == 3)
  }

  test("equality and positional deletes compose on one table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.both (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mor.both VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    val dir = new Path(s"$warehouse/mor/both")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    cat.ops.mergeOnReadDelete(spark, dir, Seq(2L).toDF("id"))
    cat.ops.positionalDelete(spark, dir, col("v") === "d")
    assert(spark.sql("SELECT id FROM graft.mor.both ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("_pos metadata column exposes absolute file ordinals") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.ord (id BIGINT)")
    spark.sql("INSERT INTO graft.mor.ord VALUES (10), (20), (30)")
    // ordinals start at 0 per file and are dense
    val rows = spark.sql("SELECT _file, _pos FROM graft.mor.ord")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 3)
    rows.groupBy(_._1).foreach { case (_, ps) =>
      assert(ps.map(_._2).sorted.toSeq == (0L until ps.length).toSeq)
    }
  }

  test("changes() emits row-level deletes for merge-on-read commits") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.cdc (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mor.cdc VALUES (1,'a'), (2,'b')")  // seq 1
    val dir = new Path(s"$warehouse/mor/cdc")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    cat.ops.mergeOnReadDelete(spark, dir, Seq(2L).toDF("id"))       // seq 2
    spark.sql("INSERT INTO graft.mor.cdc VALUES (2,'b2')")          // seq 3
    cat.ops.positionalDelete(spark, dir, col("id") === 1)           // seq 4

    val feed = cat.ops.changes(spark, dir, 0L, Long.MaxValue)
      .collect()
      .map(r => (r.getLong(3), r.getString(2), r.getLong(0), r.getString(1)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(feed == Seq(
      (1L, "insert", 1L, "a"),
      (1L, "insert", 2L, "b"),
      (2L, "delete", 2L, "b"),   // equality delete → row-level delete event
      (3L, "insert", 2L, "b2"),  // re-insert after the delete
      (4L, "delete", 1L, "a")    // positional delete → row-level delete event
    ).sortBy(t => (t._1, t._2, t._3)), s"feed was $feed")
    // replaying the feed reproduces the final state
    assert(spark.sql("SELECT id, v FROM graft.mor.cdc").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((2L, "b2")))
  }

  test("positional deletes survive table rename (relative coordinates)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.rn (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mor.rn VALUES (1,'a'), (2,'b'), (3,'c')")
    import org.apache.spark.sql.functions.col
    cat.ops.positionalDelete(spark, new Path(s"$warehouse/mor/rn"), col("v") === "b")
    assert(spark.sql("SELECT count(*) FROM graft.mor.rn").collect().head.getLong(0) == 2)

    spark.sql("ALTER TABLE graft.mor.rn RENAME TO mor.rn2")
    // the delete must still mask row (2,'b') at the NEW location
    assert(spark.sql("SELECT id FROM graft.mor.rn2 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // and the CDC feed resolves the delete row-level post-rename
    val dir2 = new Path(s"$warehouse/mor/rn2")
    val feed = cat.ops.changes(spark, dir2, 0L, Long.MaxValue).collect()
      .map(r => (r.getString(2), r.getLong(0)))
    assert(feed.contains(("delete", 2L)), s"feed was ${feed.toSeq}")
  }

  test("compactDeletes merges delete files only across append-free spans") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.cd (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.mor.cd VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')") // seq 1
    val dir = new Path(s"$warehouse/mor/cd")
    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, dir, Seq(1L).toDF("id"))   // seq 2
    cat.ops.mergeOnReadDelete(spark, dir, Seq(2L).toDF("id"))   // seq 3
    spark.sql("INSERT INTO graft.mor.cd VALUES (1,'back')")     // seq 4 (re-insert)
    cat.ops.mergeOnReadDelete(spark, dir, Seq(3L).toDF("id"))   // seq 5

    def content() = spark.sql("SELECT id, v FROM graft.mor.cd").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val before = content()
    assert(before == Set((4L, "d"), (1L, "back")))
    assert(cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2).count(_.isEqDelete) == 3)

    cat.ops.compactDeletes(spark, dir)

    // deletes at seq 2+3 merge (no appends between); seq 5 must stay
    // separate — merging it would mask the seq-4 re-insert
    val after = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(after.count(_.isEqDelete) == 2,
      s"expected 2 delete files, got ${after.filter(_.isEqDelete)}")
    assert(content() == before, "compaction must not change visible rows")
    // and the table still behaves (another reinsert + read)
    spark.sql("INSERT INTO graft.mor.cd VALUES (3,'returns')")
    assert(content() == before + ((3L, "returns")))
  }

  test("million-key equality + million-row positional deletes stay off the driver") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    val dir = new Path(s"$warehouse/mor/big")
    spark.sql("CREATE TABLE graft.mor.big (id BIGINT, v BIGINT)")
    // 3M rows in several files
    cat.ops.write(dir,
      spark.range(0, 3000000).selectExpr("id", "id * 2 AS v").repartition(6), "append")

    // ≥1M-key equality delete: every id ≡ 0 (mod 3)
    cat.ops.mergeOnReadDelete(spark, dir,
      spark.range(0, 3000000, 3).toDF("id"))
    // the delete-file write must NOT have funneled through one task
    val eqEntries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .filter(_.isEqDelete)
    assert(eqEntries.size > 1,
      s"expected a multi-part equality-delete write, got ${eqEntries.size} file(s)")

    // reads apply the mask via executor-side delete-set loading; the
    // driver never holds the keys (MorFilter plans a sub-scan only)
    assert(spark.sql("SELECT count(*) FROM graft.mor.big").collect().head.getLong(0)
      == 2000000L)
    assert(spark.sql("SELECT count(*) FROM graft.mor.big WHERE id % 3 = 0")
      .collect().head.getLong(0) == 0L)
    assert(spark.sql("SELECT sum(v) FROM graft.mor.big WHERE id < 10")
      .collect().head.getLong(0) == Seq(1L, 2, 4, 5, 7, 8).map(_ * 2).sum)

    // ≥1M-row positional delete on the surviving rows: id ≡ 1 (mod 3)
    cat.ops.positionalDelete(spark, dir, org.apache.spark.sql.functions.expr("id % 3 = 1"))
    assert(spark.sql("SELECT count(*) FROM graft.mor.big").collect().head.getLong(0)
      == 1000000L)
    assert(spark.sql("SELECT min(id), max(id) FROM graft.mor.big")
      .collect().map(r => (r.getLong(0), r.getLong(1))).head == ((2L, 2999999L)))
    assert(spark.sql("SELECT count(*) FROM graft.mor.big WHERE id % 3 != 2")
      .collect().head.getLong(0) == 0L)
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
