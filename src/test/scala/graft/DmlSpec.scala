package graft

import org.apache.hadoop.fs.Path

import graft.catalog._
import graft.pipeline.Vectors

/** Row-level DELETE (copy-on-write), compaction, and the IVF ANN
  * scale path. */
class DmlSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  test("DELETE FROM rewrites only possibly-affected files, keeps history") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.del (id BIGINT, day BIGINT) PARTITIONED BY (day) " +
      "TBLPROPERTIES ('graft.write.target-file-count'='4')")
    spark.range(0, 4000).selectExpr("id", "id % 4 AS day")
      .write.mode("append").saveAsTable("graft.dml.del")
    val dir = new Path(s"$warehouse/dml/del")
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(before.size >= 2)

    spark.sql("DELETE FROM graft.dml.del WHERE day = 2 AND id < 1000")
    assert(spark.sql("SELECT count(*) FROM graft.dml.del").collect().head.getLong(0) == 3750)
    assert(spark.sql("SELECT count(*) FROM graft.dml.del WHERE day = 2").collect().head.getLong(0) == 750)

    // untouched files survive verbatim (paths reused, stats kept)
    val (_, m2) = cat.ops.load(dir).get
    val after = cat.ops.resolveEntries(dir, m2)
    val keptPaths = before.map(_.path).toSet.intersect(after.map(_.path).toSet)
    assert(keptPaths.nonEmpty, "stat-pruned files should be kept, not rewritten")
    assert(after.filter(e => keptPaths(e.path)).forall(_.stats.nonEmpty))

    // pre-delete snapshot still fully readable
    val prev = m2.snapshots.sortBy(_.sequenceNumber).dropRight(1).last
    assert(spark.sql(s"SELECT count(*) FROM graft.dml.del VERSION AS OF ${prev.snapshotId}")
      .collect().head.getLong(0) == 4000)
    assert(m2.currentSnapshot.get.operation == "delete")
  }

  test("DELETE with a provably-empty match is a metadata no-op") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.noop (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    spark.range(0, 100).selectExpr("id", "id % 2 AS day")
      .write.mode("append").saveAsTable("graft.dml.noop")
    val dir = new Path(s"$warehouse/dml/noop")
    val snapsBefore = cat.ops.load(dir).get._2.snapshots.size
    spark.sql("DELETE FROM graft.dml.noop WHERE day = 99")
    assert(cat.ops.load(dir).get._2.snapshots.size == snapsBefore, "no new snapshot")
    assert(spark.sql("SELECT count(*) FROM graft.dml.noop").collect().head.getLong(0) == 100)
  }

  test("compact rewrites the snapshot into fewer files, data unchanged") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.cmp (id BIGINT)")
    (1 to 5).foreach(i => spark.sql(s"INSERT INTO graft.dml.cmp VALUES ($i)"))
    val dir = new Path(s"$warehouse/dml/cmp")
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(before.size == 5)
    cat.ops.compact(spark, dir, numFiles = 1)
    val after = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(after.size == 1)
    assert(spark.sql("SELECT sum(id) FROM graft.dml.cmp").collect().head.getLong(0) == 15)
    // old files now orphanable after snapshot expiration
    cat.ops.expireSnapshots(dir, Long.MaxValue, retainLast = 1)
    val removed = cat.ops.removeOrphanFiles(dir, graceMs = 0L)
    assert(removed.size == 5, s"expected 5 pre-compaction files orphaned, got ${removed.size}")
    assert(spark.sql("SELECT sum(id) FROM graft.dml.cmp").collect().head.getLong(0) == 15)
  }

  test("upsert replaces matching keys, appends the rest, prunes by stats") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.ups (id BIGINT, v STRING, grp BIGINT) PARTITIONED BY (grp) " +
      "TBLPROPERTIES ('graft.write.target-file-count'='4')")
    spark.range(0, 400).selectExpr("id", "CAST(id AS STRING) AS v", "id % 4 AS grp")
      .write.mode("append").saveAsTable("graft.dml.ups")
    val dir = new Path(s"$warehouse/dml/ups")
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)

    import spark.implicits._
    // update ids 10..12, insert 1000 (ids cluster low → stat pruning applies)
    val src = Seq((10L, "X", 2L), (11L, "Y", 3L), (1000L, "NEW", 0L))
      .toDF("id", "v", "grp")
    cat.ops.upsert(spark, dir, src, Seq("id"))

    assert(spark.sql("SELECT count(*) FROM graft.dml.ups").collect().head.getLong(0) == 401)
    val updated = spark.sql("SELECT v FROM graft.dml.ups WHERE id IN (10, 11, 1000) ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(updated == Seq("X", "Y", "NEW"))
    assert(spark.sql("SELECT v FROM graft.dml.ups WHERE id = 12").collect().head.getString(0) == "12")

    val (_, m2) = cat.ops.load(dir).get
    assert(m2.currentSnapshot.get.operation == "upsert")
    // pre-upsert state still time-travelable
    val prev = m2.snapshots.sortBy(_.sequenceNumber).dropRight(1).last
    assert(spark.sql(s"SELECT v FROM graft.dml.ups VERSION AS OF ${prev.snapshotId} WHERE id = 10")
      .collect().head.getString(0) == "10")
  }

  test("readCatalogAppends streams new table files incrementally") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.cdc (v BIGINT)")
    val dir = new Path(s"$warehouse/dml/cdc")
    spark.sql("INSERT INTO graft.dml.cdc VALUES (1)")

    val q = graft.streaming.Streams.readCatalogAppends(spark, cat.ops, dir)
      .writeStream.format("memory").queryName("cdc_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cdc-").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM cdc_out").collect().head.getLong(0) == 1)
      spark.sql("INSERT INTO graft.dml.cdc VALUES (2), (3)")
      q.processAllAvailable()
      assert(spark.sql("SELECT sum(v) FROM cdc_out").collect().head.getLong(0) == 6,
        "new appends must arrive incrementally")
    } finally q.stop()
  }

  test("_file metadata column maps rows to their manifest data files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.fcol (id BIGINT)")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO graft.dml.fcol VALUES ($i), (${i * 10})"))

    val byFile = spark.sql(
      "SELECT _file, count(*) AS n, sum(id) AS s FROM graft.dml.fcol GROUP BY _file")
      .collect()
    assert(byFile.length >= 3, "at least one _file group per insert")
    assert(byFile.map(_.getLong(1)).sum == 6, "every row tagged exactly once")
    assert(byFile.map(_.getLong(2)).sum == 3 + 30 + 2 + 20 + 1 + 10)

    // _file values are exactly the manifest's data files
    val dir = new Path(s"$warehouse/dml/fcol")
    val manifest = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .map(e => new Path(e.path).toUri.getPath).toSet
    val reported = byFile.map(r => new Path(r.getString(0)).toUri.getPath).toSet
    assert(reported == manifest, s"reported=$reported manifest=$manifest")

    // mixing data + metadata columns and filtering on _file both work
    val first = byFile.head
    val n = spark.sql(
      s"SELECT id FROM graft.dml.fcol WHERE _file LIKE '%${new Path(first.getString(0)).getName}'")
      .collect().length
    assert(n == first.getLong(1))
  }

  test("readStream.table streams committed snapshot deltas, skips rewrites") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.snapstream (v BIGINT)")
    spark.sql("INSERT INTO graft.dml.snapstream VALUES (1), (2)")

    val q = spark.readStream.table("graft.dml.snapstream")
      .writeStream.format("memory").queryName("snap_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-snapstream-").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT sum(v) FROM snap_out").collect().head.getLong(0) == 3)

      spark.sql("INSERT INTO graft.dml.snapstream VALUES (3)")
      q.processAllAvailable()
      assert(spark.sql("SELECT sum(v) FROM snap_out").collect().head.getLong(0) == 6,
        "appends must arrive incrementally")

      // rewrite snapshots are skipped: the stream is an append-only changelog
      spark.sql("UPDATE graft.dml.snapstream SET v = 100 WHERE v = 1")
      q.processAllAvailable()
      assert(spark.sql("SELECT sum(v) FROM snap_out").collect().head.getLong(0) == 6,
        "overwrite snapshots must not re-deliver rows")

      spark.sql("INSERT INTO graft.dml.snapstream VALUES (4)")
      q.processAllAvailable()
      assert(spark.sql("SELECT sum(v) FROM snap_out").collect().head.getLong(0) == 10,
        "appends after a rewrite must still arrive")
    } finally q.stop()
  }

  test("max-files-per-trigger paces a backlogged stream over batches") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.paced (v BIGINT)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO graft.dml.paced VALUES ($i)"))

    var batches = 0
    val q = spark.readStream
      .option("max-files-per-trigger", "1")
      .table("graft.dml.paced")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) batches += 1; ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-paced-").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(batches >= 4, s"4 one-file snapshots at 1 file/trigger need >=4 batches, got $batches")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog in paced batches, then stops") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.avnow (v BIGINT)")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO graft.dml.avnow VALUES ($i)"))

    var batches = 0
    val seen = scala.collection.mutable.Set[Long]()
    val q = spark.readStream
      .option("max-files-per-trigger", "1")
      .table("graft.dml.avnow")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = batch.collect().map(_.getLong(0))
        if (vs.nonEmpty) { batches += 1; seen ++= vs }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-avnow-").toString)
      .start()
    // the query must terminate by itself after draining the pinned backlog
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    assert(seen == Set(1L, 2L, 3L), s"backlog fully drained, got $seen")
    assert(batches >= 3, s"pacing must still apply under AvailableNow, got $batches")
  }

  test("SQL UPDATE and MERGE INTO via row-level operations") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.rlo (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.rlo VALUES (1,'a'), (2,'b'), (3,'c')")

    spark.sql("UPDATE graft.dml.rlo SET v = 'Z' WHERE id = 2")
    assert(spark.sql("SELECT v FROM graft.dml.rlo ORDER BY id").collect().map(_.getString(0)).toSeq
      == Seq("a", "Z", "c"))

    spark.sql("CREATE TABLE graft.dml.rlo_src (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.rlo_src VALUES (3,'merged'), (4,'new')")
    spark.sql("""MERGE INTO graft.dml.rlo t USING graft.dml.rlo_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT v FROM graft.dml.rlo ORDER BY id").collect().map(_.getString(0)).toSeq
      == Seq("a", "Z", "merged", "new"))

    // pre-update state remains time-travelable
    val dir = new Path(s"$warehouse/dml/rlo")
    val (_, meta) = cat.ops.load(dir).get
    val first = meta.snapshots.minBy(_.sequenceNumber)
    assert(spark.sql(s"SELECT v FROM graft.dml.rlo VERSION AS OF ${first.snapshotId} WHERE id = 2")
      .collect().head.getString(0) == "b")
    // MERGE with a WHEN NOT MATCHED BY SOURCE clause
    spark.sql("""MERGE INTO graft.dml.rlo t USING graft.dml.rlo_src s ON t.id = s.id
                 WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(spark.sql("SELECT id FROM graft.dml.rlo ORDER BY id").collect().map(_.getLong(0)).toSeq
      == Seq(3L, 4L))
  }

  test("SQL UPDATE/MERGE/DELETE route merge-on-read when the table property asks") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("""CREATE TABLE graft.dml.morsql (id BIGINT, day BIGINT, v STRING)
                 TBLPROPERTIES ('write.update.mode'='merge-on-read',
                                'write.merge.mode'='merge-on-read',
                                'write.delete.mode'='merge-on-read',
                                'graft.write.target-file-count'='4')""")
    spark.range(0, 4000).selectExpr("id", "id % 4 AS day", "CAST(id AS STRING) AS v")
      .write.mode("append").saveAsTable("graft.dml.morsql")
    val dir = new Path(s"$warehouse/dml/morsql")
    val dataBefore = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .filter(_.isData).map(_.path).toSet
    val seqBefore = cat.ops.load(dir).get._2.lastSequenceNumber

    // ---- UPDATE: DV + appended images, ZERO data-file rewrite ----
    spark.sql("UPDATE graft.dml.morsql SET v = 'HIT' WHERE day = 2 AND id < 1000")
    assert(spark.sql("SELECT count(*) FROM graft.dml.morsql").collect().head.getLong(0) == 4000)
    assert(spark.sql("SELECT count(*) FROM graft.dml.morsql WHERE v = 'HIT'")
      .collect().head.getLong(0) == 250)
    assert(spark.sql("SELECT v FROM graft.dml.morsql WHERE id = 3")
      .collect().head.getString(0) == "3")
    val m2 = cat.ops.load(dir).get._2
    val after = cat.ops.resolveEntries(dir, m2)
    // every pre-update data file still referenced — nothing was rewritten
    assert(dataBefore.subsetOf(after.filter(_.isData).map(_.path).toSet),
      "merge-on-read UPDATE must not rewrite data files")
    assert(after.exists(_.isDvDelete), "a deletion-vector entry must be pending")
    assert(m2.snapshots.maxBy(_.sequenceNumber).operation == "mor-update")
    // CDC: the commit reads as row-level delete+insert pairs
    val feed = cat.ops.changes(spark, dir, seqBefore, Long.MaxValue).collect()
    val dels = feed.filter(_.getAs[String]("_change_type") == "delete")
    val ins = feed.filter(_.getAs[String]("_change_type") == "insert")
    assert(dels.length == 250 && ins.length == 250, s"got ${dels.length}/${ins.length}")
    assert(ins.forall(_.getAs[String]("v") == "HIT"))
    assert(dels.forall(_.getAs[String]("v") != "HIT"))
    // pre-update snapshot still readable without the DV
    val first = m2.snapshots.minBy(_.sequenceNumber)
    assert(spark.sql(
      s"SELECT count(*) FROM graft.dml.morsql VERSION AS OF ${first.snapshotId} WHERE v = 'HIT'")
      .collect().head.getLong(0) == 0)

    // ---- MERGE: matched update + not-matched insert, one MOR commit ----
    spark.sql("CREATE TABLE graft.dml.morsql_src (id BIGINT, day BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.morsql_src VALUES (1, 1, 'M'), (9999, 3, 'NEW')")
    spark.sql("""MERGE INTO graft.dml.morsql t USING graft.dml.morsql_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT v FROM graft.dml.morsql WHERE id = 1")
      .collect().head.getString(0) == "M")
    assert(spark.sql("SELECT v FROM graft.dml.morsql WHERE id = 9999")
      .collect().head.getString(0) == "NEW")
    assert(spark.sql("SELECT count(*) FROM graft.dml.morsql").collect().head.getLong(0) == 4001)
    val m3 = cat.ops.load(dir).get._2
    assert(m3.snapshots.maxBy(_.sequenceNumber).operation == "mor-update")
    assert(dataBefore.subsetOf(cat.ops.resolveEntries(dir, m3)
      .filter(_.isData).map(_.path).toSet), "merge-on-read MERGE must not rewrite data files")

    // ---- DELETE: DV-only commit, no rewrite ----
    spark.sql("DELETE FROM graft.dml.morsql WHERE id = 5")
    assert(spark.sql("SELECT count(*) FROM graft.dml.morsql").collect().head.getLong(0) == 4000)
    assert(spark.sql("SELECT count(*) FROM graft.dml.morsql WHERE id = 5")
      .collect().head.getLong(0) == 0)
    val m4 = cat.ops.load(dir).get._2
    assert(m4.snapshots.maxBy(_.sequenceNumber).operation == "dv-delete")
    assert(dataBefore.subsetOf(cat.ops.resolveEntries(dir, m4)
      .filter(_.isData).map(_.path).toSet), "merge-on-read DELETE must not rewrite data files")

    // vectorize-compaction composes: pending DVs collapse to one per file
    cat.ops.vectorizeDeletes(spark, dir)
    assert(spark.sql("SELECT count(*) FROM graft.dml.morsql").collect().head.getLong(0) == 4000)
    assert(spark.sql("SELECT count(*) FROM graft.dml.morsql WHERE v = 'HIT'")
      .collect().head.getLong(0) == 250)

    // MERGE's NOT MATCHED BY SOURCE DELETE also rides the delta path:
    // ids 0..9 minus the matched id 1 and the already-dead id 5 → 8 rows
    spark.sql("""MERGE INTO graft.dml.morsql t USING graft.dml.morsql_src s ON t.id = s.id
                 WHEN NOT MATCHED BY SOURCE AND t.id < 10 THEN DELETE""")
    assert(spark.sql("SELECT count(*) FROM graft.dml.morsql").collect().head.getLong(0) == 3992)
    assert(spark.sql("SELECT count(*) FROM graft.dml.morsql WHERE id < 10")
      .collect().head.getLong(0) == 1) // only the matched id 1 survives
    val m5 = cat.ops.load(dir).get._2
    assert(m5.snapshots.maxBy(_.sequenceNumber).operation == "mor-update")
    assert(dataBefore.subsetOf(cat.ops.resolveEntries(dir, m5)
      .filter(_.isData).map(_.path).toSet), "delta MERGE DELETE must not rewrite data files")
  }

  test("concurrent merge-on-read updates never duplicate a row (lost-update guard)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("""CREATE TABLE graft.dml.morconc (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.update.mode'='merge-on-read')""")
    spark.range(0, 1000).selectExpr("id", "'x' AS v")
      .write.mode("append").saveAsTable("graft.dml.morconc")

    // two updates of the SAME rows race from (close to) the same
    // snapshot: without the conflict guard both would DV the old rows
    // and BOTH would append images — a duplicated row
    val latch = new java.util.concurrent.CountDownLatch(2)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = Seq("A", "B").map { tag =>
      Future {
        latch.countDown(); latch.await()
        scala.util.Try(
          spark.sql(s"UPDATE graft.dml.morconc SET v = '$tag' WHERE id % 10 = 3"))
      }
    }
    val outcomes = runs.map(f =>
      Await.result(f, scala.concurrent.duration.Duration(120, "s")))
    assert(outcomes.exists(_.isSuccess), s"at least one update must win: $outcomes")
    outcomes.filter(_.isFailure).foreach { t =>
      val msg = t.failed.get.getMessage + t.failed.get.getCause
      assert(msg.contains("concurrent") || msg.contains("rerun"),
        s"loser must fail with the conflict message, got: $msg")
    }
    // the invariant that matters, under EVERY interleaving: no row is
    // ever duplicated or lost, and the matched set carries exactly one
    // winner's image
    assert(spark.sql("SELECT count(*) FROM graft.dml.morconc").collect().head.getLong(0) == 1000)
    assert(spark.sql(
      "SELECT max(c) FROM (SELECT id, count(*) AS c FROM graft.dml.morconc GROUP BY id)")
      .collect().head.getLong(0) == 1L, "no duplicated row identity")
    val vs = spark.sql(
      "SELECT DISTINCT v FROM graft.dml.morconc WHERE id % 10 = 3")
      .collect().map(_.getString(0)).toSet
    assert(vs.size == 1 && (vs.head == "A" || vs.head == "B"),
      s"matched rows carry exactly one winner's image: $vs")
  }

  test("delete-only MOR commit pinned before a concurrent update aborts (lost-delete guard)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("""CREATE TABLE graft.dml.morlostdel (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.update.mode'='merge-on-read',
                                'write.delete.mode'='merge-on-read')""")
    spark.range(0, 100).selectExpr("id", "'x' AS v")
      .write.mode("append").saveAsTable("graft.dml.morlostdel")
    val dir = new Path(s"$warehouse/dml/morlostdel")

    // a DELETE "scans" here: pins the snapshot and computes its DV
    val pinned = cat.ops.load(dir).get._2
    val pinnedFiles = cat.ops.resolveEntries(dir, pinned)
      .filter(_.isData).map(_.path)
    val bm = new org.roaringbitmap.longlong.Roaring64NavigableMap()
    bm.addLong(0L)

    // ...but a MOR UPDATE of the same rows commits FIRST: its images
    // re-append rows the pinned DELETE meant to kill
    spark.sql("UPDATE graft.dml.morlostdel SET v = 'upd' WHERE id < 10")

    // the stale delete-only commit must abort, not silently mask only
    // the old coordinates while the update's images survive
    val e = intercept[graft.catalog.CommitFailedException] {
      cat.ops.commitMorDelta(spark, dir, Seq(pinnedFiles.head -> bm),
        Seq.empty, "dv-delete", pinnedFiles.toSet, pinned.lastSequenceNumber)
    }
    assert(e.getMessage.contains("concurrent"), e.getMessage)

    // plain appends still commute with a pinned delete (sequence rule
    // protects newer rows; no delete entries are introduced)
    spark.sql("CREATE TABLE graft.dml.morappdel (id BIGINT, v STRING)")
    spark.range(0, 100).selectExpr("id", "'x' AS v")
      .write.mode("append").saveAsTable("graft.dml.morappdel")
    val dir2 = new Path(s"$warehouse/dml/morappdel")
    val pinned2 = cat.ops.load(dir2).get._2
    val files2 = cat.ops.resolveEntries(dir2, pinned2).filter(_.isData).map(_.path)
    spark.range(100, 200).selectExpr("id", "'y' AS v")
      .write.mode("append").saveAsTable("graft.dml.morappdel")
    val bm2 = new org.roaringbitmap.longlong.Roaring64NavigableMap()
    bm2.addLong(0L)
    cat.ops.commitMorDelta(spark, dir2, Seq(files2.head -> bm2),
      Seq.empty, "dv-delete", files2.toSet, pinned2.lastSequenceNumber)
    assert(spark.sql("SELECT count(*) FROM graft.dml.morappdel")
      .collect().head.getLong(0) == 199)
  }

  test("merge-on-read SQL UPDATE on a bucket table keeps __pt_ stats on the appended images") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("""CREATE TABLE graft.dml.morbk (k BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(8, k))
                 TBLPROPERTIES ('write.update.mode'='merge-on-read')""")
    val dir = new Path(s"$warehouse/dml/morbk")
    import spark.implicits._
    cat.ops.write(dir, (0L until 4000L).map(i => (i % 200L, i * 0.25)).toDF("k", "v"),
      "append", numFiles = Some(8))
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .filter(_.isData).map(_.path).toSet

    spark.sql("UPDATE graft.dml.morbk SET v = -1.0 WHERE k = 7")
    val after = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(before.subsetOf(after.filter(_.isData).map(_.path).toSet))
    val images = after.filter(e => e.isData && !before.contains(e.path))
    assert(images.nonEmpty, "updated images appended as new files")
    assert(images.forall(_.stats.contains("__pt_k")),
      s"image files must carry bucket stats: ${images.map(_.stats.keySet)}")
    // correctness through the DV + images, and bucket pruning still live
    assert(spark.sql("SELECT count(*) FROM graft.dml.morbk WHERE k = 7 AND v = -1.0")
      .collect().head.getLong(0) == 20L)
    assert(spark.sql("SELECT count(*) FROM graft.dml.morbk").collect().head.getLong(0) == 4000L)
  }

  test("merge-on-read SQL UPDATE composes with schema evolution and ORC tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    // evolution: files written before ADD COLUMN update cleanly —
    // images land in the CURRENT schema, defaults fill the old rows
    spark.sql("""CREATE TABLE graft.dml.morevo (id BIGINT, v STRING)
                 TBLPROPERTIES ('write.update.mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.dml.morevo VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("ALTER TABLE graft.dml.morevo ADD COLUMN flag INT DEFAULT 7")
    spark.sql("INSERT INTO graft.dml.morevo VALUES (4,'d', 9)")
    spark.sql("UPDATE graft.dml.morevo SET v = 'Z' WHERE id IN (2, 4)")
    val rows = spark.sql("SELECT id, v, flag FROM graft.dml.morevo ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((1L,"a",7), (2L,"Z",7), (3L,"c",7), (4L,"Z",9)), rows.toString)
    val dir = new Path(s"$warehouse/dml/morevo")
    assert(cat.ops.load(dir).get._2.snapshots
      .maxBy(_.sequenceNumber).operation == "mor-update")

    // ORC data format: images append as ORC, DV files stay parquet
    spark.sql("""CREATE TABLE graft.dml.mororc (id BIGINT, v STRING)
                 TBLPROPERTIES ('graft.format'='orc',
                                'write.update.mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.dml.mororc VALUES (1,'a'), (2,'b')")
    spark.sql("UPDATE graft.dml.mororc SET v = 'Z' WHERE id = 2")
    assert(spark.sql("SELECT v FROM graft.dml.mororc ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("a", "Z"))
    val odir = new Path(s"$warehouse/dml/mororc")
    val entries = cat.ops.resolveEntries(odir, cat.ops.load(odir).get._2)
    assert(entries.filter(_.isData).forall(_.path.endsWith(".orc")))
    assert(entries.filter(_.isDvDelete).forall(_.path.endsWith(".parquet")))
  }

  test("UPDATE rewrites only possibly-affected files (file-granular COW)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.upd (id BIGINT, day BIGINT, v STRING) PARTITIONED BY (day) " +
      "TBLPROPERTIES ('graft.write.target-file-count'='4')")
    spark.range(0, 4000).selectExpr("id", "id % 4 AS day", "CAST(id AS STRING) AS v")
      .write.mode("append").saveAsTable("graft.dml.upd")
    val dir = new Path(s"$warehouse/dml/upd")
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(before.size >= 2)

    spark.sql("UPDATE graft.dml.upd SET v = 'HIT' WHERE day = 2 AND id < 1000")

    // semantics: matched rows updated, unmatched rows of affected files intact
    assert(spark.sql("SELECT count(*) FROM graft.dml.upd").collect().head.getLong(0) == 4000)
    assert(spark.sql("SELECT count(*) FROM graft.dml.upd WHERE v = 'HIT'")
      .collect().head.getLong(0) == 250)
    assert(spark.sql("SELECT v FROM graft.dml.upd WHERE id = 3").collect().head.getString(0) == "3")
    assert(spark.sql("SELECT v FROM graft.dml.upd WHERE id = 1002").collect().head.getString(0) == "1002")

    // file granularity: provably-unmatched files kept verbatim with stats
    val (_, m2) = cat.ops.load(dir).get
    val after = cat.ops.resolveEntries(dir, m2)
    val keptPaths = before.map(_.path).toSet.intersect(after.map(_.path).toSet)
    assert(keptPaths.nonEmpty, "stat-pruned files should be kept, not rewritten")
    // non-empty kept files keep their stats; empty files (no stats to
    // begin with) may be kept by the runtime group filter
    val statless = after.filter(e => keptPaths(e.path))
      .filter(e => e.stats.isEmpty && e.rows.exists(_ > 0))
    assert(statless.isEmpty, s"kept entries lost stats: ${statless.map(_.path)}")

    // pre-update snapshot still fully readable
    val prev = m2.snapshots.sortBy(_.sequenceNumber).dropRight(1).last
    assert(spark.sql(s"SELECT count(*) FROM graft.dml.upd VERSION AS OF ${prev.snapshotId} WHERE v = 'HIT'")
      .collect().head.getLong(0) == 0)
  }

  test("MERGE keeps unmatched files via runtime group filtering") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.rtm (id BIGINT, day BIGINT, v STRING) PARTITIONED BY (day) " +
      "TBLPROPERTIES ('graft.write.target-file-count'='4')")
    spark.range(0, 4000).selectExpr("id", "id % 4 AS day", "CAST(id AS STRING) AS v")
      .write.mode("append").saveAsTable("graft.dml.rtm")
    val dir = new Path(s"$warehouse/dml/rtm")
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(before.size >= 2)

    // the MERGE condition (t.id = s.id) has no literals, so static
    // stats pruning cannot narrow anything — only the runtime _file
    // subquery can. Source touches a single day partition.
    spark.sql("CREATE TABLE graft.dml.rtm_src (id BIGINT, day BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.rtm_src VALUES (2, 2, 'M'), (6, 2, 'M'), (99990, 2, 'NEW')")
    spark.sql("""MERGE INTO graft.dml.rtm t USING graft.dml.rtm_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")

    assert(spark.sql("SELECT count(*) FROM graft.dml.rtm").collect().head.getLong(0) == 4001)
    assert(spark.sql("SELECT v FROM graft.dml.rtm WHERE id IN (2, 6, 99990) ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("M", "M", "NEW"))
    assert(spark.sql("SELECT v FROM graft.dml.rtm WHERE id = 10").collect().head.getString(0) == "10")

    val after = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    val keptPaths = before.map(_.path).toSet.intersect(after.map(_.path).toSet)
    assert(keptPaths.nonEmpty,
      "runtime group filtering must keep files the matching-rows subquery excludes")
  }

  test("TRUNCATE TABLE empties the table but keeps history") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.trunc (id BIGINT)")
    spark.sql("INSERT INTO graft.dml.trunc VALUES (1), (2)")
    spark.sql("TRUNCATE TABLE graft.dml.trunc")
    assert(spark.sql("SELECT count(*) FROM graft.dml.trunc").collect().head.getLong(0) == 0)
    val dir = new Path(s"$warehouse/dml/trunc")
    val (_, meta) = cat.ops.load(dir).get
    val first = meta.snapshots.minBy(_.sequenceNumber)
    assert(spark.sql(s"SELECT count(*) FROM graft.dml.trunc VERSION AS OF ${first.snapshotId}")
      .collect().head.getLong(0) == 2)
    spark.sql("INSERT INTO graft.dml.trunc VALUES (9)")
    assert(spark.sql("SELECT sum(id) FROM graft.dml.trunc").collect().head.getLong(0) == 9)
  }

  test("changes() derives a row-level changelog from snapshot diffs") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.cdcfeed (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.cdcfeed VALUES (1, 'a'), (2, 'b')")   // seq 1
    spark.sql("UPDATE graft.dml.cdcfeed SET v = 'B' WHERE id = 2")         // seq 2 (rewrite)
    val dir = new Path(s"$warehouse/dml/cdcfeed")
    cat.ops.compact(spark, dir, numFiles = 1)                              // seq 3 (no-op churn)
    spark.sql("INSERT INTO graft.dml.cdcfeed VALUES (3, 'c')")             // seq 4

    val feed = cat.ops.changes(spark, dir, 0L, Long.MaxValue)
      .collect()
      .map(r => (r.getLong(3), r.getString(2), r.getLong(0), r.getString(1)))
      .sortBy(t => (t._1, t._2, t._3))
      .toSeq
    assert(feed == Seq(
      (1L, "insert", 1L, "a"),
      (1L, "insert", 2L, "b"),
      (2L, "delete", 2L, "b"),   // update = delete(old) + insert(new)
      (2L, "insert", 2L, "B"),
      // seq 3 compaction nets to zero changes
      (4L, "insert", 3L, "c")
    ).sortBy(t => (t._1, t._2, t._3)))

    // windowed read: only the last commit
    val tail = cat.ops.changes(spark, dir, 3L, Long.MaxValue).collect()
    assert(tail.map(r => (r.getString(2), r.getLong(0))).toSeq == Seq(("insert", 3L)))
  }

  test("IVF ANN achieves >=0.5 recall@5 vs brute force") {
    val exact = Vectors.annBruteforceTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Vectors.annIvfTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
  }
}
