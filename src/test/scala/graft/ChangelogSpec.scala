package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** `<table>$changes` — the catalog-served file-granular CDC view:
  * batch windows via from-seq/to-seq, streaming via readStream.table
  * with sequence-number offsets. */
class ChangelogSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  test("metadata tables: $snapshots/$history/$refs/$files/$partitions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.metat")
    spark.sql("CREATE TABLE graft.metat.t (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    val dir = new Path(s"$warehouse/metat/t")
    spark.sql("INSERT INTO graft.metat.t SELECT id, 0 FROM range(0, 10)")
    spark.sql("INSERT INTO graft.metat.t SELECT id, 1 FROM range(0, 20)")
    cat.ops.commit(dir, Seq.empty, Seq(MetadataUpdate.SetSnapshotRef(
      "audit", cat.ops.load(dir).get._2.currentSnapshotId.get, "tag")))

    val snaps = spark.sql(
      "SELECT snapshot_id, operation, is_current FROM graft.metat.`t$snapshots` ORDER BY sequence_number")
      .collect()
    assert(snaps.length == 2 && snaps.forall(_.getString(1) == "append"))
    assert(!snaps.head.getBoolean(2) && snaps.last.getBoolean(2))

    val hist = spark.sql(
      "SELECT snapshot_id, is_current_ancestor FROM graft.metat.`t$history`").collect()
    assert(hist.length == 2 && hist.forall(_.getBoolean(1)))

    val refs = spark.sql(
      "SELECT name, type FROM graft.metat.`t$refs` ORDER BY name").collect()
    assert(refs.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("audit", "tag"), ("main", "branch")))

    val files = spark.sql(
      """SELECT file_path, record_count, sequence_number, lower_bounds['id'], upper_bounds['id']
         FROM graft.metat.`t$files` ORDER BY file_path""").collect()
    assert(files.nonEmpty && files.forall(_.getLong(1) > 0))
    assert(files.forall(r => r.getString(3) != null && r.getString(4) != null),
      "manifest min/max must surface in bounds maps")

    val parts = spark.sql(
      """SELECT partition, file_count, record_count FROM graft.metat.`t$partitions`
         ORDER BY partition""").collect()
    assert(parts.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      Seq(("day=0", 10L), ("day=1", 20L)), parts.mkString(", "))

    // metadata views plan as LocalScan — no data files are opened
    val plan = spark.sql("SELECT * FROM graft.metat.`t$files`")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan.take(400))

    // C68: $manifests exposes the segment tree (C66) — one row per
    // segment in chain order, rollups consistent with $files
    val mans = spark.sql(
      """SELECT segment, position, n_entries, n_data_files, n_delete_files, max_seq
         FROM graft.metat.`t$manifests` ORDER BY position""").collect()
    assert(mans.length == 2, s"two append segments expected: ${mans.mkString(", ")}")
    assert(mans.map(_.getLong(2)).sum == files.length,
      "segment entry rollup must equal the file inventory")
    assert(mans.forall(_.getLong(4) == 0L))
    assert(mans.map(_.getLong(5)).toSeq == Seq(1L, 2L),
      "per-segment max_seq follows the commit order")
  }

  test("netChanges collapses intermediate churn to the applyable delta") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdc")
    spark.sql("CREATE TABLE graft.cdc.net (id BIGINT, v DOUBLE)")
    val dir = new Path(s"$warehouse/cdc/net")
    spark.sql("INSERT INTO graft.cdc.net VALUES (1, 1.0), (2, 2.0)")
    // churn inside the window: 3 inserted AND deleted → nets away;
    // 2 updated → net = delete old + insert new; 1 untouched after
    // a delete+reinsert of the same row → nets away entirely
    spark.sql("INSERT INTO graft.cdc.net VALUES (3, 3.0)")
    spark.sql("DELETE FROM graft.cdc.net WHERE id = 3")
    spark.sql("UPDATE graft.cdc.net SET v = 20.0 WHERE id = 2")
    spark.sql("DELETE FROM graft.cdc.net WHERE id = 1")
    spark.sql("INSERT INTO graft.cdc.net VALUES (1, 1.0)")

    val raw = cat.ops.changes(spark, dir, 0L, Long.MaxValue)
    assert(raw.count() > 4, "raw feed reports the intermediate churn")

    // from an empty start, the net delta IS the current table content:
    // (2,2.0) and (3,3.0) were both born and killed inside the window
    val net = cat.ops.netChanges(spark, dir, 0L, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(net.toSeq == Seq(
      (1L, 1.0, "insert", 1L),
      (2L, 20.0, "insert", 1L)), net.mkString(", "))

    // windows that start AFTER the initial load net only the tail
    val (_, m) = cat.ops.load(dir).get
    val firstSeq = m.snapshots.map(_.sequenceNumber).min
    val tail = cat.ops.netChanges(spark, dir, firstSeq, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(tail.toSeq == Seq((2L, 2.0, "delete"), (2L, 20.0, "insert")),
      tail.mkString(", "))
  }

  test("batch $changes serves the file diff feed with seq windows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    spark.sql("CREATE TABLE graft.cl.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.cl.t VALUES (1,'a'), (2,'b')")   // seq 1
    spark.sql("INSERT INTO graft.cl.t VALUES (3,'c')")            // seq 2
    spark.sql("UPDATE graft.cl.t SET v = 'B' WHERE id = 2")       // seq 3 (rewrite)

    val full = spark.read.table("graft.cl.`t$changes`").collect()
      .map(r => (r.getLong(3), r.getString(2), r.getLong(0), r.getString(1)))

    // seq 1+2: pure inserts
    assert(full.filter(_._1 == 1L).toSet ==
      Set((1L, "insert", 1L, "a"), (1L, "insert", 2L, "b")))
    assert(full.filter(_._1 == 2L).toSet == Set((2L, "insert", 3L, "c")))
    // seq 3 file-granular rewrite: the rewritten file's rows appear as
    // delete+insert pairs; unchanged rows in that file cancel under
    // aggregation (the documented non-netted contract)
    val s3 = full.filter(_._1 == 3L)
    assert(s3.count(_._2 == "delete") >= 1 && s3.count(_._2 == "insert") >= 1)
    assert(s3.contains((3L, "delete", 2L, "b")) && s3.contains((3L, "insert", 2L, "B")))
    // net effect of the whole feed reproduces the final state
    val net = full.groupBy(t => (t._3, t._4)).map { case (row, evs) =>
      row -> (evs.count(_._2 == "insert") - evs.count(_._2 == "delete"))
    }.filter(_._2 > 0).keys.toSet
    assert(net == Set((1L, "a"), (2L, "B"), (3L, "c")))

    // windowed batch read
    val win = spark.read.option("from-seq", "1").option("to-seq", "2")
      .table("graft.cl.`t$changes`").collect()
      .map(r => (r.getLong(3), r.getString(2), r.getLong(0)))
    assert(win.toSet == Set((2L, "insert", 3L)))
  }

  test("streaming $changes delivers committed diffs incrementally") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    spark.sql("CREATE TABLE graft.cl.s (id BIGINT)")
    spark.sql("INSERT INTO graft.cl.s VALUES (1), (2)")

    val q = spark.readStream.table("graft.cl.`s$changes`")
      .writeStream.format("memory").queryName("cl_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cl-").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM cl_out WHERE _change_type='insert'")
        .collect().head.getLong(0) == 2)

      spark.sql("INSERT INTO graft.cl.s VALUES (3)")
      q.processAllAvailable()
      assert(spark.sql("SELECT sum(id) FROM cl_out WHERE _change_type='insert'")
        .collect().head.getLong(0) == 6)

      // a rewrite arrives as delete+insert file pairs, tagged with its seq
      spark.sql("DELETE FROM graft.cl.s WHERE id = 1")
      q.processAllAvailable()
      val dels = spark.sql("SELECT id FROM cl_out WHERE _change_type='delete'")
        .collect().map(_.getLong(0)).toSet
      assert(dels.contains(1L), s"rewrite must surface deletes, got $dels")
    } finally q.stop()
  }

  test("C84 $properties and $constraints inspection tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    spark.sql("CREATE TABLE graft.cl.pc (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('graft.bloom.columns' = 'id', 'team' = 'data-eng')")
    spark.sql("INSERT INTO graft.cl.pc VALUES (1, 1.0)")
    spark.sql("ALTER TABLE graft.cl.pc ADD CONSTRAINT v_pos CHECK (v > 0)")

    val props = spark.sql("SELECT key, value FROM graft.cl.`pc$properties`")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(props("team") == "data-eng" && props("graft.bloom.columns") == "id", props.toString)

    val cons = spark.sql(
      "SELECT name, type, predicate, enforced, validation_status FROM graft.cl.`pc$constraints`")
      .collect()
    assert(cons.length == 1)
    assert(cons.head.getString(0) == "v_pos" && cons.head.getString(1) == "CHECK")
    assert(cons.head.getString(2).contains("v > 0") && cons.head.getBoolean(3))

    spark.sql("ALTER TABLE graft.cl.pc DROP CONSTRAINT v_pos")
    assert(spark.sql("SELECT * FROM graft.cl.`pc$constraints`").count() == 0)
  }
}
