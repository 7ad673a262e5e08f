package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** C64 — incremental CDC replication: replica converges with the
  * source under inserts, SQL UPDATE/DELETE churn, MOR deletes,
  * duplicate rows, and crash-replayed windows; sync cost is
  * changelog-sized (no data-file rewrites on the replica path). */
class ReplicationSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  private def rows(dir: Path): Seq[(Long, String)] =
    cat.ops.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("replica converges under insert/update/delete churn and replays safely") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.repl")
    spark.sql("CREATE TABLE graft.repl.src (k BIGINT, v STRING)")
    val srcDir = new Path(s"$warehouse/repl/src")
    val dstDir = new Path(s"$warehouse/repl/dst")
    def sync() = Replication.replicate(spark, cat.ops, srcDir, dstDir, Seq("k"))

    // initial window: plain inserts, including two IDENTICAL rows
    spark.sql("INSERT INTO graft.repl.src VALUES (1, 'a'), (2, 'b'), (3, 'c'), (3, 'c')")
    sync()
    assert(rows(dstDir) == rows(srcDir))
    assert(rows(dstDir).count(_ == (3L, "c")) == 2, "duplicate rows replicate faithfully")

    // update + delete in one window
    spark.sql("UPDATE graft.repl.src SET v = 'a2' WHERE k = 1")
    spark.sql("DELETE FROM graft.repl.src WHERE k = 2")
    sync()
    assert(rows(dstDir) == rows(srcDir))
    assert(rows(dstDir).contains((1L, "a2")) && !rows(dstDir).exists(_._1 == 2L))

    // a MOR equality delete on the source flows through its changelog
    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, srcDir, Seq(3L).toDF("k"))
    spark.sql("INSERT INTO graft.repl.src VALUES (4, 'd')")
    sync()
    assert(rows(dstDir) == rows(srcDir))

    // idempotent when nothing changed: no new snapshot
    val snapsBefore = cat.ops.load(dstDir).get._2.snapshots.size
    sync()
    assert(cat.ops.load(dstDir).get._2.snapshots.size == snapsBefore)

    // crash-replay: lose the watermark (as if we died before the
    // watermark commit) and re-apply the whole window — the replayed
    // delete masks the half-applied append, so no duplicates appear
    val (_, m) = cat.ops.load(dstDir).get
    val prevSeq = "0"
    cat.ops.commit(dstDir,
      Seq(Requirement.AssertRefSnapshotId("main", m.currentSnapshot.map(_.snapshotId))),
      Seq(MetadataUpdate.SetProperties(Map("graft.repl.last-seq" -> prevSeq))))
    sync()
    assert(rows(dstDir) == rows(srcDir), "replayed window must converge, not duplicate")
    assert(rows(dstDir).count(_ == (3L, "c")) == 0)

    // replica sync path never rewrote data files: appends + deletes only
    val ops = cat.ops.load(dstDir).get._2.snapshots.map(_.operation).toSet
    assert(!ops.contains("overwrite"), s"sync path must not rewrite: $ops")

    // maintenance composes: delete-file compaction + full materialize
    cat.ops.compactDeletes(spark, dstDir)
    assert(rows(dstDir) == rows(srcDir))
    cat.ops.applyDeletes(spark, dstDir)
    assert(rows(dstDir) == rows(srcDir))
  }
}
