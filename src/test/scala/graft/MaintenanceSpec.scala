package graft

import org.apache.hadoop.fs.Path

import graft.catalog._
import graft.streaming.Streams

/** Catalog maintenance + streaming sink: snapshot expiration, orphan
  * cleanup, table registration, stream → catalog table. */
class MaintenanceSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  test("expireSnapshots drops old snapshots but keeps refs and newest") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.exp (id BIGINT)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO graft.maint.exp VALUES ($i)"))
    val dir = new Path(s"$warehouse/maint/exp")
    val (_, m0) = cat.ops.load(dir).get
    assert(m0.snapshots.size == 4)
    val oldest = m0.snapshots.minBy(_.sequenceNumber)
    // tag the second snapshot so expiration must keep it
    val second = m0.snapshots.sortBy(_.sequenceNumber).apply(1)
    cat.ops.commit(dir, Seq.empty,
      Seq(MetadataUpdate.SetSnapshotRef("keepme", second.snapshotId, "tag")))

    val after = cat.ops.expireSnapshots(dir, olderThanMs = Long.MaxValue, retainLast = 1)
    val ids = after.snapshots.map(_.snapshotId).toSet
    assert(!ids.contains(oldest.snapshotId), "oldest should expire")
    assert(ids.contains(second.snapshotId), "ref target must survive")
    assert(ids.contains(m0.currentSnapshotId.get), "current must survive")
    // current data unaffected
    assert(spark.sql("SELECT count(*) FROM graft.maint.exp").collect().head.getLong(0) == 4)
  }

  test("rollbackTo rewinds main, keeps history, and CDC follows the new lineage") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.rb (id BIGINT)")
    val dir = new Path(s"$warehouse/maint/rb")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO graft.maint.rb VALUES ($i)"))
    val (_, m0) = cat.ops.load(dir).get
    val bySeq = m0.snapshots.sortBy(_.sequenceNumber)
    val target = bySeq(1) // after the second insert

    cat.ops.rollbackTo(dir, target.snapshotId)
    assert(spark.sql("SELECT sum(id) FROM graft.maint.rb").collect().head.getLong(0) == 3,
      "rows of commit 3 must be gone")
    val (_, m1) = cat.ops.load(dir).get
    assert(m1.currentSnapshotId.contains(target.snapshotId))
    assert(m1.snapshots.size == m0.snapshots.size, "rollback is metadata-only; history kept")

    // CDC walks the NEW lineage: the rolled-back commit never replays
    val feed = cat.ops.changes(spark, dir, 0L, Long.MaxValue)
    assert(feed.filter("id = 3").count() == 0)
    assert(feed.filter("_change_type = 'insert'").count() == 2)

    // a write after rollback forks cleanly from the rewound state
    spark.sql("INSERT INTO graft.maint.rb VALUES (10)")
    assert(spark.sql("SELECT sum(id) FROM graft.maint.rb").collect().head.getLong(0) == 13)

    // only main-lineage ancestors are valid targets
    val dropped = bySeq(2)
    intercept[CommitFailedException] { cat.ops.rollbackTo(dir, dropped.snapshotId) }
    intercept[CommitFailedException] { cat.ops.rollbackTo(dir, 424242L) }
  }

  test("removeOrphanFiles deletes only unreferenced parquet") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.orph (id BIGINT)")
    spark.sql("INSERT INTO graft.maint.orph VALUES (1), (2)")
    val dir = new Path(s"$warehouse/maint/orph")
    // simulate an aborted write: a parquet file no manifest references
    val stray = new Path(s"$warehouse/maint/orph/data/w-stray/part-0.parquet")
    spark.range(5).write.parquet(stray.getParent.toString)
    // default grace period protects just-written files (an in-flight
    // writer's uncommitted output must never be collected)
    assert(cat.ops.removeOrphanFiles(dir).isEmpty)
    val deleted = cat.ops.removeOrphanFiles(dir, graceMs = 0L)
    assert(deleted.nonEmpty && deleted.forall(_.contains("w-stray")))
    assert(spark.sql("SELECT count(*) FROM graft.maint.orph").collect().head.getLong(0) == 2)
    // idempotent
    assert(cat.ops.removeOrphanFiles(dir, graceMs = 0L).isEmpty)
  }

  test("register adopts external parquet files without copying") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    val dir = new Path(s"$warehouse/maint/reg")
    val schema = SchemaBridge.fromSpark(
      Tables.nation(spark, sfDir).schema)
    val external = new java.io.File(s"$sfDir/nation.parquet").getAbsolutePath
    cat.ops.register(dir, schema, Seq(external))
    val n = spark.sql("SELECT count(*) FROM graft.maint.reg").collect().head.getLong(0)
    assert(n == Tables.nation(spark, sfDir).count())
    // external absolute path preserved in manifest (not relativized)
    val (_, meta) = cat.ops.load(dir).get
    val entry = cat.ops.snapshotEntries(dir, meta.currentSnapshot.get).head
    assert(entry.path == external)
  }

  test("write-audit-publish: branch write, audit read, fast-forward") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.wap (id BIGINT)")
    spark.sql("INSERT INTO graft.maint.wap VALUES (1)")
    val dir = new Path(s"$warehouse/maint/wap")
    import spark.implicits._

    // stage on the audit branch — main must not see it
    val staged = Seq(2L, 3L).toDF("id")
    val writeDir = new Path(s"$warehouse/maint/wap/data/w-stage")
    staged.write.parquet(writeDir.toString)
    val files = cat.store.listFilesRec(writeDir)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    cat.ops.commitFilesToBranch(dir, files, "append", "audit")

    assert(spark.sql("SELECT count(*) FROM graft.maint.wap").collect().head.getLong(0) == 1)
    val audited = spark.read.option("ref", "audit").table("graft.maint.wap")
      .collect().map(_.getLong(0)).toSet
    assert(audited == Set(1L, 2L, 3L), "audit branch sees staged + parent data")

    // publish: fast-forward main onto the audited branch head
    cat.ops.fastForward(dir, "main", "audit")
    assert(spark.sql("SELECT sum(id) FROM graft.maint.wap").collect().head.getLong(0) == 6)
    val (_, meta) = cat.ops.load(dir).get
    assert(meta.refs("main").snapshotId == meta.refs("audit").snapshotId)
  }

  test("metadata log stays bounded and trimmed files are reclaimed") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.logc (id BIGINT) TBLPROPERTIES (" +
      "'graft.metadata.log.max-entries'='5', 'graft.metadata.delete-after-commit'='true')")
    (1 to 12).foreach(i => spark.sql(s"INSERT INTO graft.maint.logc VALUES ($i)"))
    val dir = new Path(s"$warehouse/maint/logc")
    val (v, meta) = cat.ops.load(dir).get
    assert(meta.metadataLog.size <= 5, s"log must be trimmed, got ${meta.metadataLog.size}")
    assert(spark.sql("SELECT count(*) FROM graft.maint.logc").collect().head.getLong(0) == 12)

    // reclaimed: only the logged versions + the current file remain
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    val mdFiles = fs.listStatus(new Path(dir, "metadata"))
      .map(_.getPath.getName).filter(_.endsWith(".metadata.json"))
    assert(mdFiles.length <= 7, s"old metadata files must be deleted, got ${mdFiles.toSeq.sorted}")
    // history within the trimmed log is still resolvable
    assert(meta.metadataLog.forall(e => fs.exists(new Path(e.metadataFile))))
  }

  test("streaming sink commits one snapshot per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.stream (v BIGINT)")
    val dir = new Path(s"$warehouse/maint/stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString

    val input = MemoryStream[Long]
    val q = Streams.writeToCatalogTable(input.toDF().toDF("v"), cat.ops, dir, ckpt)
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      input.addData(4L, 5L)
      q.processAllAvailable()
    } finally q.stop()

    val (_, meta) = cat.ops.load(dir).get
    assert(meta.snapshots.size == 2, "one snapshot per micro-batch")
    assert(spark.sql("SELECT sum(v) FROM graft.maint.stream").collect().head.getLong(0) == 15)
    // and the table is time-travelable to the first batch
    val first = meta.snapshots.minBy(_.sequenceNumber)
    assert(spark.sql(s"SELECT sum(v) FROM graft.maint.stream VERSION AS OF ${first.snapshotId}")
      .collect().head.getLong(0) == 6)
  }

  test("streaming sink is exactly-once: replayed batches are skipped") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.once (v BIGINT)")
    val dir = new Path(s"$warehouse/maint/once")
    import spark.implicits._
    val key = "graft.stream.test.last-batch"

    cat.ops.commitStreamBatch(dir, Seq(1L, 2L).toDF("v"), key, batchId = 0L)
    // a failure after our commit but before Spark's checkpoint replays
    // the SAME batch id — it must be recognized and skipped
    cat.ops.commitStreamBatch(dir, Seq(1L, 2L).toDF("v"), key, batchId = 0L)
    assert(spark.sql("SELECT count(*) FROM graft.maint.once").collect().head.getLong(0) == 2)
    assert(cat.ops.load(dir).get._2.snapshots.size == 1)

    cat.ops.commitStreamBatch(dir, Seq(3L).toDF("v"), key, batchId = 1L)
    assert(spark.sql("SELECT sum(v) FROM graft.maint.once").collect().head.getLong(0) == 6)
    // a second independent stream (different sink key) interleaves fine
    cat.ops.commitStreamBatch(dir, Seq(10L).toDF("v"), "graft.stream.other.last-batch", 0L)
    assert(spark.sql("SELECT sum(v) FROM graft.maint.once").collect().head.getLong(0) == 16)
  }

  test("expireTags drops only aged tag refs; branches survive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.tags (v BIGINT)")
    val dir = new Path(s"$warehouse/maint/tags")
    spark.sql("INSERT INTO graft.maint.tags VALUES (1)")
    val (_, m1) = cat.ops.load(dir).get
    val snap = m1.currentSnapshot.get.snapshotId
    cat.ops.commit(dir, Seq.empty, Seq(
      MetadataUpdate.SetSnapshotRef("audit-old", snap, "tag"),
      MetadataUpdate.SetSnapshotRef("side", snap, "branch")))

    // cutoff in the future ⇒ the tag's snapshot is "old"
    cat.ops.expireTags(dir, System.currentTimeMillis() + 60000)
    val refs = cat.ops.load(dir).get._2.refs
    assert(!refs.contains("audit-old"), "aged tag must be dropped")
    assert(refs.contains("side"), "branches are never expired by tag policy")
    assert(refs.contains("main"))
  }
}
