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

  test("C86: cherry-pick publishes one staged append onto a diverged main") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.cherry (id BIGINT)")
    spark.sql("INSERT INTO graft.maint.cherry VALUES (1)")
    val dir = new Path(s"$warehouse/maint/cherry")
    import spark.implicits._

    def stage(vals: Seq[Long], branch: String): Long = {
      val writeDir = new Path(s"$warehouse/maint/cherry/data/w-stage-${vals.head}")
      vals.toDF("id").write.parquet(writeDir.toString)
      val files = cat.store.listFilesRec(writeDir)
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      cat.ops.commitFilesToBranch(dir, files, "append", branch).refs(branch).snapshotId
    }
    // two snapshots staged on the audit branch; only the FIRST is picked
    val picked = stage(Seq(2L, 3L), "audit")
    stage(Seq(100L), "audit")
    // main diverges independently of the branch in the meantime
    spark.sql("INSERT INTO graft.maint.cherry VALUES (4)")

    val meta = cat.ops.cherryPick(dir, picked)
    val main = spark.sql("SELECT id FROM graft.maint.cherry")
      .collect().map(_.getLong(0)).toSet
    assert(main == Set(1L, 2L, 3L, 4L),
      "main must gain exactly the picked snapshot's rows (not the branch tail)")
    // new commit on main's own lineage, not a ref move onto the branch
    assert(meta.refs("main").snapshotId != picked)
    assert(meta.snapshots.find(_.snapshotId == meta.refs("main").snapshotId)
      .get.operation == "append")

    // double-pick refused (files already live)
    intercept[CommitFailedException] { cat.ops.cherryPick(dir, picked) }
    // non-append snapshots refused
    spark.sql("INSERT OVERWRITE graft.maint.cherry VALUES (9)")
    val ow = cat.ops.load(dir).get._2.currentSnapshot.get
    assert(ow.operation == "overwrite")
    intercept[IllegalArgumentException] { cat.ops.cherryPick(dir, ow.snapshotId) }

    // SQL procedure surface
    spark.sql("INSERT INTO graft.maint.cherry VALUES (10)")
    val picked2 = stage(Seq(11L), "audit2")
    val res = spark.sql(
      s"CALL graft.system.cherrypick_snapshot('maint.cherry', ${picked2}L)").collect()
    assert(res.head.getLong(1) == picked2)
    val after = spark.sql("SELECT id FROM graft.maint.cherry")
      .collect().map(_.getLong(0)).toSet
    assert(after == Set(9L, 10L, 11L))
  }

  test("cherry-pick refuses when the picked snapshot's parent has been expired") {
    // Regression (ADVICE r12): with the parent gone, the snapshot's
    // own additions can't be separated from its inherited cumulative
    // file list — a default-to-empty parent would re-append (and
    // resurrect) every inherited file. Must refuse instead.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.cherryexp (id BIGINT)")
    spark.sql("INSERT INTO graft.maint.cherryexp VALUES (1)")
    val dir = new Path(s"$warehouse/maint/cherryexp")
    import spark.implicits._
    val base = cat.ops.load(dir).get._2.currentSnapshot.get
    Thread.sleep(5)
    val writeDir = new Path(s"$warehouse/maint/cherryexp/data/w-stage-exp")
    Seq(2L, 3L).toDF("id").write.parquet(writeDir.toString)
    val files = cat.store.listFilesRec(writeDir)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    val picked = cat.ops.commitFilesToBranch(dir, files, "append", "audit")
      .refs("audit").snapshotId
    Thread.sleep(5)
    spark.sql("INSERT INTO graft.maint.cherryexp VALUES (4)")
    // expire ONLY the picked snapshot's parent (base): it is older than
    // base.ts+1 and no ref points at it (main moved on, audit = picked)
    cat.ops.expireSnapshots(dir, base.timestampMs + 1, retainLast = 1)
    assert(cat.ops.load(dir).get._2.snapshotById(base.snapshotId).isEmpty,
      "precondition: the parent snapshot must be expired")
    val e = intercept[IllegalArgumentException] { cat.ops.cherryPick(dir, picked) }
    assert(e.getMessage.contains("expired"), e.getMessage)
    // and nothing was resurrected onto main
    assert(spark.sql("SELECT id FROM graft.maint.cherryexp")
      .collect().map(_.getLong(0)).toSet == Set(1L, 4L))
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

  // ---------- C66: segmented manifests ----------

  test("C66: appends chain shared segments — O(added) metadata per commit") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.seg (id BIGINT)")
    val dir = new Path(s"$warehouse/maint/seg")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO graft.maint.seg VALUES ($i)"))
    val (_, m) = cat.ops.load(dir).get
    val bySeq = m.snapshots.sortBy(_.sequenceNumber)
    val segsOf = bySeq.map(s => cat.ops.segmentsOrSelf(dir, s.manifest))
    // every snapshot is a segment LIST, each append adds exactly one
    // segment, and the earlier snapshot's segments are shared verbatim
    assert(segsOf.map(_.size) == Seq(1, 2, 3, 4), segsOf.toString)
    segsOf.sliding(2).foreach { case Seq(a, b) =>
      assert(b.startsWith(a), "parent segments must be reused verbatim")
    }
    // reads + time travel resolve through the tree
    assert(spark.sql("SELECT count(*) FROM graft.maint.seg").head.getLong(0) == 4)
    val second = bySeq(1).snapshotId
    assert(spark.read.option("snapshot-id", second.toString)
      .table("graft.maint.seg").count() == 2)
    // totals come from the parent summary, not a manifest re-read
    assert(bySeq.last.summary("total-data-files").toLong == 4L)
  }

  test("C66: MOR delete commits append one delete segment") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.segmor (id BIGINT, v STRING)")
    val dir = new Path(s"$warehouse/maint/segmor")
    spark.sql("INSERT INTO graft.maint.segmor VALUES (1, 'a'), (2, 'b')")
    val before = cat.ops.load(dir).get._2.currentSnapshot.get
    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, dir, Seq(1L).toDF("id"))
    val after = cat.ops.load(dir).get._2.currentSnapshot.get
    val bSegs = cat.ops.segmentsOrSelf(dir, before.manifest)
    val aSegs = cat.ops.segmentsOrSelf(dir, after.manifest)
    assert(aSegs.startsWith(bSegs) && aSegs.size == bSegs.size + 1,
      s"delete commit must chain one segment: $bSegs -> $aSegs")
    assert(spark.sql("SELECT count(*) FROM graft.maint.segmor").head.getLong(0) == 1)
  }

  test("C66: rewriteManifests folds the chain; rows, time travel and CDC unaffected") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.segrw (id BIGINT)")
    val dir = new Path(s"$warehouse/maint/segrw")
    (1 to 6).foreach(i => spark.sql(s"INSERT INTO graft.maint.segrw VALUES ($i)"))
    val (_, m0) = cat.ops.load(dir).get
    val preSeq = m0.lastSequenceNumber
    assert(cat.ops.segmentsOrSelf(dir, m0.currentSnapshot.get.manifest).size == 6)

    val m1 = cat.ops.rewriteManifests(dir, targetEntries = 2)
    val head = m1.currentSnapshot.get
    assert(head.operation == "rewrite-manifests")
    assert(cat.ops.segmentsOrSelf(dir, head.manifest).size == 3) // 6 files / 2
    assert(head.summary("manifests-before") == "6")
    // entries preserved verbatim (incl. per-entry seq for MOR masking)
    assert(cat.ops.snapshotEntries(dir, head).map(e => (e.path, e.seq)).sorted ==
           cat.ops.snapshotEntries(dir, m0.currentSnapshot.get).map(e => (e.path, e.seq)).sorted)
    assert(spark.sql("SELECT sum(id) FROM graft.maint.segrw").head.getLong(0) == 21)
    // CDC nets the rewrite to zero changes
    assert(cat.ops.changes(spark, dir, preSeq, m1.lastSequenceNumber).count() == 0)
    // pre-rewrite snapshots still read through their own manifests
    val third = m0.snapshots.sortBy(_.sequenceNumber).apply(2).snapshotId
    assert(spark.read.option("snapshot-id", third.toString)
      .table("graft.maint.segrw").count() == 3)
    // appends continue on the folded base
    spark.sql("INSERT INTO graft.maint.segrw VALUES (7)")
    val m2 = cat.ops.load(dir).get._2
    assert(cat.ops.segmentsOrSelf(dir, m2.currentSnapshot.get.manifest).size == 4)
  }

  test("C66: append auto-merge bounds the segment chain at max-segments") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("""CREATE TABLE graft.maint.segam (id BIGINT)
                 TBLPROPERTIES ('graft.manifest.max-segments' = '3')""")
    val dir = new Path(s"$warehouse/maint/segam")
    (1 to 8).foreach(i => spark.sql(s"INSERT INTO graft.maint.segam VALUES ($i)"))
    val (_, m) = cat.ops.load(dir).get
    val sizes = m.snapshots.sortBy(_.sequenceNumber)
      .map(s => cat.ops.segmentsOrSelf(dir, s.manifest).size)
    assert(sizes.max <= 3, s"chain must fold at the cap: $sizes")
    assert(spark.sql("SELECT count(*) FROM graft.maint.segam").head.getLong(0) == 8)
  }

  test("C66: expiration keeps segments shared with live snapshots") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.segexp (id BIGINT)")
    val dir = new Path(s"$warehouse/maint/segexp")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO graft.maint.segexp VALUES ($i)"))
    val (_, m0) = cat.ops.load(dir).get
    val oldest = m0.snapshots.minBy(_.sequenceNumber)
    val oldestManifest = oldest.manifest
    val sharedSeg = cat.ops.segmentsOrSelf(dir, oldestManifest).head
    cat.ops.expireSnapshots(dir, olderThanMs = Long.MaxValue, retainLast = 2)
    val metaDir = new java.io.File(s"$warehouse/maint/segexp/metadata")
    val names = metaDir.listFiles().map(_.getName).toSet
    assert(!names.contains(oldestManifest), "expired manifest list deleted")
    assert(names.contains(sharedSeg),
      "segment shared with the retained lineage must survive")
    assert(spark.sql("SELECT count(*) FROM graft.maint.segexp").head.getLong(0) == 3)
  }

  test("C66: legacy layout still writes and reads plain manifests") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("""CREATE TABLE graft.maint.segleg (id BIGINT)
                 TBLPROPERTIES ('graft.manifest.segments' = 'false')""")
    val dir = new Path(s"$warehouse/maint/segleg")
    (1 to 2).foreach(i => spark.sql(s"INSERT INTO graft.maint.segleg VALUES ($i)"))
    val (_, m) = cat.ops.load(dir).get
    val head = m.currentSnapshot.get
    assert(cat.ops.segmentsOrSelf(dir, head.manifest) == Seq(head.manifest),
      "legacy manifests are their own single leaf")
    assert(spark.sql("SELECT count(*) FROM graft.maint.segleg").head.getLong(0) == 2)
  }

  // ---------- C67: parquet bloom filters ----------

  test("C67: graft.bloom.columns writes parquet blooms; point lookups stay correct") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("""CREATE TABLE graft.maint.bloom (id BIGINT, payload STRING)
                 TBLPROPERTIES ('graft.bloom.columns' = 'id')""")
    val dir = new Path(s"$warehouse/maint/bloom")
    val df = spark.range(0, 10000).selectExpr("id * 7919 AS id", "uuid() AS payload")
    cat.ops.write(dir, df, "append")
    val (_, m) = cat.ops.load(dir).get
    val files = cat.ops.snapshotFiles(dir, m.currentSnapshot.get)
    assert(files.nonEmpty)
    val conf = spark.sessionState.newHadoopConf()
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val cols = r.getFooter.getBlocks.get(0).getColumns.asScala
        val idCol = cols.find(_.getPath.toDotString == "id").get
        val plCol = cols.find(_.getPath.toDotString == "payload").get
        assert(idCol.getBloomFilterOffset >= 0, s"bloom missing on id in $f")
        assert(plCol.getBloomFilterOffset < 0, "no bloom on unlisted columns")
      } finally r.close()
    }
    // the bloom-eligible equality scan returns exactly the needle
    assert(spark.sql("SELECT count(*) FROM graft.maint.bloom WHERE id = 7919")
      .head.getLong(0) == 1)
    assert(spark.sql("SELECT count(*) FROM graft.maint.bloom WHERE id = 7918")
      .head.getLong(0) == 0)
  }
}
