package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.catalog._

/** Deletion vectors (C61): positional deletes stored as one Roaring
  * bitmap per data file — delete/read parity with row-coordinate
  * positional deletes, overlap union, vectorize compaction, changelog
  * resolution, rename safety, concurrent-rewrite abort, and the
  * ≥1M-row off-driver read path. */
class DvSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  private def entries(dir: Path) =
    cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)

  test("deletion-vector delete matches positional-delete semantics exactly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    for (t <- Seq("pos_ref", "vec")) {
      spark.sql(s"CREATE TABLE graft.dv.$t (id BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft.dv.$t VALUES (1,'x'), (1,'x'), (2,'y')")
      spark.sql(s"INSERT INTO graft.dv.$t VALUES (3,'z'), (4,'y')")
    }
    val posDir = new Path(s"$warehouse/dv/pos_ref")
    val vecDir = new Path(s"$warehouse/dv/vec")
    val beforeData = entries(vecDir).filter(_.isData).map(_.path).toSet

    cat.ops.positionalDelete(spark, posDir, col("v") === "y")
    cat.ops.deletionVectorDelete(spark, vecDir, col("v") === "y")

    // identical visible rowsets through the SQL scan path
    def rows(t: String) = spark.sql(s"SELECT id, v FROM graft.dv.$t ORDER BY id, v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows("vec") == rows("pos_ref"))
    assert(rows("vec") == Seq((1L, "x"), (1L, "x"), (3L, "z")))
    // pruning + pushed-filter read paths agree
    assert(spark.sql("SELECT count(*) FROM graft.dv.vec WHERE id >= 1")
      .collect().head.getLong(0) == 3)
    assert(spark.sql("SELECT v FROM graft.dv.vec ORDER BY v")
      .collect().map(_.getString(0)).toSeq == Seq("x", "x", "z"))
    assert(cat.ops.read(spark, vecDir).count() == 3)

    // the commit is dv-deletes entries; zero data files rewritten
    val after = entries(vecDir)
    assert(after.count(_.isDvDelete) >= 1)
    assert(after.count(_.isPosDelete) == 0)
    assert(beforeData.subsetOf(after.filter(_.isData).map(_.path).toSet))

    // appends after the DV delete are untouched by it
    spark.sql("INSERT INTO graft.dv.vec VALUES (5,'y')")
    assert(spark.sql("SELECT count(*) FROM graft.dv.vec").collect().head.getLong(0) == 4)
  }

  test("overlapping DV commits union (newer commits add dead rows)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.ov (id BIGINT)")
    spark.sql("INSERT INTO graft.dv.ov SELECT id FROM range(0, 100)")
    val dir = new Path(s"$warehouse/dv/ov")

    cat.ops.deletionVectorDelete(spark, dir, col("id") % 3 === 0)  // kills 0,3,6,…
    cat.ops.deletionVectorDelete(spark, dir, col("id") % 5 === 0)  // overlaps at 0,15,30,…

    val expect = (0L until 100L).filterNot(i => i % 3 == 0 || i % 5 == 0)
    assert(spark.sql("SELECT id FROM graft.dv.ov ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == expect)
    assert(entries(dir).count(_.isDvDelete) >= 2, "two separate DV commits pending")
  }

  test("changes() emits row-level deletes for dv-delete commits") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.cdc (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dv.cdc VALUES (1,'a'), (2,'b'), (3,'c')") // seq 1
    val dir = new Path(s"$warehouse/dv/cdc")
    cat.ops.deletionVectorDelete(spark, dir, col("id") === 2)              // seq 2

    val feed = cat.ops.changes(spark, dir, 0L, Long.MaxValue)
      .collect()
      .map(r => (r.getLong(3), r.getString(2), r.getLong(0), r.getString(1)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(feed == Seq(
      (1L, "insert", 1L, "a"),
      (1L, "insert", 2L, "b"),
      (1L, "insert", 3L, "c"),
      (2L, "delete", 2L, "b")).sortBy(t => (t._1, t._2, t._3)), s"feed was $feed")
  }

  test("empty-match positional/DV delete commits cleanly; changes() tolerates it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.noop (id BIGINT)")
    spark.sql("INSERT INTO graft.dv.noop VALUES (1), (2)")
    val dir = new Path(s"$warehouse/dv/noop")
    // nothing matches → a delete snapshot that adds no delete files
    cat.ops.positionalDelete(spark, dir, col("id") === 999)
    cat.ops.deletionVectorDelete(spark, dir, col("id") === 999)
    assert(spark.sql("SELECT count(*) FROM graft.dv.noop").collect().head.getLong(0) == 2)
    // the changelog must not throw on the file-less delete snapshots
    val feed = cat.ops.changes(spark, dir, 0L, Long.MaxValue).collect()
    assert(feed.count(_.getString(1) == "insert") == 2)
    assert(feed.count(_.getString(1) == "delete") == 0)
  }

  test("vectorizeDeletes merges pos + DV commits, preserves rows, nets zero in changes()") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.vz (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dv.vz VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    spark.sql("INSERT INTO graft.dv.vz VALUES (5,'e'), (6,'f')")
    val dir = new Path(s"$warehouse/dv/vz")
    cat.ops.positionalDelete(spark, dir, col("id") === 2)       // row coords
    cat.ops.deletionVectorDelete(spark, dir, col("id") === 5)   // bitmap
    cat.ops.deletionVectorDelete(spark, dir, col("id") === 4)   // second bitmap
    def content() = spark.sql("SELECT id FROM graft.dv.vz ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(content() == Seq(1L, 3L, 6L))
    val seqBefore = cat.ops.load(dir).get._2.lastSequenceNumber

    cat.ops.vectorizeDeletes(spark, dir)

    assert(content() == Seq(1L, 3L, 6L), "vectorize must not change visible rows")
    val after = entries(dir)
    assert(after.count(_.isPosDelete) == 0, "row-coordinate files merged away")
    assert(after.count(_.isDvDelete) >= 1)
    // merged entries carry the newest REAL input sequence — never the
    // Long.MaxValue legacy sentinel, never above the table's counter
    val merged = after.filter(_.isDvDelete)
    assert(merged.forall(_.seq.isDefined))
    assert(merged.forall(_.seq.get <= seqBefore), s"merged seqs ${merged.map(_.seq)}")
    // the vectorize snapshot itself nets to ZERO row-level changes
    val vzSeq = cat.ops.load(dir).get._2.lastSequenceNumber
    assert(cat.ops.changes(spark, dir, vzSeq - 1, vzSeq).count() == 0)
    // still behaves afterwards: re-insert a dead key, it is visible
    spark.sql("INSERT INTO graft.dv.vz VALUES (2,'back')")
    assert(content() == Seq(1L, 2L, 3L, 6L))
  }

  test("applyDeletes purges deletion vectors; copy-on-write guarded while pending") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.purge (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dv.purge VALUES (1,'a'), (2,'b'), (3,'c')")
    val dir = new Path(s"$warehouse/dv/purge")
    cat.ops.deletionVectorDelete(spark, dir, col("id") === 2)

    // raw-file rewrites would resurrect dead rows → guarded
    intercept[Exception] { spark.sql("UPDATE graft.dv.purge SET v = 'X' WHERE id = 1") }
    intercept[Exception] {
      import spark.implicits._
      cat.ops.upsert(spark, dir, Seq((1L, "z")).toDF("id", "v"), Seq("id"))
    }

    cat.ops.applyDeletes(spark, dir)
    assert(entries(dir).forall(_.isData), "applyDeletes drops DV entries")
    assert(spark.sql("SELECT id FROM graft.dv.purge ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // COW restored
    spark.sql("UPDATE graft.dv.purge SET v = 'X' WHERE id = 1")
    assert(spark.sql("SELECT v FROM graft.dv.purge WHERE id = 1")
      .collect().head.getString(0) == "X")
  }

  test("compact with pending DVs applies them: rows preserved, vectors purged") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.cp (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dv.cp VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    spark.sql("INSERT INTO graft.dv.cp VALUES (5,'e'), (6,'f')")
    val dir = new Path(s"$warehouse/dv/cp")
    cat.ops.deletionVectorDelete(spark, dir, col("id") % 2 === 0)
    assert(spark.sql("SELECT count(*) FROM graft.dv.cp").collect().head.getLong(0) == 3)

    // compact resolves the MOR state first, so it doubles as an
    // applyDeletes with file sizing: vectors gone, rowset identical
    cat.ops.compact(spark, dir, 1)
    val after = entries(dir)
    assert(after.forall(_.isData), s"compaction must purge DV entries: $after")
    assert(spark.sql("SELECT id FROM graft.dv.cp ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
    // history: the pre-compaction snapshot still time-travels WITH the DV applied
    val (_, m) = cat.ops.load(dir).get
    val prev = m.snapshots.sortBy(_.sequenceNumber).dropRight(1).last
    assert(spark.sql(s"SELECT count(*) FROM graft.dv.cp VERSION AS OF ${prev.snapshotId}")
      .collect().head.getLong(0) == 3)
  }

  test("deletion vectors survive table rename (relative coordinates)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.rn (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dv.rn VALUES (1,'a'), (2,'b'), (3,'c')")
    cat.ops.deletionVectorDelete(spark, new Path(s"$warehouse/dv/rn"), col("v") === "b")
    assert(spark.sql("SELECT count(*) FROM graft.dv.rn").collect().head.getLong(0) == 2)

    spark.sql("ALTER TABLE graft.dv.rn RENAME TO dv.rn2")
    assert(spark.sql("SELECT id FROM graft.dv.rn2 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // CDC resolves the bitmap row-level post-rename too
    val feed = cat.ops.changes(spark, new Path(s"$warehouse/dv/rn2"), 0L, Long.MaxValue)
      .collect().map(r => (r.getString(2), r.getLong(0)))
    assert(feed.contains(("delete", 2L)), s"feed was ${feed.toSeq}")
  }

  test("DV delete aborts when a concurrent rewrite replaces the referenced files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.race (id BIGINT)")
    spark.sql("INSERT INTO graft.dv.race SELECT id FROM range(0, 50)")
    val dir = new Path(s"$warehouse/dv/race")
    val plainOps = cat.ops

    // Store hook: the first CAS publish for this table triggers a
    // compaction (rewriting every data file) through a SEPARATE ops,
    // then proceeds — so the delete's first commit attempt loses the
    // race deterministically and its retry re-validates against the
    // rewritten state.
    val hooked = new FsStore(spark.sparkContext.hadoopConfiguration) {
      private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      override def publish(d: Path, next: Int, content: String): Boolean = {
        if (d.toString.contains("dv/race") && fired.compareAndSet(false, true))
          plainOps.compact(spark, dir, 1)
        super.publish(d, next, content)
      }
    }
    val racingOps = new TableOps(hooked)
    val e = intercept[CommitFailedException] {
      racingOps.positionalDelete(spark, dir, col("id") < 10, asVectors = true)
    }
    assert(e.getMessage.contains("concurrent rewrite"), e.getMessage)
    // no delete landed; the compacted table is intact
    assert(entries(dir).forall(_.isData))
    assert(spark.sql("SELECT count(*) FROM graft.dv.race").collect().head.getLong(0) == 50)
  }

  test("DV delete aborts when a concurrent MOR update re-appends its target rows (lost delete)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.lostdel (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dv.lostdel SELECT id, 'x' FROM range(0, 50)")
    val dir = new Path(s"$warehouse/dv/lostdel")
    val plainOps = cat.ops

    // Store hook: a merge-on-read UPDATE of the same rows slips in
    // before the delete's publish — its DV masks the old coordinates
    // and re-appends fresh images, which the pinned delete would
    // silently let survive. The retry's validation must abort instead.
    val hooked = new FsStore(spark.sparkContext.hadoopConfiguration) {
      private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      override def publish(d: Path, next: Int, content: String): Boolean = {
        if (d.toString.contains("dv/lostdel") && fired.compareAndSet(false, true))
          plainOps.morUpdate(spark, dir, col("id") < 10,
            Map("v" -> org.apache.spark.sql.functions.lit("upd")))
        super.publish(d, next, content)
      }
    }
    val racingOps = new TableOps(hooked)
    val e = intercept[CommitFailedException] {
      racingOps.positionalDelete(spark, dir, col("id") < 10, asVectors = true)
    }
    assert(e.getMessage.contains("merge-on-read update"), e.getMessage)
    // the update won cleanly; no row was half-deleted
    assert(spark.sql("SELECT count(*) FROM graft.dv.lostdel")
      .collect().head.getLong(0) == 50)
    assert(spark.sql("SELECT count(*) FROM graft.dv.lostdel WHERE v = 'upd'")
      .collect().head.getLong(0) == 10)
  }

  test("million-row DV delete stays off the driver and reads correctly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    val dir = new Path(s"$warehouse/dv/big")
    spark.sql("CREATE TABLE graft.dv.big (id BIGINT, v BIGINT)")
    cat.ops.write(dir,
      spark.range(0, 3000000).selectExpr("id", "id * 2 AS v").repartition(6), "append")

    // ≥1M dead ordinals, committed as bitmaps: the driver plans a
    // sub-scan over the DV parquet only; executors decode per file
    cat.ops.deletionVectorDelete(spark, dir,
      org.apache.spark.sql.functions.expr("id % 3 = 0"))

    val dvEntries = entries(dir).filter(_.isDvDelete)
    assert(dvEntries.nonEmpty)
    // bitmap density: total DV payload must be a tiny fraction of the
    // ~8 MB the same ordinals cost as row-coordinate parquet
    val fs = new Path(dvEntries.head.path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvBytes = dvEntries.map(e => fs.getFileStatus(new Path(e.path)).getLen).sum
    assert(dvBytes < 2L * 1024 * 1024, s"DV files unexpectedly large: $dvBytes bytes")

    assert(spark.sql("SELECT count(*) FROM graft.dv.big").collect().head.getLong(0)
      == 2000000L)
    assert(spark.sql("SELECT count(*) FROM graft.dv.big WHERE id % 3 = 0")
      .collect().head.getLong(0) == 0L)
    assert(spark.sql("SELECT sum(v) FROM graft.dv.big WHERE id < 10")
      .collect().head.getLong(0) == Seq(1L, 2, 4, 5, 7, 8).map(_ * 2).sum)

    // a second overlapping 1M-row DV commit unions on the read path
    cat.ops.deletionVectorDelete(spark, dir,
      org.apache.spark.sql.functions.expr("id % 3 = 1"))
    assert(spark.sql("SELECT count(*) FROM graft.dv.big").collect().head.getLong(0)
      == 1000000L)
    assert(spark.sql("SELECT min(id), max(id) FROM graft.dv.big")
      .collect().map(r => (r.getLong(0), r.getLong(1))).head == ((2L, 2999999L)))

    // vectorize folds both commits into one vector set; rows unchanged
    cat.ops.vectorizeDeletes(spark, dir)
    assert(spark.sql("SELECT count(*) FROM graft.dv.big").collect().head.getLong(0)
      == 1000000L)
    assert(spark.sql("SELECT count(*) FROM graft.dv.big WHERE id % 3 != 2")
      .collect().head.getLong(0) == 0L)
  }

  test("DeletionVectors round-trip: fromPairs/toPairs are inverses") {
    import spark.implicits._
    val pairs = Seq(
      ("f1", 0L), ("f1", 5L), ("f1", 1000000L), ("f2", 7L), ("f2", 8L))
      .toDF("_file", "_pos")
    val dv = DeletionVectors.fromPairs(spark, pairs)
    val back = DeletionVectors.toPairs(spark, dv).as[(String, Long)].collect().toSet
    assert(back == Set(("f1", 0L), ("f1", 5L), ("f1", 1000000L), ("f2", 7L), ("f2", 8L)))
    // cardinality column is the bitmap's true cardinality
    val cards = dv.as[(String, Long, Array[Byte])].collect()
      .map(t => (t._1, t._2)).toMap
    assert(cards == Map("f1" -> 3L, "f2" -> 2L))
  }

  test("C81 merge-on-read UPDATE: DV + new images in one commit, zero data-file rewrite, CDC pairs") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.upd (id BIGINT, status STRING, amount DOUBLE)")
    spark.sql("INSERT INTO graft.dv.upd VALUES (1,'open',10.0), (2,'open',20.0)")
    spark.sql("INSERT INTO graft.dv.upd VALUES (3,'open',30.0), (4,'done',40.0)")
    val dir = new Path(s"$warehouse/dv/upd")
    val beforeData = entries(dir).filter(_.isData).map(_.path).toSet
    val beforeSeq = cat.ops.load(dir).get._2.lastSequenceNumber

    import org.apache.spark.sql.functions.{col => c, lit}
    cat.ops.morUpdate(spark, dir, c("status") === "open" && c("id") >= 2,
      Map("status" -> lit("closed"), "amount" -> (c("amount") + 5.0)))

    // semantics: matched rows updated, rest untouched
    val rows = spark.sql("SELECT id, status, amount FROM graft.dv.upd ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (1L, "open", 10.0), (2L, "closed", 25.0),
      (3L, "closed", 35.0), (4L, "done", 40.0)), rows.mkString(", "))

    // zero rewrite: every pre-update data file survives verbatim; the
    // commit added only DV file(s) + new image file(s)
    val after = entries(dir)
    assert(beforeData.subsetOf(after.filter(_.isData).map(_.path).toSet),
      "MOR update must not rewrite existing data files")
    assert(after.exists(_.isDvDelete), "expected a deletion vector")

    // CDC: the commit reads as row-level delete+insert pairs
    val feed = cat.ops.changes(spark, dir, beforeSeq, Long.MaxValue)
    val dels = feed.filter("_change_type = 'delete'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val ins = feed.filter("_change_type = 'insert'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(dels == Set((2L, "open"), (3L, "open")), dels.toString)
    assert(ins == Set((2L, "closed"), (3L, "closed")), ins.toString)

    // a second MOR update composes (vectors union), then apply_deletes
    // materializes everything and the rowset is unchanged
    cat.ops.morUpdate(spark, dir, c("id") === 1L, Map("status" -> lit("closed")))
    cat.ops.applyDeletes(spark, dir)
    val finalRows = spark.sql("SELECT id, status, amount FROM graft.dv.upd ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(finalRows.toSeq == Seq(
      (1L, "closed", 10.0), (2L, "closed", 25.0),
      (3L, "closed", 35.0), (4L, "done", 40.0)), finalRows.mkString(", "))
    assert(entries(dir).forall(_.isData), "applyDeletes purges the vectors")
  }

  test("C89: Iceberg v3 Puffin delete vectors import as graft DV deletes (round-trip)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.v3rt (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dv.v3rt VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("INSERT INTO graft.dv.v3rt VALUES (4,'d'), (5,'e'), (6,'f')")
    val dir = new Path(s"$warehouse/dv/v3rt")
    cat.ops.deletionVectorDelete(spark, dir, col("id").isin(2L, 5L, 6L))
    val expected = spark.sql("SELECT id FROM graft.dv.v3rt ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(expected == Seq(1L, 3L, 4L))

    // export writes the v3 delete-vector-v1 blobs
    IcebergExport.export(cat.ops, dir, Some(spark))
    val snapId = cat.ops.load(dir).get._2.currentSnapshotId.get
    val pf = new Path(s"$warehouse/dv/v3rt/iceberg/metadata/dvs-$snapId.puffin")
    assert(cat.ops.store.exists(pf))

    // reader returns (referenced file, bitmap) with the right dead sets
    val read = PuffinStats.readDeleteVectors(cat.ops, pf)
    assert(read.nonEmpty)
    assert(read.map(_._2.getLongCardinality).sum == 3L)

    // twin table referencing the SAME data files (pre-delete state):
    // importing the puffin must reproduce the original's visible rows
    val twinDir = new Path(s"$warehouse/dv/v3rt_twin")
    val dataAbs = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .filter(_.isData).map(e => new Path(dir, e.path).toString)
    cat.ops.create(twinDir, TableMetadata.create(
      twinDir.toString,
      cat.ops.load(dir).get._2.currentSchema,
      PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
    cat.ops.commitFiles(twinDir, dataAbs, "append")
    assert(cat.ops.read(spark, twinDir).count() == 6, "twin starts pre-delete")

    cat.ops.importDeleteVectorsPuffin(spark, twinDir, pf)
    val twinRows = spark.sql("SELECT id FROM graft.dv.v3rt_twin ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(twinRows == expected,
      s"imported DVs must mask the same ordinals: $twinRows vs $expected")

    // SQL procedure spelling on a second twin
    val twin2 = new Path(s"$warehouse/dv/v3rt_twin2")
    cat.ops.create(twin2, TableMetadata.create(
      twin2.toString, cat.ops.load(dir).get._2.currentSchema,
      PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
    cat.ops.commitFiles(twin2, dataAbs, "append")
    spark.sql(s"CALL graft.system.import_delete_vectors('dv.v3rt_twin2', '$pf')")
    assert(spark.sql("SELECT id FROM graft.dv.v3rt_twin2 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == expected)

    // a corrupted vector byte fails LOUDLY (CRC), never silently
    val fs = cat.ops.store.fs(pf)
    val len = fs.getFileStatus(pf).getLen.toInt
    val bytes = { val in = fs.open(pf)
      try { val b = new Array[Byte](len); in.readFully(0, b); b } finally in.close() }
    bytes(12) = (bytes(12) ^ 0x1).toByte // inside the first blob's vector
    val corrupt = new Path(s"$warehouse/dv/v3rt_corrupt.puffin")
    val out = fs.create(corrupt, true); out.write(bytes); out.close()
    val e = intercept[IllegalArgumentException] {
      PuffinStats.readDeleteVectors(cat.ops, corrupt)
    }
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("magic"), e.getMessage)
  }

  test("C89 at scale: multi-hundred-blob import decodes on executors, writes >1 part") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    val dir = new Path(s"$warehouse/dv/many")
    import org.apache.spark.sql.functions.lit
    val df = spark.range(2000).toDF("id")
      .withColumn("v", (col("id") % 7).cast("string"))
    cat.ops.create(dir, TableMetadata.create(
      dir.toString, SchemaBridge.fromSpark(df.schema),
      PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
    // ~220 data files → ~220 delete-vector blobs in the export
    cat.ops.write(dir, df.repartition(220), "append", numFiles = Some(220))
    cat.ops.deletionVectorDelete(spark, dir, col("id") % 2 === 0)
    IcebergExport.export(cat.ops, dir, Some(spark))
    val snapId = cat.ops.load(dir).get._2.currentSnapshotId.get
    val pf = new Path(s"$warehouse/dv/many/iceberg/metadata/dvs-$snapId.puffin")

    // footer-only driver parse: every blob located, cardinality from
    // the blob metadata — no vector bytes read on the driver
    val metas = PuffinStats.readDeleteVectorMetas(cat.ops, pf)
    assert(metas.size > 100, s"expected hundreds of blobs, got ${metas.size}")
    assert(metas.forall(_.cardinality > 0))
    assert(metas.map(_.cardinality).sum == 1000L)

    // twin table over the same (pre-delete) data files
    val twin = new Path(s"$warehouse/dv/many_twin")
    val dataAbs = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .filter(_.isData).map(e => new Path(dir, e.path).toString)
    cat.ops.create(twin, TableMetadata.create(
      twin.toString, cat.ops.load(dir).get._2.currentSchema,
      PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
    cat.ops.commitFiles(twin, dataAbs, "append")
    cat.ops.importDeleteVectorsPuffin(spark, twin, pf)

    // the import wrote MULTIPLE dv parts (distributed, not coalesce(1))
    val dvParts = entries(twin).filter(_.isDvDelete)
    assert(dvParts.size > 1, s"expected >1 dv part, got ${dvParts.size}")
    assert(cat.ops.read(spark, twin).count() == 1000L)
    // spot-check masking equivalence against the source table
    assert(spark.sql("SELECT sum(id) FROM graft.dv.many").collect().head.getLong(0) ==
      cat.ops.read(spark, twin).agg(org.apache.spark.sql.functions.sum("id"))
        .collect().head.getLong(0))
  }

  test("ADVICE r14: pre-r14 CRC-32C delete-vector blobs stay readable; garbage still refused") {
    import java.nio.{ByteBuffer, ByteOrder}
    val bm = new org.roaringbitmap.longlong.Roaring64NavigableMap()
    Seq(1L, 5L, 99L).foreach(bm.addLong)
    val vec = DeletionVectors.serialize(bm)
    val magic = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64)
    def blobWith(crc: Int): Array[Byte] = {
      val buf = ByteBuffer.allocate(4 + 4 + vec.length + 4).order(ByteOrder.BIG_ENDIAN)
      buf.putInt(4 + vec.length); buf.put(magic); buf.put(vec); buf.putInt(crc)
      buf.array()
    }
    // legacy polynomial (CRC-32C) — what pre-r14 exports of this repo wrote
    val c32c = new java.util.zip.CRC32C(); c32c.update(magic); c32c.update(vec)
    val legacy = PuffinStats.decodeDeleteVectorBlob(blobWith(c32c.getValue.toInt), "legacy")
    assert(DeletionVectors.deserialize(legacy).contains(99L))
    // spec polynomial (plain CRC-32) — the current writer
    val c32 = new java.util.zip.CRC32(); c32.update(magic); c32.update(vec)
    assert(PuffinStats.decodeDeleteVectorBlob(blobWith(c32.getValue.toInt), "spec")
      .sameElements(vec))
    // matching NEITHER polynomial is corruption, still refused
    val e = intercept[IllegalArgumentException] {
      PuffinStats.decodeDeleteVectorBlob(blobWith(c32.getValue.toInt ^ 0x1), "bad")
    }
    assert(e.getMessage.contains("CRC"))
  }
}
