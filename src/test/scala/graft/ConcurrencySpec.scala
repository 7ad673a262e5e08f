package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** Concurrent snapshot commits (append commutation + CAS retry) and
  * schema-evolution reads over old data files. */
class ConcurrencySpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  test("concurrent appends all land via CAS retry — none lost") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.conc")
    spark.sql("CREATE TABLE graft.conc.app (id BIGINT)")
    val dir = new Path(s"$warehouse/conc/app")
    import spark.implicits._
    val frames = (1 to 6).map(i => Seq(i.toLong * 100).toDF("id"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = frames.map { df =>
      new Thread(() => {
        try cat.ops.write(dir, df, "append")
        catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"appends should retry through CAS losses: ${errors.peek()}")
    val (_, meta) = cat.ops.load(dir).get
    assert(meta.snapshots.size == 6, "every append became a snapshot")
    // the LAST snapshot's manifest holds all six files (appends chained)
    val total = spark.sql("SELECT count(*) FROM graft.conc.app").collect().head.getLong(0)
    assert(total == 6, s"no append lost, got $total rows")
    assert(spark.sql("SELECT sum(id) FROM graft.conc.app").collect().head.getLong(0) == 2100)
  }

  test("rollback loses cleanly to a concurrent append (guarded CAS)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.conc")
    spark.sql("CREATE TABLE graft.conc.rb (id BIGINT)")
    val dir = new Path(s"$warehouse/conc/rb")
    (1 to 2).foreach(i => spark.sql(s"INSERT INTO graft.conc.rb VALUES ($i)"))
    val (_, m0) = cat.ops.load(dir).get
    val target = m0.snapshots.minBy(_.sequenceNumber)

    // a writer sneaks in between the rollback's read and its commit:
    // simulate by appending AFTER loading the state rollbackTo will
    // guard on — the stale-guard rollback must fail, a fresh one wins
    spark.sql("INSERT INTO graft.conc.rb VALUES (3)")
    // stale guard: assert main at the OLD snapshot id
    intercept[CommitFailedException] {
      cat.ops.commit(dir,
        Seq(Requirement.AssertRefSnapshotId("main", m0.currentSnapshotId)),
        Seq(MetadataUpdate.SetSnapshotRef("main", target.snapshotId, "branch")))
    }
    // the real API reads fresh state and succeeds
    cat.ops.rollbackTo(dir, target.snapshotId)
    assert(spark.sql("SELECT sum(id) FROM graft.conc.rb").collect().head.getLong(0) == 1)
  }

  test("concurrent MV refreshes: one wins, one loses cleanly, state stays exact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.conc")
    spark.sql("CREATE TABLE graft.conc.mvsrc (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.conc.mvsrc VALUES (1, 1.0), (2, 2.0)")
    val srcDir = new Path(s"$warehouse/conc/mvsrc")
    val dstDir = new Path(s"$warehouse/conc/mvagg")
    Materialized.refreshSumCount(spark, cat.ops, srcDir, dstDir, Seq("k"), "v")

    spark.sql("INSERT INTO graft.conc.mvsrc VALUES (1, 5.0)")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Unit]]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        try { Materialized.refreshSumCount(spark, cat.ops, srcDir, dstDir, Seq("k"), "v")
              results.add(Right(())) }
        catch { case t: Throwable => results.add(Left(t)) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // at least one refresh applied; a loser (if any) failed cleanly on
    // the snapshot guard rather than double-applying
    val mv = cat.ops.read(spark, dstDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(mv == Map(1L -> ((6.0, 2L)), 2L -> ((2.0, 1L))), s"got $mv")
    assert(results.size == 2)
  }

  test("old files read as null for columns added later") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.conc")
    spark.sql("CREATE TABLE graft.conc.evo (id BIGINT)")
    spark.sql("INSERT INTO graft.conc.evo VALUES (1)")
    spark.sql("ALTER TABLE graft.conc.evo ADD COLUMN tag STRING")
    spark.sql("INSERT INTO graft.conc.evo VALUES (2, 'new')")
    val rows = spark.sql("SELECT id, tag FROM graft.conc.evo ORDER BY id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq((1L, None), (2L, Some("new"))),
      "pre-evolution files must surface the new column as NULL")
    // filters on the evolved column still behave
    assert(spark.sql("SELECT count(*) FROM graft.conc.evo WHERE tag IS NULL")
      .collect().head.getLong(0) == 1)
  }
}
