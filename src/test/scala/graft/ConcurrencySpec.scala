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
