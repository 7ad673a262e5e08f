package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** `<table>$changes` — the catalog-served file-granular CDC view:
  * batch windows via from-seq/to-seq, streaming via readStream.table
  * with sequence-number offsets. */
class ChangelogSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

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
}
