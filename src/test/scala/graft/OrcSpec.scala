package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** C58 — ORC as a second data format: the metadata layer is
  * format-agnostic (like the reference's catalog), and a table created
  * with `graft.format=orc` writes/reads ORC data files through the
  * same DSv2 delegate machinery as parquet — snapshots, time travel,
  * stats pruning, COW delete, MOR equality deletes (delete files stay
  * parquet-internal) all included. */
class OrcSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  test("orc table: insert, scan, filter pushdown, time travel") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.orc")
    spark.sql(
      "CREATE TABLE graft.orc.t (id BIGINT, v DOUBLE, s STRING) " +
      "TBLPROPERTIES ('graft.format'='orc')")
    spark.sql("INSERT INTO graft.orc.t VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    spark.sql("INSERT INTO graft.orc.t VALUES (3, 3.5, 'c')")
    val dir = new Path(s"$warehouse/orc/t")

    // data files really are ORC
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(entries.nonEmpty && entries.forall(_.path.endsWith(".orc")),
      entries.map(_.path).mkString(", "))

    assert(spark.sql("SELECT sum(id) FROM graft.orc.t").collect().head.getLong(0) == 6)
    assert(spark.sql("SELECT s FROM graft.orc.t WHERE v > 2.0 ORDER BY s")
      .collect().map(_.getString(0)).toSeq == Seq("b", "c"))

    // time travel across orc snapshots
    val (_, m) = cat.ops.load(dir).get
    val first = m.snapshots.minBy(_.sequenceNumber)
    assert(spark.sql(s"SELECT count(*) FROM graft.orc.t VERSION AS OF ${first.snapshotId}")
      .collect().head.getLong(0) == 2)

    // ORC file-tail stats landed in the manifest → file skipping works
    assert(entries.forall(e => e.rows.isDefined && e.stats.contains("id")))
    val kept = entries.filter(e =>
      Stats.mayContain(e, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))),
        org.apache.spark.sql.sources.GreaterThan("id", 2L)))
    assert(kept.size == 1, s"stats must prune the id<=2 file, kept ${kept.size}")
  }

  test("orc table: copy-on-write delete, upsert, compaction") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.orc")
    spark.sql(
      "CREATE TABLE graft.orc.d (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.format'='orc')")
    spark.sql("INSERT INTO graft.orc.d VALUES (1,'a'), (2,'b'), (3,'c')")
    val dir = new Path(s"$warehouse/orc/d")

    spark.sql("DELETE FROM graft.orc.d WHERE id = 2")
    assert(spark.sql("SELECT id FROM graft.orc.d ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))

    import spark.implicits._
    cat.ops.upsert(spark, dir, Seq((3L, "c2"), (4L, "d")).toDF("id", "v"), Seq("id"))
    assert(spark.sql("SELECT v FROM graft.orc.d ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("a", "c2", "d"))

    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    cat.ops.compactSmallFiles(spark, dir, smallBytes = 1L << 20, targetBytes = 1L << 24)
    val after = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(after.size <= before.size && after.forall(_.path.endsWith(".orc")))
    assert(spark.sql("SELECT count(*) FROM graft.orc.d").collect().head.getLong(0) == 3)
  }

  test("orc table: merge-on-read equality delete (parquet delete files over orc data)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.orc")
    spark.sql(
      "CREATE TABLE graft.orc.m (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.format'='orc')")
    spark.sql("INSERT INTO graft.orc.m VALUES (1,'a'), (2,'b'), (3,'c')")
    val dir = new Path(s"$warehouse/orc/m")
    import spark.implicits._

    cat.ops.mergeOnReadDelete(spark, dir, Seq(2L).toDF("id"))
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(entries.filter(_.isEqDelete).forall(_.path.endsWith(".parquet")),
      "delete files stay parquet (graft-internal state)")
    assert(entries.filter(_.isData).forall(_.path.endsWith(".orc")))

    assert(spark.sql("SELECT id FROM graft.orc.m ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // purge rewrites the survivors as orc
    cat.ops.applyDeletes(spark, dir)
    val purged = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(purged.forall(e => e.isData && e.path.endsWith(".orc")))
    assert(spark.sql("SELECT count(*) FROM graft.orc.m").collect().head.getLong(0) == 2)
  }
}
