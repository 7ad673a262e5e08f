package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** C71 — SQL maintenance procedures (`CALL graft.system.*`) on
  * Spark 4's native ProcedureCatalog API. */
class ProcedureSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  test("CALL compact reduces the file count, preserves data, returns a summary row") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.c (id BIGINT)")
    (0 until 5).foreach(i =>
      spark.range(i * 10, (i + 1) * 10).write.mode("append").saveAsTable("graft.proc.c"))
    val dir = new Path(s"$warehouse/proc/c")
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2).size
    assert(before >= 5)

    val out = spark.sql("CALL graft.system.compact('proc.c', 2)").collect()
    assert(out.length == 1)
    assert(out.head.getInt(1) == before, "files_before")
    assert(out.head.getInt(2) <= 2, "files_after")
    assert(spark.table("graft.proc.c").count() == 50)
  }

  test("CALL migrate_bucket_hash rewrites an old-hash table and re-enables bucket pruning") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("""CREATE TABLE graft.proc.mig (k BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(8, k))""")
    val dir = new Path(s"$warehouse/proc/mig")
    import spark.implicits._
    cat.ops.write(dir, (0L until 2000L).map(i => (i % 100L, i * 0.5)).toDF("k", "v"),
      "append", numFiles = Some(8))
    // simulate a pre-marker (old-hash) table
    cat.ops.commit(dir, Seq.empty,
      Seq(MetadataUpdate.RemoveProperties(Seq(Transforms.BucketHashProp))))
    assert(!Transforms.hashCurrent(cat.ops.load(dir).get._2))

    val out = spark.sql("CALL graft.system.migrate_bucket_hash('proc.mig')").collect()
    assert(out.length == 1 && out.head.getString(0).startsWith("migrated"))
    val meta = cat.ops.load(dir).get._2
    assert(Transforms.hashCurrent(meta), "marker stamped after the rewrite")
    // pre-migration snapshots (old-hash files) are gone — no time
    // travel into states new-hash pruning would mis-prune
    assert(meta.snapshots.size <= 2) // rewrite snapshot (+ the stamp commit adds none)
    // data intact and derived bucket pruning live again
    assert(spark.sql("SELECT count(*) FROM graft.proc.mig WHERE k = 7")
      .collect().head.getLong(0) == 20L)
    val entries = cat.ops.resolveEntries(dir, meta)
    assert(entries.forall(_.stats.contains("__pt_k")), "rewrite regenerated __pt_ stats")

    // idempotent: a second call is a no-op
    val again = spark.sql("CALL graft.system.migrate_bucket_hash('proc.mig')").collect()
    assert(again.head.getString(0).contains("nothing to migrate"))
  }

  test("named arguments and defaults bind through the analyzer") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.n (id BIGINT)")
    (0 until 3).foreach(_ =>
      spark.range(0, 5).write.mode("append").saveAsTable("graft.proc.n"))
    // num_files omitted → default 4; table passed by name
    spark.sql("CALL graft.system.compact(table => 'proc.n')").collect()
    val dir = new Path(s"$warehouse/proc/n")
    assert(cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2).count(_.isData) <= 4)
    assert(spark.table("graft.proc.n").count() == 15)
  }

  test("CALL vacuum expires history and removes orphans") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.v (id BIGINT)")
    (0 until 4).foreach(i =>
      spark.range(i, i + 1).write.mode("append").saveAsTable("graft.proc.v"))
    val dir = new Path(s"$warehouse/proc/v")
    assert(cat.ops.load(dir).get._2.snapshots.size == 4)

    val out = spark.sql("CALL graft.system.vacuum('proc.v')").collect()
    assert(out.head.getInt(0) == 3, s"expired: ${out.head}")
    assert(cat.ops.load(dir).get._2.snapshots.size == 1)
    assert(spark.table("graft.proc.v").count() == 4)
  }

  test("CALL rollback moves the current snapshot; data time-travels back") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.r (id BIGINT)")
    spark.range(0, 10).write.mode("append").saveAsTable("graft.proc.r")
    val dir = new Path(s"$warehouse/proc/r")
    val firstSnap = cat.ops.load(dir).get._2.currentSnapshotId.get
    spark.range(10, 30).write.mode("append").saveAsTable("graft.proc.r")
    assert(spark.table("graft.proc.r").count() == 30)

    spark.sql(s"CALL graft.system.rollback('proc.r', ${firstSnap}L)").collect()
    assert(spark.table("graft.proc.r").count() == 10)
  }

  test("CALL apply_deletes rewrites pending MOR state") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.m (id BIGINT)")
    spark.range(0, 100).write.mode("append").saveAsTable("graft.proc.m")
    val dir = new Path(s"$warehouse/proc/m")
    cat.ops.mergeOnReadDelete(spark, dir, spark.range(0, 40).toDF("id"))
    assert(spark.table("graft.proc.m").count() == 60)

    spark.sql("CALL graft.system.apply_deletes('proc.m')").collect()
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(!entries.exists(_.isDelete), "delete files purged")
    assert(spark.table("graft.proc.m").count() == 60)
  }

  test("CALL create_branch / create_tag / drop_ref manage refs; branch reads resolve") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.b (id BIGINT)")
    spark.range(0, 10).write.mode("append").saveAsTable("graft.proc.b")
    val dir = new Path(s"$warehouse/proc/b")

    spark.sql("CALL graft.system.create_branch('proc.b', 'audit')").collect()
    spark.sql("CALL graft.system.create_tag('proc.b', 'v1')").collect()
    val refs = cat.ops.load(dir).get._2.refs
    assert(refs("audit").refType == "branch" && refs("v1").refType == "tag")

    // the branch pins the 10-row snapshot even as main moves on
    spark.range(10, 25).write.mode("append").saveAsTable("graft.proc.b")
    assert(cat.ops.read(spark, dir, ref = Some("audit")).count() == 10)
    assert(spark.table("graft.proc.b").count() == 25)

    spark.sql("CALL graft.system.drop_ref('proc.b', 'audit')").collect()
    assert(!cat.ops.load(dir).get._2.refs.contains("audit"))
  }

  test("CALL analyze computes NDVs; scans surface CBO column statistics") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.an (k BIGINT, grp BIGINT, s STRING)")
    spark.range(0, 1000)
      .selectExpr("id AS k", "id % 10 AS grp", "concat('v', id % 50) AS s")
      .write.mode("append").saveAsTable("graft.proc.an")

    val out = spark.sql("CALL graft.system.analyze('proc.an')").collect()
    assert(out.head.getInt(0) == 3, "three columns analyzed")
    val dir = new Path(s"$warehouse/proc/an")
    val props = cat.ops.load(dir).get._2.properties
    // HLL NDVs within 2% of exact
    assert(math.abs(props("graft.stats.ndv.grp").toLong - 10L) <= 1)
    assert(math.abs(props("graft.stats.ndv.k").toLong - 1000L) <= 30)

    // the DSv2 scan reports column statistics for the CBO
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val table = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("proc"), "an"))
    val scan = table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
      .build()
    val stats = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong == 1000L)
    val cs = stats.columnStats()
    val byName = cs.keySet().toArray.map(_.toString).toSet
    assert(byName.contains("grp") && byName.contains("k"), byName.toString)
    val grpStats = cs.entrySet().toArray
      .map(_.asInstanceOf[java.util.Map.Entry[_, org.apache.spark.sql.connector.read.colstats.ColumnStatistics]])
      .find(_.getKey.toString == "grp").get.getValue
    assert(math.abs(grpStats.distinctCount().getAsLong - 10L) <= 1)
    assert(grpStats.nullCount().getAsLong == 0L)
    assert(grpStats.min().get() == 0L && grpStats.max().get() == 9L,
      s"${grpStats.min()} .. ${grpStats.max()}")
  }

  test("C78 CALL maintenance_plan advises from metadata only, and following the advice heals the table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.mp (id BIGINT, v DOUBLE)")
    val dir = new Path(s"$warehouse/proc/mp")
    // 6 tiny appends → small-file debt + snapshot history; one MOR
    // delete → pending delete file
    (0 until 6).foreach(i =>
      spark.sql(s"INSERT INTO graft.proc.mp VALUES ($i, $i.5)"))
    cat.ops.mergeOnReadDelete(spark, dir,
      spark.sql("SELECT CAST(3 AS BIGINT) AS id"))

    val plan = spark.sql("CALL graft.system.maintenance_plan('proc.mp', retain_snapshots => 3)")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(plan.contains("compact"), s"small-file advice missing: $plan")
    assert(plan("compact") == 6L)
    assert(plan.contains("apply_deletes") && plan("apply_deletes") == 1L, plan.toString)
    assert(plan.contains("expire_snapshots"), plan.toString)

    // follow the advice → the advisor reports healthy
    spark.sql("CALL graft.system.apply_deletes('proc.mp')").collect()
    spark.sql("CALL graft.system.compact('proc.mp', 1)").collect()
    spark.sql("CALL graft.system.vacuum('proc.mp')").collect()
    val after = spark.sql("CALL graft.system.maintenance_plan('proc.mp', retain_snapshots => 3)")
      .collect().map(_.getString(0)).toSet
    assert(after == Set("none"), after.toString)
    // data intact through the whole cycle
    assert(spark.table("graft.proc.mp").collect().map(_.getLong(0)).toSet ==
      Set(0L, 1L, 2L, 4L, 5L))
  }

  test("C80 CALL compact_where rewrites only stat-overlapping files, keeps the rest verbatim") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.cw (id BIGINT, v DOUBLE) PARTITIONED BY (id)")
    val dir = new Path(s"$warehouse/proc/cw")
    // 4 range-clustered files over id 0..4000, then fragment the hot
    // range [3000, 4000) with 4 tiny appends
    cat.ops.write(dir, (0L until 4000L).map(i => (i, i * 0.5)).toDF("id", "v"),
      "append", numFiles = Some(4))
    (0 until 4).foreach(k =>
      cat.ops.write(dir,
        Seq((3000L + k, -1.0 * k)).toDF("id", "v"), "append"))
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(before.count(_.isData) == 8)
    val coldPaths = before.filter(_.stats.get("id").exists(_.max.exists(_.toDouble < 3000)))
      .map(_.path).toSet
    assert(coldPaths.size == 3, s"expected 3 provably-cold files, got ${coldPaths.size}")

    val out = spark.sql(
      "CALL graft.system.compact_where('proc.cw', 'id >= 3000', 1)").collect()
    assert(out.head.getInt(1) == 8 && out.head.getInt(2) == 4,
      s"8 files -> 3 kept + 1 rewritten, got ${out.head}")

    // cold files survive IDENTICALLY (same paths, stats untouched)
    val after = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(coldPaths.subsetOf(after.map(_.path).toSet),
      "disjoint files must be kept verbatim")
    // all rows intact, including the fragment rows
    assert(spark.table("graft.proc.cw").count() == 4004)
    assert(spark.sql("SELECT count(*) FROM graft.proc.cw WHERE v < 0").collect()
      .head.getLong(0) == 3, "fragment rows (one v=0 row excluded) survive the rewrite")
  }

  test("CALL export_iceberg / import_iceberg round-trip a delete-bearing table over SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.exp (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.proc.exp SELECT id, CAST(id AS STRING) FROM range(0, 100)")
    val dir = new Path(s"$warehouse/proc/exp")
    import org.apache.spark.sql.functions.col
    cat.ops.deletionVectorDelete(spark, dir, col("id") % 10 === 0)
    assert(spark.table("graft.proc.exp").count() == 90)

    val out = spark.sql("CALL graft.system.export_iceberg('proc.exp')").collect()
    assert(out.length == 1)
    val metaJson = out.head.getString(0)
    assert(metaJson.endsWith(".metadata.json"))
    assert(cat.ops.store.exists(new Path(metaJson)))
    assert(out.head.getInt(1) == 2, "both snapshots exported")
    // v3 DV Puffin rides along (pending deletes)
    val snapId = cat.ops.load(dir).get._2.currentSnapshotId.get
    assert(cat.ops.store.exists(
      new Path(s"$warehouse/proc/exp/iceberg/metadata/dvs-$snapId.puffin")))

    val imp = spark.sql(
      s"CALL graft.system.import_iceberg('proc.expback', '$metaJson')").collect()
    assert(imp.length == 1)
    assert(imp.head.getLong(1) == 90L, "imported visible rows match")
    assert(spark.table("graft.proc.expback").count() == 90)
    assert(spark.sql("SELECT count(*) FROM graft.proc.expback WHERE id % 10 = 0")
      .collect().head.getLong(0) == 0, "deletes replayed through the round-trip")
  }

  test("listProcedures exposes the system namespace") {
    val ids = cat.listProcedures(Array("system"))
    assert(ids.map(_.name()).toSet.contains("compact"))
    assert(ids.forall(_.namespace().sameElements(Array("system"))))
  }
}
