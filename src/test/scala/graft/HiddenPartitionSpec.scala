package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.catalog._

/** C65 — hidden partitioning: transform partition specs
  * (day/bucket/truncate) organize files without leaking a partition
  * column into the schema; scans prune on SOURCE-column predicates. */
class HiddenPartitionSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  private def scannedPaths(df: DataFrame): Int = {
    df.collect()
    "InMemoryFileIndex\\((\\d+) paths\\)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      .map(_.group(1).toInt)
      .getOrElse(fail("no file index in plan"))
  }

  test("days(ts): DDL parses, files cluster by day, day predicates prune") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.hp")
    spark.sql("""CREATE TABLE graft.hp.ev (id BIGINT, ts TIMESTAMP, v DOUBLE)
                 PARTITIONED BY (days(ts))""")
    val dir = new Path(s"$warehouse/hp/ev")
    val (_, meta) = cat.ops.load(dir).get
    val spec = meta.specs.find(_.specId == meta.defaultSpecId).get.fields
    assert(spec.map(_.transform) == Seq("day"), spec.toString)
    assert(spec.head.name == "ts", "transform binds the SOURCE column; no extra schema column")
    assert(!meta.currentSchema.fields.exists(_.name.contains("day")))

    // 8 days x 100 rows, one write → range clustering by raw ts gives
    // per-day-tight files
    import spark.implicits._
    val rows = (0 until 800).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-03-${(i % 8) + 1}%02d 10:00:${i / 60 % 60}%02d"), i * 0.5)
    }.toDF("id", "ts", "v")
    cat.ops.write(dir, rows, "append", numFiles = Some(8))

    val all = scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.ev"))
    val oneDay = scannedPaths(spark.sql(
      """SELECT sum(v) FROM graft.hp.ev
         WHERE ts >= TIMESTAMP '2026-03-03 00:00:00' AND ts < TIMESTAMP '2026-03-04 00:00:00'"""))
    assert(all >= 8, s"expected >=8 files, got $all")
    assert(oneDay <= 2, s"a one-day filter must prune to ~1 of $all files, got $oneDay")
    // correctness of the pruned read
    val n = spark.sql(
      """SELECT count(*) FROM graft.hp.ev
         WHERE ts >= TIMESTAMP '2026-03-03 00:00:00' AND ts < TIMESTAMP '2026-03-04 00:00:00'""")
      .collect()(0).getLong(0)
    assert(n == 100L, s"got $n")
  }

  test("bucket(8, k): hidden __pt_ stats prune equality/IN through the hash") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.hp")
    spark.sql("""CREATE TABLE graft.hp.bk (k BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(8, k))""")
    val dir = new Path(s"$warehouse/hp/bk")
    val (_, meta) = cat.ops.load(dir).get
    assert(meta.specs.head.fields.map(_.transform) == Seq("bucket[8]"))

    import spark.implicits._
    val rows = (0L until 4000L).map(i => (i % 200L, i * 0.25)).toDF("k", "v")
    cat.ops.write(dir, rows, "append", numFiles = Some(8))

    // the hidden column never surfaces in reads
    assert(cat.ops.read(spark, dir).columns.toSeq == Seq("k", "v"))
    // per-file bucket stats landed in the manifest
    val entries = cat.ops.snapshotEntries(dir, cat.ops.load(dir).get._2.currentSnapshot.get)
    assert(entries.forall(_.stats.contains("__pt_k")), "bucket stats in every file")

    val all = scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.bk"))
    val one = scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.bk WHERE k = 7"))
    val in3 = scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.bk WHERE k IN (7, 11, 42)"))
    assert(all >= 4, s"got $all")
    assert(one <= 2, s"equality must prune to ~1 bucket file of $all, got $one")
    assert(in3 < all, s"IN-set must prune, got $in3 of $all")
    // pruned reads stay correct
    assert(spark.sql("SELECT count(*) FROM graft.hp.bk WHERE k = 7").collect()(0).getLong(0) == 20L)
    assert(spark.sql("SELECT sum(v) FROM graft.hp.bk WHERE k IN (7, 11, 42)").collect()(0).getDouble(0) ==
      (0L until 4000L).filter(i => Set(7L, 11L, 42L)(i % 200L)).map(_ * 0.25).sum)

    // compaction rewrites regenerate the hidden column + stats
    cat.ops.compact(spark, dir, 4)
    val entries2 = cat.ops.snapshotEntries(dir, cat.ops.load(dir).get._2.currentSnapshot.get)
    assert(entries2.forall(_.stats.contains("__pt_k")), "bucket stats survive compaction")
    assert(spark.sql("SELECT count(*) FROM graft.hp.bk WHERE k = 7").collect()(0).getLong(0) == 20L)
  }

  test("bucket-hash marker: stamped at create; unmarked (old-hash) tables disable derived pruning") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.hp")
    spark.sql("""CREATE TABLE graft.hp.bkold (k BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(8, k))""")
    val dir = new Path(s"$warehouse/hp/bkold")
    // creation stamps the hash version the table's __pt_ data will use
    assert(cat.ops.load(dir).get._2.properties.get(Transforms.BucketHashProp)
      .contains(Transforms.BucketHashCurrent))

    import spark.implicits._
    val rows = (0L until 4000L).map(i => (i % 200L, i * 0.25)).toDF("k", "v")
    cat.ops.write(dir, rows, "append", numFiles = Some(8))
    val all = scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.bkold"))
    assert(scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.bkold WHERE k = 7")) <= 2)

    // simulate a pre-marker (old-hash) table: strip the property —
    // derived bucket predicates must STOP pruning (the stored __pt_
    // stats could have been produced by a different hash, and pruning
    // on them would silently drop matching rows)
    cat.ops.commit(dir, Seq.empty,
      Seq(MetadataUpdate.RemoveProperties(Seq(Transforms.BucketHashProp))))
    // hash-independent value pruning (raw k min/max) stays legitimate;
    // the bucket-derived predicate must be gone, so exactly the files
    // whose k-range covers 7 are scanned
    val kRangeCovers7 = cat.ops
      .snapshotEntries(dir, cat.ops.load(dir).get._2.currentSnapshot.get)
      .count(e => e.stats.get("k").exists(s =>
        s.min.exists(_.toLong <= 7L) && s.max.exists(_.toLong >= 7L)))
    val unmarked = scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.bkold WHERE k = 7"))
    assert(unmarked == kRangeCovers7,
      s"an unmarked table must not prune through the bucket hash: " +
      s"$unmarked scanned vs $kRangeCovers7 value-kept of $all")
    // results stay correct either way
    assert(spark.sql("SELECT count(*) FROM graft.hp.bkold WHERE k = 7")
      .collect()(0).getLong(0) == 20L)

    // the spec export also refuses bucket tuples without the marker:
    // the table exports unpartitioned rather than publish tuples
    // external engines would hash differently
    val metaFile = IcebergExport.export(cat.ops, dir)
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(cat.ops.store.readString(metaFile))
    assert(n.get("default-spec-id").asInt() == 0,
      "unmarked bucket tables must export under the unpartitioned spec")
  }

  test("truncate(4, name): string prefixes cluster and prune equality") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.hp")
    spark.sql("""CREATE TABLE graft.hp.tr (name STRING, v DOUBLE)
                 PARTITIONED BY (truncate(4, name))""")
    val dir = new Path(s"$warehouse/hp/tr")
    assert(cat.ops.load(dir).get._2.specs.head.fields.map(_.transform) == Seq("truncate[4]"))

    import spark.implicits._
    val rows = (0 until 2000).map(i => (f"w${i % 20}%03d_${i}%04d", i * 1.0)).toDF("name", "v")
    cat.ops.write(dir, rows, "append", numFiles = Some(10))
    val all = scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.tr"))
    val pre = scannedPaths(spark.sql(
      "SELECT sum(v) FROM graft.hp.tr WHERE name = 'w007_0007'"))
    assert(pre < all, s"prefix clustering must prune equality: $pre of $all")
    assert(spark.sql("SELECT count(*) FROM graft.hp.tr WHERE name LIKE 'w007%'")
      .collect()(0).getLong(0) == 100L)
  }

  test("unsupported transform/source combinations fail at CREATE") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.hp")
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE graft.hp.bad (v DOUBLE) PARTITIONED BY (bucket(4, v))""")
    }
    assert(e.getMessage.contains("not applicable"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("""CREATE TABLE graft.hp.bad2 (s STRING) PARTITIONED BY (days(s))""")
    }
    assert(e2.getMessage.contains("not applicable"), e2.getMessage)
  }

  test("spec evolution to a transform layout (C38 ∘ C65): new writes bucket, old files stay readable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.hp")
    spark.sql("CREATE TABLE graft.hp.ev2 (k BIGINT, v DOUBLE)")
    val dir = new Path(s"$warehouse/hp/ev2")
    import spark.implicits._
    cat.ops.write(dir, (0L until 1000L).map(i => (i % 50L, i * 1.0)).toDF("k", "v"), "append")

    // evolve the unpartitioned table onto a bucket[4] spec
    val (_, m) = cat.ops.load(dir).get
    val kId = m.currentSchema.fields.find(_.name == "k").get.id
    cat.ops.commit(dir, Seq.empty, Seq(
      MetadataUpdate.AddSpec(PartitionSpec(1,
        Seq(PartitionField(kId, 1001, "k", "bucket[4]")))),
      MetadataUpdate.SetDefaultSpec(1)))
    cat.ops.write(dir, (1000L until 2000L).map(i => (i % 50L, i * 1.0)).toDF("k", "v"),
      "append", numFiles = Some(4))

    // post-evolution files carry bucket stats; pre-evolution files don't
    val entries = cat.ops.snapshotEntries(dir, cat.ops.load(dir).get._2.currentSnapshot.get)
    assert(entries.exists(_.stats.contains("__pt_k")), "new files have bucket stats")
    assert(entries.exists(e => !e.stats.contains("__pt_k")), "old files kept without them")
    // equality predicate: old files conservatively kept, new ones pruned —
    // and the answer is exact across both layouts
    assert(spark.sql("SELECT count(*) FROM graft.hp.ev2 WHERE k = 7").collect()(0).getLong(0) == 40L)
  }

  test("SQL INSERT into a day-partitioned table clusters via required ordering") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.hp")
    spark.sql("""CREATE TABLE graft.hp.ins (id BIGINT, ts TIMESTAMP, v DOUBLE)
                 PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft.hp.ins
                 SELECT id, timestampadd(DAY, CAST(id % 6 AS INT), TIMESTAMP '2026-04-01 08:00:00'), id * 1.0
                 FROM range(600) t(id)""")
    // files carry tight ts ranges → a day filter reads fewer files
    val all = scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.ins"))
    val one = scannedPaths(spark.sql(
      """SELECT sum(v) FROM graft.hp.ins
         WHERE ts >= TIMESTAMP '2026-04-03 00:00:00' AND ts < TIMESTAMP '2026-04-04 00:00:00'"""))
    assert(one <= all, s"$one of $all")
    assert(spark.sql(
      """SELECT count(*) FROM graft.hp.ins
         WHERE ts >= TIMESTAMP '2026-04-03 00:00:00' AND ts < TIMESTAMP '2026-04-04 00:00:00'""")
      .collect()(0).getLong(0) == 100L)
  }

  test("C72: SQL INSERT into a bucket table materializes __pt_ stats and prunes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.hp")
    spark.sql("""CREATE TABLE graft.hp.sqlbk (k BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(8, k))
                 TBLPROPERTIES ('graft.write.target-file-count'='8')""")
    spark.sql("""INSERT INTO graft.hp.sqlbk
                 SELECT CAST(id % 200 AS BIGINT), id * 0.25 FROM range(4000) t(id)""")
    val dir = new Path(s"$warehouse/hp/sqlbk")

    // SQL-inserted files carry the hidden bucket column's footer stats
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(entries.nonEmpty && entries.forall(_.stats.contains("__pt_k")),
      s"SQL-inserted files must carry __pt_k stats: ${entries.map(_.stats.keySet)}")
    // the hidden column never surfaces in reads
    assert(spark.table("graft.hp.sqlbk").columns.toSeq == Seq("k", "v"))

    // bucket()-sorted distribution gives single-bucket-range files →
    // equality prunes through the hash exactly like the API write path
    val all = scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.sqlbk"))
    val one = scannedPaths(spark.sql("SELECT sum(v) FROM graft.hp.sqlbk WHERE k = 7"))
    assert(all >= 4, s"got $all")
    assert(one <= 2, s"equality must prune to ~1 bucket file of $all, got $one")
    assert(spark.sql("SELECT count(*) FROM graft.hp.sqlbk WHERE k = 7")
      .collect()(0).getLong(0) == 20L)
    // the materialized value agrees with the catalog bucket() function
    // (= the pruning hash): rows of one k land in one bucket file set
    assert(spark.sql("SELECT sum(v) FROM graft.hp.sqlbk WHERE k IN (7, 11, 42)")
      .collect()(0).getDouble(0) ==
      (0L until 4000L).filter(i => Set(7L, 11L, 42L)(i % 200L)).map(_ * 0.25).sum)
  }
}
