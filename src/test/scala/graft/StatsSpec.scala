package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.sources._

import graft.catalog._

/** Manifest column stats + file skipping: footer stats land in the
  * manifest at commit, clustered writes give files tight ranges, and
  * scans prune provably-excluded files before the parquet delegate
  * ever sees them. */
class StatsSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  private def scannedPaths(df: DataFrame): Int = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    "InMemoryFileIndex\\((\\d+) paths\\)".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
      .getOrElse(fail(s"no file index in plan: ${plan.take(500)}"))
  }

  test("clustered write records per-file min/max; scans skip files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.ev (id BIGINT, bucket BIGINT, v DOUBLE) PARTITIONED BY (bucket)")
    // 4 buckets × clustered write → one tight file range per bucket
    import spark.implicits._
    val df = (0L until 4000L).map(i => (i, i / 1000L, i * 0.5)).toDF("id", "bucket", "v")
    val dir = new Path(s"$warehouse/stats/ev")
    cat.ops.write(dir, df, "append", numFiles = Some(4))

    val (_, meta) = cat.ops.load(dir).get
    val entries = cat.ops.snapshotEntries(dir, meta.currentSnapshot.get)
    assert(entries.size >= 2, "clustered write should produce multiple files")
    assert(entries.forall(_.rows.exists(_ > 0)))
    assert(entries.forall(_.stats.contains("bucket")))
    // each file covers at most ~2 buckets (range clustering)
    entries.foreach { e =>
      val cs = e.stats("bucket")
      assert(cs.max.get.toDouble - cs.min.get.toDouble <= 1.0,
        s"file spans too many buckets: $cs")
    }

    // a bucket-selective query must scan fewer files than the full scan
    val all = scannedPaths(spark.sql("SELECT sum(v) FROM graft.stats.ev"))
    val one = scannedPaths(spark.sql("SELECT sum(v) FROM graft.stats.ev WHERE bucket = 3"))
    assert(all == entries.size)
    assert(one < all, s"expected file skipping: $one vs $all")
    // correctness: skipped result equals unfiltered recomputation
    val expect = (3000L until 4000L).map(_ * 0.5).sum
    assert(spark.sql("SELECT sum(v) FROM graft.stats.ev WHERE bucket = 3")
      .collect().head.getDouble(0) == expect)
  }

  test("DSv2 INSERT on a partitioned table clusters and skips too") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.ins (id BIGINT, grp BIGINT) PARTITIONED BY (grp) " +
      "TBLPROPERTIES ('graft.write.target-file-count'='4')")
    spark.range(0, 8000).selectExpr("id", "id % 8 AS grp")
      .write.mode("append").saveAsTable("graft.stats.ins")
    val dir = new Path(s"$warehouse/stats/ins")
    val (_, meta) = cat.ops.load(dir).get
    val entries = cat.ops.snapshotEntries(dir, meta.currentSnapshot.get)
    assert(entries.size >= 2)
    // sum() is not stat-answerable, so this still scans (count(*)
    // would now plan as a C82 metadata-only LocalScan — no file index)
    val all = scannedPaths(spark.sql("SELECT sum(id) FROM graft.stats.ins"))
    val one = scannedPaths(spark.sql("SELECT count(*) FROM graft.stats.ins WHERE grp = 5"))
    assert(one < all, s"expected file skipping through DSv2 write: $one vs $all")
    assert(spark.sql("SELECT count(*) FROM graft.stats.ins WHERE grp = 5")
      .collect().head.getLong(0) == 1000L)
  }

  test("mayContain is conservative and exact on the supported shapes") {
    val e = DataFileEntry("f", Some(100L), Map(
      "x" -> ColumnStats(Some("10"), Some("20"), Some(0L)),
      "s" -> ColumnStats(Some("apple"), Some("mango"), Some(5L))))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("x BIGINT, s STRING, z DOUBLE")
    def may(f: Filter) = Stats.mayContain(e, schema, f)

    assert(!may(EqualTo("x", 5L)) && may(EqualTo("x", 15L)) && !may(EqualTo("x", 25L)))
    assert(!may(GreaterThan("x", 20L)) && may(GreaterThanOrEqual("x", 20L)))
    assert(!may(LessThan("x", 10L)) && may(LessThanOrEqual("x", 10L)))
    assert(may(In("x", Array(1L, 15L))) && !may(In("x", Array(1L, 2L))))
    assert(!may(EqualTo("s", "zebra")) && may(EqualTo("s", "banana")))
    assert(!may(IsNull("x")) && may(IsNull("s")) && may(IsNotNull("x")))
    assert(may(EqualTo("z", 1.0)), "no stats for z → keep")
    assert(!may(And(EqualTo("x", 15L), EqualTo("s", "zebra"))))
    assert(may(Or(EqualTo("x", 25L), EqualTo("s", "banana"))))
    assert(may(Not(EqualTo("x", 15L))), "Not is conservative")
    // all-null column: IsNotNull can exclude
    val en = DataFileEntry("f", Some(10L), Map("x" -> ColumnStats(Some("1"), Some("2"), Some(10L))))
    assert(!Stats.mayContain(en, schema, IsNotNull("x")))
  }

  test("default sort order range-clusters unpartitioned writes; scans skip") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.sorted (id BIGINT, v DOUBLE)")
    val dir = new Path(s"$warehouse/stats/sorted")
    // declare a default sort order on id via the commit protocol
    // (reference: add-sort-order + set-default-sort-order)
    val (_, m0) = cat.ops.load(dir).get
    val idField = m0.currentSchema.fields.find(_.name == "id").get.id
    cat.ops.commit(dir, Seq.empty, Seq(
      MetadataUpdate.AddSortOrder(SortOrder(1,
        Seq(SortField(idField, "identity", "asc", "nulls-first")))),
      MetadataUpdate.SetDefaultSortOrder(1)))

    import spark.implicits._
    cat.ops.write(dir,
      spark.range(0, 1000).toDF("id").withColumn("v", org.apache.spark.sql.functions.rand(7)),
      "append", numFiles = Some(4))

    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(entries.size == 4)
    // range clustering on the sort column → pairwise-disjoint id ranges
    val ranges = entries.map { e =>
      val cs = e.stats("id")
      (cs.min.get.toLong, cs.max.get.toLong)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax < bMin, s"overlap: $ranges")
      case _ => ()
    }
    // point lookup provably needs exactly one file
    val f = org.apache.spark.sql.sources.EqualTo("id", 500L)
    val schema = SchemaBridge.toSpark(cat.ops.load(dir).get._2.currentSchema)
    assert(entries.count(e => Stats.mayContain(e, schema, f)) == 1)
    // rows are sorted within each file (first file read back in order)
    val firstFile = entries.sortBy(_.stats("id").min.get.toLong).head
    val ids = spark.read.parquet(firstFile.path).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, "rows must be sorted by the sort order within a file")
    // SQL INSERT honors the sort order too (RequiresDistributionAndOrdering)
    spark.sql("INSERT INTO graft.stats.sorted VALUES (2000, 0.5), (1500, 0.5)")
    val after = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    val newest = after.filterNot(e => entries.map(_.path).contains(e.path))
    assert(newest.forall(e => e.stats.get("id").exists(_.min.isDefined)))
  }

  test("manifest statistics reach the planner and drive broadcast selection") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.dim (k BIGINT, name STRING)")
    spark.sql("CREATE TABLE graft.stats.fact (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.stats.dim VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("INSERT INTO graft.stats.fact SELECT id % 3 + 1, CAST(id AS DOUBLE) FROM range(0, 10000)")

    // without SupportsReportStatistics a DSv2 relation falls back to
    // defaultSizeInBytes (effectively infinite) and can never broadcast
    val df = spark.sql(
      "SELECT name, sum(v) FROM graft.stats.fact f JOIN graft.stats.dim d ON f.k = d.k GROUP BY name")
    assert(df.collect().length == 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dim must broadcast from manifest stats, plan was:\n$plan")

    // reported rows are post-pruning: a pruned scan reports fewer rows
    val dir = new Path(s"$warehouse/stats/dim")
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(entries.forall(e => e.rows.isDefined && e.bytes.isDefined),
      "commit must record rows and bytes per file")
  }

  test("z-ordered writes prune files on BOTH clustered dimensions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.z (x BIGINT, y BIGINT)")
    val dir = new Path(s"$warehouse/stats/z")
    import spark.implicits._
    // 100x100 grid → 16 files; z-order gives each file a compact tile
    val grid = (for (x <- 0L until 100L; y <- 0L until 100L) yield (x, y)).toDF("x", "y")
    cat.ops.writeZOrdered(dir, grid, Seq("x", "y"), numFiles = 16)

    assert(spark.sql("SELECT count(*) FROM graft.stats.z").collect().head.getLong(0) == 10000)
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(entries.size == 16)
    val schema = SchemaBridge.toSpark(cat.ops.load(dir).get._2.currentSchema)
    import org.apache.spark.sql.sources.{And, GreaterThanOrEqual, LessThanOrEqual}
    def filesFor(c: String, lo: Long, hi: Long): Int =
      entries.count(e => Stats.mayContain(e, schema,
        And(GreaterThanOrEqual(c, lo), LessThanOrEqual(c, hi))))
    // a 10%-wide slice on EITHER dimension must prune most files —
    // single-column sort would only prune on the leading column
    assert(filesFor("x", 40, 50) <= 8, s"x-slice hit ${filesFor("x", 40, 50)}/16")
    assert(filesFor("y", 40, 50) <= 8, s"y-slice hit ${filesFor("y", 40, 50)}/16")
    // and the slices are correct, not just pruned
    assert(spark.sql("SELECT count(*) FROM graft.stats.z WHERE x BETWEEN 40 AND 50")
      .collect().head.getLong(0) == 11 * 100)
    assert(spark.sql("SELECT count(*) FROM graft.stats.z WHERE y BETWEEN 40 AND 50")
      .collect().head.getLong(0) == 11 * 100)
  }

  test("3-column z-order prunes on every clustered dimension") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.z3 (x BIGINT, y BIGINT, z BIGINT)")
    val dir = new Path(s"$warehouse/stats/z3")
    import spark.implicits._
    val grid = (for (x <- 0L until 20L; y <- 0L until 20L; z <- 0L until 20L)
      yield (x, y, z)).toDF("x", "y", "z")
    cat.ops.writeZOrdered(dir, grid, Seq("x", "y", "z"), numFiles = 8)

    assert(spark.sql("SELECT count(*) FROM graft.stats.z3").collect().head.getLong(0) == 8000)
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(entries.size == 8)
    val schema = SchemaBridge.toSpark(cat.ops.load(dir).get._2.currentSchema)
    import org.apache.spark.sql.sources.{And, GreaterThanOrEqual, LessThanOrEqual}
    def filesFor(c: String, lo: Long, hi: Long): Int =
      entries.count(e => Stats.mayContain(e, schema,
        And(GreaterThanOrEqual(c, lo), LessThanOrEqual(c, hi))))
    // 8 files = one z-tile per octant → a half-range slice on ANY of
    // the three dims must drop half the files
    for (c <- Seq("x", "y", "z"))
      assert(filesFor(c, 0, 9) <= 4, s"$c-slice hit ${filesFor(c, 0, 9)}/8")
    assert(spark.sql("SELECT count(*) FROM graft.stats.z3 WHERE y BETWEEN 0 AND 9")
      .collect().head.getLong(0) == 20L * 10L * 20L)
  }

  test("hilbert-clustered writes prune files on BOTH dimensions; curve is exact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.h (x BIGINT, y BIGINT)")
    val dir = new Path(s"$warehouse/stats/h")
    import spark.implicits._
    val grid = (for (x <- 0L until 100L; y <- 0L until 100L) yield (x, y)).toDF("x", "y")

    // the Column-unrolled curve must match the scalar reference
    // bit-for-bit; the expected value replays the SAME IEEE
    // normalization the Column does, so rounding can't diverge
    val cells = (for (x <- 0L until 256L by 17L; y <- 0L until 256L by 13L) yield (x, y))
      .toDF("x", "y")
    val (mxX, mxY) = (255.0, 247.0)
    def norm(v: Long, mx: Double): Long = (v.toDouble / mx * 255.0).toLong
    val computed = ZOrder.withHilbert(cells, Seq("x", "y"), "h")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    computed.foreach { case ((x, y), h) =>
      val expected = ZOrder.hilbertIndex(norm(x, mxX), norm(y, mxY))
      assert(h == expected, s"hilbert($x,$y): got $h want $expected")
    }

    cat.ops.writeHilbertClustered(dir, grid, Seq("x", "y"), numFiles = 16)
    assert(spark.sql("SELECT count(*) FROM graft.stats.h").collect().head.getLong(0) == 10000)
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(entries.size == 16)
    val schema = SchemaBridge.toSpark(cat.ops.load(dir).get._2.currentSchema)
    import org.apache.spark.sql.sources.{And, GreaterThanOrEqual, LessThanOrEqual}
    def filesFor(c: String, lo: Long, hi: Long): Int =
      entries.count(e => Stats.mayContain(e, schema,
        And(GreaterThanOrEqual(c, lo), LessThanOrEqual(c, hi))))
    assert(filesFor("x", 40, 50) <= 8, s"x-slice hit ${filesFor("x", 40, 50)}/16")
    assert(filesFor("y", 40, 50) <= 8, s"y-slice hit ${filesFor("y", 40, 50)}/16")
    assert(spark.sql("SELECT count(*) FROM graft.stats.h WHERE x BETWEEN 40 AND 50")
      .collect().head.getLong(0) == 11 * 100)
    assert(spark.sql("SELECT count(*) FROM graft.stats.h WHERE y BETWEEN 40 AND 50")
      .collect().head.getLong(0) == 11 * 100)
  }

  test("3-D hilbert: Skilling curve walks adjacent cells; files prune on all dims") {
    // exhaustive 8x8x8 grid (3 bits/dim): the index must be a
    // bijection AND consecutive curve positions must be
    // Manhattan-adjacent cells — THE Hilbert property
    val bits = 3
    val n = 1 << bits
    val all = for (x <- 0 until n; y <- 0 until n; z <- 0 until n)
      yield (x.toLong, y.toLong, z.toLong)
    val indexed = all.map(c => graft.functions.HilbertIndex.index(
      Array(c._1, c._2, c._3), bits) -> c)
    assert(indexed.map(_._1).distinct.size == n * n * n, "bijection")
    val walk = indexed.sortBy(_._1).map(_._2)
    walk.sliding(2).foreach { case Seq(a, b) =>
      val dist = math.abs(a._1 - b._1) + math.abs(a._2 - b._2) + math.abs(a._3 - b._3)
      assert(dist == 1, s"curve jumped from $a to $b (distance $dist)")
    }

    // Column expression agrees with the driver-side reference
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.h3 (x BIGINT, y BIGINT, z BIGINT)")
    val dir = new Path(s"$warehouse/stats/h3")
    import spark.implicits._
    val grid = (for (x <- 0L until 20L; y <- 0L until 20L; z <- 0L until 20L)
      yield (x, y, z)).toDF("x", "y", "z")
    def norm(v: Long): Long = v * 255 / 19
    ZOrder.withHilbert(grid, Seq("x", "y", "z"), "h")
      .collect().foreach { r =>
        val expected = graft.functions.HilbertIndex.index(
          Array(norm(r.getLong(0)), norm(r.getLong(1)), norm(r.getLong(2))), 8)
        assert(r.getLong(3) == expected,
          s"hilbert3(${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}) mismatch")
      }

    // clustered write prunes slices on ALL THREE dimensions
    cat.ops.writeHilbertClustered(dir, grid, Seq("x", "y", "z"), numFiles = 16)
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(entries.size == 16)
    val schema = SchemaBridge.toSpark(cat.ops.load(dir).get._2.currentSchema)
    import org.apache.spark.sql.sources.{And, GreaterThanOrEqual, LessThanOrEqual}
    def filesFor(c: String, lo: Long, hi: Long): Int =
      entries.count(e => Stats.mayContain(e, schema,
        And(GreaterThanOrEqual(c, lo), LessThanOrEqual(c, hi))))
    Seq("x", "y", "z").foreach { c =>
      assert(filesFor(c, 0, 4) <= 12, s"$c-slice hit ${filesFor(c, 0, 4)}/16")
    }
    assert(spark.sql("SELECT count(*) FROM graft.stats.h3 WHERE x BETWEEN 0 AND 4")
      .collect().head.getLong(0) == 5L * 20 * 20)
  }

  test("compactSmallFiles rewrites only the small-file tail") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.bp (id BIGINT, pad STRING)")
    val dir = new Path(s"$warehouse/stats/bp")
    import spark.implicits._
    // one big file + a tail of small ones
    cat.ops.write(dir,
      spark.range(0, 20000).toDF("id")
        .withColumn("pad", org.apache.spark.sql.functions.lpad(
          org.apache.spark.sql.functions.col("id").cast("string"), 64, "x")),
      "append", numFiles = Some(1))
    (0 until 5).foreach(i =>
      spark.sql(s"INSERT INTO graft.stats.bp VALUES ($i, 'tiny')"))
    val before = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    val bigBefore = before.maxBy(_.bytes.getOrElse(0L))

    cat.ops.compactSmallFiles(spark, dir, smallBytes = 100000L, targetBytes = 1000000L)

    val after = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    assert(after.map(_.path).contains(bigBefore.path), "big file kept verbatim")
    assert(after.size < before.size, s"tail must shrink: ${before.size} -> ${after.size}")
    assert(spark.sql("SELECT count(*) FROM graft.stats.bp").collect().head.getLong(0) == 20005)
  }

  test("partition statistics files: persisted rollup, staleness fallback") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.ps (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    val dir = new Path(s"$warehouse/stats/ps")
    spark.sql("INSERT INTO graft.stats.ps SELECT id, 0 FROM range(0, 10)")
    spark.sql("INSERT INTO graft.stats.ps SELECT id, 1 FROM range(0, 20)")

    cat.ops.computePartitionStats(dir)
    val (_, m1) = cat.ops.load(dir).get
    assert(m1.statistics.nonEmpty, "set-statistics must register the stats file")
    val persisted = cat.ops.readPartitionStats(dir, m1)
    assert(persisted.isDefined)
    assert(persisted.get.map(p => (p.partition, p.rows)) ==
      Seq((Some("day=0"), 10L), (Some("day=1"), 20L)))

    // $partitions serves the persisted rollup
    val viaView = spark.sql(
      "SELECT partition, record_count FROM graft.stats.ps$pview ORDER BY partition"
        .replace("ps$pview", "`ps$partitions`")).collect()
    assert(viaView.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("day=0", 10L), ("day=1", 20L)))

    // a newer commit makes the stats stale: readers fall back to the
    // manifest (readPartitionStats is None), and recompute re-pins
    spark.sql("INSERT INTO graft.stats.ps SELECT id, 2 FROM range(0, 5)")
    val (_, m2) = cat.ops.load(dir).get
    assert(cat.ops.readPartitionStats(dir, m2).isEmpty, "stale stats must not serve")
    val fresh = spark.sql(
      "SELECT partition, record_count FROM graft.stats.`ps$partitions` ORDER BY partition")
      .collect()
    assert(fresh.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("day=0", 10L), ("day=1", 20L), ("day=2", 5L)))
    cat.ops.computePartitionStats(dir)
    assert(cat.ops.readPartitionStats(dir, cat.ops.load(dir).get._2).isDefined)
  }

  test("eq-delete key ranges skip non-overlapping data files; application stays exact") {
    import org.apache.spark.sql.types._
    // unit semantics of the overlap check (both sides from manifests)
    def entry(mn: String, mx: String) = DataFileEntry("f",
      stats = Map("id" -> ColumnStats(Some(mn), Some(mx), Some(0L))))
    val schema = StructType(Seq(StructField("id", LongType)))
    assert(Stats.rangesMayOverlap(entry("5", "7"), entry("0", "99"), schema, "id"))
    assert(Stats.rangesMayOverlap(entry("90", "110"), entry("0", "99"), schema, "id"))
    assert(!Stats.rangesMayOverlap(entry("100", "110"), entry("0", "99"), schema, "id"))
    assert(!Stats.rangesMayOverlap(entry("5", "7"), entry("1000", "1099"), schema, "id"))
    // missing stats on either side ⇒ conservative true
    assert(Stats.rangesMayOverlap(DataFileEntry("f"), entry("0", "9"), schema, "id"))
    assert(Stats.rangesMayOverlap(entry("0", "9"), DataFileEntry("g"), schema, "id"))
    // numeric compare, not lexicographic: "9" < "10" as longs
    assert(Stats.rangesMayOverlap(entry("9", "9"), entry("8", "10"), schema, "id"))
    val sSchema = StructType(Seq(StructField("id", StringType)))
    assert(!Stats.rangesMayOverlap(entry("a", "b"), entry("c", "d"), sSchema, "id"))

    // end-to-end: two disjoint-range data files, a delete inside one
    // range only, plus a delete SPANNING both ranges without touching
    // the second file's keys — every read stays exact on both paths
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.eqskip (id BIGINT, v STRING)")
    val dir = new Path(s"$warehouse/stats/eqskip")
    import spark.implicits._
    cat.ops.write(dir, (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v"),
      "append", numFiles = Some(1))
    cat.ops.write(dir, (1000L until 1100L).map(i => (i, s"b$i")).toDF("id", "v"),
      "append", numFiles = Some(1))
    cat.ops.mergeOnReadDelete(spark, dir, Seq(5L, 7L).toDF("id"),
      numFiles = Some(1)) // range [5,7] — provably disjoint from file 2
    cat.ops.mergeOnReadDelete(spark, dir, Seq(50L, 1050L).toDF("id"),
      numFiles = Some(1)) // spans both ranges — must apply to both
    val viaSql = spark.sql("SELECT count(*) FROM graft.stats.eqskip")
      .collect().head.getLong(0)
    val viaOps = cat.ops.read(spark, dir).count()
    assert(viaSql == 196L && viaOps == 196L, s"sql=$viaSql ops=$viaOps")
    assert(spark.sql(
      "SELECT count(*) FROM graft.stats.eqskip WHERE id IN (5, 7, 50, 1050)")
      .collect().head.getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) FROM graft.stats.eqskip WHERE id >= 1000")
      .collect().head.getLong(0) == 99L)
    // the delete entries DO carry the stats that make skipping possible
    val dels = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .filter(_.isEqDelete)
    assert(dels.nonEmpty && dels.forall(e =>
      e.rows.isDefined && e.stats.get("id").exists(s => s.min.isDefined && s.max.isDefined)))
  }

  test("scan exposes manifest-pruning metrics (kept/skipped files)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.met (id BIGINT) PARTITIONED BY (id)")
    val dir = new Path(s"$warehouse/stats/met")
    import spark.implicits._
    cat.ops.write(dir, spark.range(0, 100).toDF("id"), "append", numFiles = Some(4))

    // drive the scan through the DSv2 builder the way Spark does
    val table = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("stats"), "met"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val builder = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(new java.util.HashMap()))
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, LessThan, Literal}
    val idAttr = AttributeReference("id", org.apache.spark.sql.types.LongType)()
    builder.asInstanceOf[org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters]
      .pushFilters(Seq(LessThan(idAttr, Literal(25L))))
    val scan = builder.build()
    assert(scan.supportedCustomMetrics().map(_.name()).toSet ==
      Set("graftFilesKept", "graftFilesSkipped"))
    val vals = scan.reportDriverMetrics().map(m => m.name() -> m.value()).toMap
    assert(vals("graftFilesKept") + vals("graftFilesSkipped") == 4)
    assert(vals("graftFilesSkipped") >= 2,
      s"a quarter-range filter must skip most of 4 range-clustered files: $vals")
  }

  test("C63: runtime IN-filter prunes files and re-plans the delegate") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.rtf (k BIGINT, v DOUBLE) PARTITIONED BY (k)")
    val dir = new Path(s"$warehouse/stats/rtf")
    import spark.implicits._
    val df = (0L until 8000L).map(i => (i / 1000L, i * 0.25)).toDF("k", "v")
    cat.ops.write(dir, df, "append", numFiles = Some(8))

    val table = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("stats"), "rtf"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val builder = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(new java.util.HashMap()))
    val scan = builder.build()
    val rf = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]
    // the join key is a declared runtime-filterable attribute
    assert(rf.filterAttributes().map(_.fieldNames().mkString(".")).contains("k"))
    val before = scan.toBatch.planInputPartitions().length

    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    def lv(v: Long) = new org.apache.spark.sql.connector.expressions.Literal[Long] {
      override def value(): Long = v
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType
    }
    val in = new Predicate("IN", Array(
      Expressions.column("k"), lv(2L), lv(5L)))
    rf.filter(Array(in))
    val after = scan.toBatch.planInputPartitions().length
    assert(after < before, s"runtime filter must drop partitions: $before -> $after")
    val vals = scan.reportDriverMetrics().map(m => m.name() -> m.value()).toMap
    assert(vals("graftFilesKept") <= 3, s"8 range-clustered files, 2 keys kept: $vals")

    // unknown predicate shapes are ignored, never wrong
    rf.filter(Array(new Predicate("ALWAYS_TRUE", Array.empty)))
    assert(scan.toBatch.planInputPartitions().length == after)

    // end-to-end: a selective dim join still answers correctly
    // (whether or not the optimizer chose to inject dynamic pruning)
    Seq(2L, 5L).toDF("dk").createOrReplaceTempView("rtf_dim")
    val joined = spark.sql(
      """SELECT k, COUNT(*) AS n, SUM(v) AS s
         FROM graft.stats.rtf JOIN rtf_dim ON k = dk
         GROUP BY k ORDER BY k""").collect()
    assert(joined.map(_.getLong(0)).toSeq == Seq(2L, 5L))
    assert(joined.forall(_.getLong(1) == 1000L))
  }

  test("C63 end-to-end: a selective dim join injects dynamic pruning and re-plans to fewer files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.dppf (k BIGINT, v DOUBLE) PARTITIONED BY (k)")
    val dir = new Path(s"$warehouse/stats/dppf")
    import spark.implicits._
    cat.ops.write(dir,
      (0L until 80000L).map(i => (i / 10000L, i * 0.5)).toDF("k", "v"),
      "append", numFiles = Some(8))
    spark.sql("CREATE TABLE graft.stats.dppd (dk BIGINT, name STRING)")
    spark.sql("INSERT INTO graft.stats.dppd VALUES (2, 'two'), (5, 'five')")

    val q = spark.sql(
      "SELECT sum(v) FROM graft.stats.dppf JOIN graft.stats.dppd ON k = dk WHERE name = 'two'")
    val result = q.collect()(0).getDouble(0)
    val plan = q.queryExecution.executedPlan.toString
    // the optimizer chose to inject a dynamic-pruning subquery on the
    // fact scan (proves filterAttributes + stats made it eligible)...
    assert(plan.contains("dynamicpruningexpression"), plan.take(1500))
    // ...and the runtime IN-set re-planned the parquet delegate down
    // to the matching file(s)
    val paths = "InMemoryFileIndex\\((\\d+) paths\\)".r
      .findAllMatchIn(plan).map(_.group(1).toInt).toList
    assert(paths.nonEmpty && paths.min <= 2,
      s"fact side must read <=2 of 8 files after runtime pruning: $paths")
    assert(result == (20000L until 30000L).map(_ * 0.5).sum, s"got $result")
  }

  test("time travel still resolves legacy and stats manifests") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.tt2 (id BIGINT)")
    spark.sql("INSERT INTO graft.stats.tt2 VALUES (1)")
    spark.sql("INSERT INTO graft.stats.tt2 VALUES (2)")
    val dir = new Path(s"$warehouse/stats/tt2")
    val (_, meta) = cat.ops.load(dir).get
    val first = meta.snapshots.minBy(_.sequenceNumber)
    assert(spark.sql(s"SELECT * FROM graft.stats.tt2 VERSION AS OF ${first.snapshotId}")
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("C82 aggregate pushdown: COUNT/MIN/MAX answered from manifest stats, zero file reads") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.agg (id BIGINT, v DOUBLE, s STRING, d DATE, t TIMESTAMP)")
    spark.sql("INSERT INTO graft.stats.agg VALUES " +
      "(1, 1.5, 'aa', DATE '2026-01-05', TIMESTAMP '2026-01-05 10:00:00'), " +
      "(2, 2.5, 'bb', DATE '2026-02-01', TIMESTAMP '2026-02-01 09:30:00')")
    spark.sql("INSERT INTO graft.stats.agg VALUES " +
      "(3, NULL, 'cc', DATE '2025-12-31', TIMESTAMP '2025-12-31 23:59:59'), " +
      "(4, 4.5, 'zz', DATE '2026-03-01', TIMESTAMP '2026-03-01 00:00:01')")

    val df = spark.sql(
      "SELECT count(*), count(v), min(id), max(id), min(v), max(v), min(s), max(s), " +
      "min(d), max(d), min(t) FROM graft.stats.agg")
    val row = df.collect().head
    assert(row.getLong(0) == 4 && row.getLong(1) == 3)
    assert(row.getLong(2) == 1 && row.getLong(3) == 4)
    assert(row.getDouble(4) == 1.5 && row.getDouble(5) == 4.5)
    assert(row.getString(6) == "aa" && row.getString(7) == "zz")
    assert(row.getDate(8).toString == "2025-12-31" && row.getDate(9).toString == "2026-03-01")
    assert(row.getTimestamp(10).toString.startsWith("2025-12-31 23:59:59"))
    // the whole aggregation planned as a LocalTableScan — no file scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan.take(800))
    assert(!plan.contains("BatchScan") && !plan.contains("FileScan"),
      "no data files may be read: " + plan.take(800))

    // a filter refuses the pushdown (stats can't answer residual rows)
    // and the normal scan gives the same truth
    val filtered = spark.sql("SELECT count(*) FROM graft.stats.agg WHERE id > 2")
    assert(filtered.queryExecution.executedPlan.toString.contains("Scan"))
    assert(filtered.collect().head.getLong(0) == 2)

    // pending MOR deletes refuse the pushdown — counts stay truthful
    import spark.implicits._
    val dir = new Path(s"$warehouse/stats/agg")
    cat.ops.mergeOnReadDelete(spark, dir, Seq(1L).toDF("id"))
    val afterDelete = spark.sql("SELECT count(*), max(id) FROM graft.stats.agg")
    assert(afterDelete.collect().head.getLong(0) == 3)
    assert(!afterDelete.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "pushdown must refuse while deletes are pending")
    cat.ops.applyDeletes(spark, dir)
    // back to metadata-only after the purge
    val healed = spark.sql("SELECT count(*) FROM graft.stats.agg")
    assert(healed.collect().head.getLong(0) == 3)
    assert(healed.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("C83 LIMIT pushdown bounds the file list by manifest row counts") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")
    spark.sql("CREATE TABLE graft.stats.lim (id BIGINT)")
    (0 until 6).foreach(i =>
      spark.range(i * 100, (i + 1) * 100).write.mode("append").saveAsTable("graft.stats.lim"))

    // LIMIT 150 needs only the first files covering 150 manifest rows
    val total = cat.ops.resolveEntries(
      new Path(s"$warehouse/stats/lim"), cat.ops.load(new Path(s"$warehouse/stats/lim")).get._2)
      .count(_.isData)
    val df = spark.sql("SELECT id FROM graft.stats.lim LIMIT 150")
    assert(df.collect().length == 150)
    val plan = df.queryExecution.executedPlan.toString
    val scanned = "InMemoryFileIndex\\((\\d+) paths\\)".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
      .getOrElse(fail("no file index in plan: " + plan.take(600)))
    assert(scanned < total,
      s"limit must bound the file list: scanned $scanned of $total files")

    // a filter refuses the file-list cut (residual rows unknown) and
    // truth is preserved
    val filtered = spark.sql("SELECT id FROM graft.stats.lim WHERE id >= 550 LIMIT 10")
    assert(filtered.collect().map(_.getLong(0)).forall(_ >= 550))
  }

  test("C77 write distribution modes: hash co-locates keys without a sampling pass, none writes as-is") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stats")

    // hash mode: every partition value lands WHOLE in exactly one file
    // (no range-sampling job per commit — the streaming-writer trade)
    spark.sql("CREATE TABLE graft.stats.dmh (id BIGINT, grp BIGINT, v DOUBLE) " +
      "PARTITIONED BY (grp) TBLPROPERTIES ('graft.write.distribution-mode' = 'hash')")
    val dirH = new Path(s"$warehouse/stats/dmh")
    val df = (0L until 4000L).map(i => (i, i % 8, i * 0.5)).toDF("id", "grp", "v")
    cat.ops.write(dirH, df, "append", numFiles = Some(4))
    val split = spark.sql(
      "SELECT grp, count(DISTINCT _file) AS nf FROM graft.stats.dmh GROUP BY grp")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(split.length == 8 && split.forall(_._2 == 1L),
      s"hash mode must not split a key across files: ${split.mkString(", ")}")
    assert(spark.sql("SELECT sum(v) FROM graft.stats.dmh WHERE grp = 3")
      .collect().head.getDouble(0) ==
      (0L until 4000L).filter(_ % 8 == 3).map(_ * 0.5).sum)

    // none mode: the incoming partitioning IS the file layout (no
    // shuffle at all); an explicit compaction file count still binds
    spark.sql("CREATE TABLE graft.stats.dmn (id BIGINT, grp BIGINT) " +
      "PARTITIONED BY (grp) TBLPROPERTIES ('graft.write.distribution-mode' = 'none')")
    val dirN = new Path(s"$warehouse/stats/dmn")
    val pre = (0L until 900L).map(i => (i, i % 3)).toDF("id", "grp").repartition(3)
    cat.ops.write(dirN, pre, "append")
    val entries = cat.ops.resolveEntries(dirN, cat.ops.load(dirN).get._2)
    assert(entries.count(_.isData) == 3,
      s"none mode must write the incoming 3 partitions as 3 files, got ${entries.size}")
    assert(spark.sql("SELECT count(*) FROM graft.stats.dmn").collect().head.getLong(0) == 900L)
    cat.ops.compact(spark, dirN, numFiles = 1)
    assert(cat.ops.resolveEntries(dirN, cat.ops.load(dirN).get._2).count(_.isData) == 1)
    assert(spark.sql("SELECT count(*) FROM graft.stats.dmn").collect().head.getLong(0) == 900L)
  }
}
