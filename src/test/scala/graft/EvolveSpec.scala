package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** Partition-spec evolution: add-spec + set-default-spec re-shape only
  * FUTURE writes; old files keep their layout, reads span both, and
  * stats-based skipping works per-file regardless of which spec wrote
  * it (scan planning is stats-driven, not spec-driven). */
class EvolveSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  test("RENAME/DROP COLUMN: files read through field ids across renamed history") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ev")
    spark.sql("CREATE TABLE graft.ev.rn (id BIGINT, v DOUBLE, junk STRING)")
    val dir = new Path(s"$warehouse/ev/rn")
    spark.sql("INSERT INTO graft.ev.rn VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")

    spark.sql("ALTER TABLE graft.ev.rn RENAME COLUMN v TO val")
    spark.sql("INSERT INTO graft.ev.rn VALUES (3, 3.5, 'c')")

    // pre-rename rows surface under the NEW name (field-id reads), not null
    val rows = spark.sql("SELECT id, val FROM graft.ev.rn ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)), rows.mkString(", "))

    // predicates on the renamed column filter BOTH eras correctly
    assert(spark.sql("SELECT count(*) FROM graft.ev.rn WHERE val > 2.0")
      .collect().head.getLong(0) == 2)
    // manifest stats were re-keyed: a provably-out-of-range predicate
    // prunes pre-rename files too
    assert(spark.sql("SELECT count(*) FROM graft.ev.rn WHERE val > 100.0")
      .collect().head.getLong(0) == 0)

    // DROP: the column disappears over all eras; remaining data intact
    spark.sql("ALTER TABLE graft.ev.rn DROP COLUMN junk")
    val after = spark.sql("SELECT * FROM graft.ev.rn ORDER BY id").collect()
    assert(after.head.schema.fieldNames.toSeq == Seq("id", "val"))
    assert(after.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))

    // column added AFTER the rename null-fills old files (C29) and
    // coexists with the rename mapping
    spark.sql("ALTER TABLE graft.ev.rn ADD COLUMN w BIGINT")
    spark.sql("INSERT INTO graft.ev.rn VALUES (4, 4.5, 40)")
    val mixed = spark.sql("SELECT id, val, w FROM graft.ev.rn ORDER BY id").collect()
    assert(mixed.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.5), (2L, 2.5), (3L, 3.5), (4L, 4.5)))
    assert(mixed.take(3).forall(_.isNullAt(2)) && mixed.last.getLong(2) == 40L)

    // the API read path resolves the same way
    val api = cat.ops.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(api.toSeq == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5), (4L, 4.5)))

    // CDC over renamed history also reads old files correctly
    val feed = cat.ops.changes(spark, dir, 0L, Long.MaxValue)
    assert(feed.filter("_change_type = 'insert'").count() == 4)
    assert(feed.filter("val = 1.5").count() == 1)
  }

  test("name reuse after RENAME/DROP: new column null-fills, never resurrects old data") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ev")

    // RENAME v -> val, then ADD a NEW column reusing the freed name v:
    // for pre-rename files the new v must be NULL (its field id is not
    // in their write schema) while val still carries the old v data.
    spark.sql("CREATE TABLE graft.ev.reuse (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.ev.reuse VALUES (1, 1.5), (2, 2.5)")
    spark.sql("ALTER TABLE graft.ev.reuse RENAME COLUMN v TO val")
    spark.sql("ALTER TABLE graft.ev.reuse ADD COLUMN v BIGINT")
    spark.sql("INSERT INTO graft.ev.reuse VALUES (3, 3.5, 30)")
    val rows = spark.sql("SELECT id, val, v FROM graft.ev.reuse ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)), rows.mkString(", "))
    assert(rows.take(2).forall(_.isNullAt(2)),
      s"new column v must null-fill pre-rename files, got ${rows.mkString(", ")}")
    assert(rows.last.getLong(2) == 30L)

    // DROP then re-ADD the same name: old files must read NULL for the
    // re-added column, not the dropped column's values.
    spark.sql("CREATE TABLE graft.ev.readd (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.ev.readd VALUES (1, 1.5)")
    spark.sql("ALTER TABLE graft.ev.readd DROP COLUMN v")
    spark.sql("ALTER TABLE graft.ev.readd ADD COLUMN v DOUBLE")
    spark.sql("INSERT INTO graft.ev.readd VALUES (2, 9.5)")
    val r2 = spark.sql("SELECT id, v FROM graft.ev.readd ORDER BY id").collect()
    assert(r2.head.isNullAt(1),
      s"re-added v must be NULL for pre-drop files, got ${r2.mkString(", ")}")
    assert(r2.last.getDouble(1) == 9.5)
  }

  test("streaming replay across a rename reads old snapshots through field ids") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ev")
    spark.sql("CREATE TABLE graft.ev.srn (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.ev.srn VALUES (1, 1.5), (2, 2.5)")
    spark.sql("ALTER TABLE graft.ev.srn RENAME COLUMN v TO val")
    spark.sql("INSERT INTO graft.ev.srn VALUES (3, 3.5)")

    val seen = scala.collection.mutable.Map[Long, Double]()
    val q = spark.readStream.table("graft.ev.srn")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("id", "val").collect().foreach(r => seen(r.getLong(0)) = r.getDouble(1))
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-srn-").toString)
      .start()
    assert(q.awaitTermination(120000))
    assert(seen.toMap == Map(1L -> 1.5, 2L -> 2.5, 3L -> 3.5),
      s"pre-rename snapshots must replay under the new name, got $seen")
  }

  test("type widening: INT→BIGINT and FLOAT→DOUBLE read across eras") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ev")
    spark.sql("CREATE TABLE graft.ev.tw (id INT, x FLOAT)")
    spark.sql("INSERT INTO graft.ev.tw VALUES (1, CAST(1.5 AS FLOAT))")
    spark.sql("ALTER TABLE graft.ev.tw ALTER COLUMN id TYPE BIGINT")
    spark.sql("ALTER TABLE graft.ev.tw ALTER COLUMN x TYPE DOUBLE")
    spark.sql("INSERT INTO graft.ev.tw VALUES (CAST(2147483648 AS BIGINT), 2.5)")
    val rows = spark.sql("SELECT id, x FROM graft.ev.tw ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2147483648L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
    // pushdown over the widened column still filters both eras
    assert(spark.sql("SELECT count(*) FROM graft.ev.tw WHERE id >= 1").collect()
      .head.getLong(0) == 2)
  }

  test("add-spec + set-default-spec evolves clustering for new writes only") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ev")
    spark.sql("CREATE TABLE graft.ev.t (day BIGINT, user BIGINT, v DOUBLE) PARTITIONED BY (day)")
    val dir = new Path(s"$warehouse/ev/t")
    import spark.implicits._

    // old layout: clustered by day
    cat.ops.write(dir,
      (0L until 100L).map(i => (i % 4, i, i.toDouble)).toDF("day", "user", "v"),
      "append", numFiles = Some(4))

    // evolve: partition by user instead (reference: add-spec update)
    val (_, m0) = cat.ops.load(dir).get
    val userField = m0.currentSchema.fields.find(_.name == "user").get.id
    cat.ops.commit(dir, Seq.empty, Seq(
      MetadataUpdate.AddSpec(PartitionSpec(1,
        Seq(PartitionField(userField, 1001, "user", "identity")))),
      MetadataUpdate.SetDefaultSpec(1)))
    assert(cat.ops.load(dir).get._2.defaultSpecId == 1)

    // new writes cluster by user
    cat.ops.write(dir,
      (100L until 200L).map(i => (i % 4, i, i.toDouble)).toDF("day", "user", "v"),
      "append", numFiles = Some(4))

    // reads span both layouts
    assert(spark.sql("SELECT count(*) FROM graft.ev.t").collect().head.getLong(0) == 200)
    assert(spark.sql("SELECT sum(user) FROM graft.ev.t WHERE day = 1")
      .collect().head.getLong(0) ==
      (0L until 200L).filter(_ % 4 == 1).sum)

    // new files are range-clustered on user → a point lookup on user
    // provably needs at most one NEW file (old files can't be pruned
    // on user and stay conservatively included)
    val entries = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
    val schema = SchemaBridge.toSpark(cat.ops.load(dir).get._2.currentSchema)
    val newEntries = entries.filter(_.stats.get("user").exists(cs =>
      cs.min.get.toLong >= 100L))
    assert(newEntries.size == 4)
    val probe = org.apache.spark.sql.sources.EqualTo("user", 150L)
    assert(newEntries.count(e => Stats.mayContain(e, schema, probe)) == 1)

    // DSv2 INSERT under the evolved spec clusters on user too
    spark.sql("INSERT INTO graft.ev.t VALUES (9, 900, 1.0)")
    val latest = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .filter(e => e.stats.get("user").exists(_.min.contains("900")))
    assert(latest.nonEmpty)
  }

  test("C75 default column values: initial-default fills pre-column files, write-default fills omitted INSERT columns") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ev")
    spark.sql("CREATE TABLE graft.ev.defs (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.ev.defs VALUES (1, 1.5), (2, 2.5)")

    // ADD COLUMN ... DEFAULT: rows in files that PREDATE the column
    // must read back the default (Iceberg v3 initial-default), not null
    spark.sql("ALTER TABLE graft.ev.defs ADD COLUMN flag INT DEFAULT 7")
    spark.sql("ALTER TABLE graft.ev.defs ADD COLUMN tag STRING DEFAULT 'none'")
    val old = spark.sql("SELECT id, flag, tag FROM graft.ev.defs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(old.toSeq == Seq((1L, 7, "none"), (2L, 7, "none")), old.mkString(", "))

    // INSERT omitting the defaulted columns → write-default
    spark.sql("INSERT INTO graft.ev.defs (id, v) VALUES (3, 3.5)")
    // explicit values win
    spark.sql("INSERT INTO graft.ev.defs VALUES (4, 4.5, 40, 'x')")
    // SET DEFAULT changes the write-default only; initial stays frozen
    spark.sql("ALTER TABLE graft.ev.defs ALTER COLUMN flag SET DEFAULT 9")
    spark.sql("INSERT INTO graft.ev.defs (id, v) VALUES (5, 5.5)")
    // the DEFAULT keyword resolves per-column
    spark.sql("INSERT INTO graft.ev.defs VALUES (6, 6.5, DEFAULT, DEFAULT)")

    val rows = spark.sql("SELECT id, flag, tag FROM graft.ev.defs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1L, 7, "none"), (2L, 7, "none"), (3L, 7, "none"),
      (4L, 40, "x"), (5L, 9, "none"), (6L, 9, "none")), rows.mkString(", "))

    // predicates evaluate the filled default across eras (and the
    // absent-stats files are conservatively kept, never mis-pruned)
    assert(spark.sql("SELECT count(*) FROM graft.ev.defs WHERE flag = 7")
      .collect().head.getLong(0) == 3)
    assert(spark.sql("SELECT count(*) FROM graft.ev.defs WHERE tag = 'none'")
      .collect().head.getLong(0) == 5)

    // metadata round-trip: defaults survive a reload (v3 vocabulary)
    val dir = new Path(s"$warehouse/ev/defs")
    val meta = cat.ops.load(dir).get._2
    val flagField = meta.currentSchema.fields.find(_.name == "flag").get
    assert(flagField.initialDefault.contains("7"), flagField)
    assert(flagField.writeDefault.contains("9"), flagField)

    // a COW rewrite (compaction) materializes defaults into the data;
    // results unchanged after
    cat.ops.compact(spark, dir, numFiles = 1)
    val after = spark.sql("SELECT id, flag FROM graft.ev.defs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(after.toSeq == Seq((1L, 7), (2L, 7), (3L, 7), (4L, 40), (5L, 9), (6L, 9)),
      after.mkString(", "))
  }
}
