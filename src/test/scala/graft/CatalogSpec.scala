package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException

import graft.catalog._

/** Catalog surface per SURVEY.md §2.1 — the reference's namespace,
  * table, view and commit semantics (denali logic package), Spark-native. */
class CatalogSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  // ---------- C1 namespaces ----------

  test("C1: namespace create / list / load / props / drop") {
    sql("CREATE NAMESPACE graft.ns1")
    sql("CREATE NAMESPACE graft.ns1.child")
    sql("CREATE NAMESPACE graft.ns2 WITH PROPERTIES ('team'='graft')")

    val top = sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet
    assert(top == Set("ns1", "ns2"))
    val nested = sql("SHOW NAMESPACES IN graft.ns1").collect().map(_.getString(0)).toSet
    assert(nested == Set("ns1.child"))

    val props = sql("DESCRIBE NAMESPACE EXTENDED graft.ns2").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.values.exists(_.contains("graft")))

    sql("ALTER NAMESPACE graft.ns2 SET PROPERTIES ('k'='v')")
    intercept[Exception](sql("DROP NAMESPACE graft.ns1")) // non-empty, no cascade
    sql("DROP NAMESPACE graft.ns1 CASCADE")
    assert(sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet == Set("ns2"))
    intercept[NoSuchNamespaceException](
      spark.sessionState.catalogManager.catalog("graft")
        .asInstanceOf[GraftCatalog].listNamespaces(Array("nope")))
  }

  // ---------- C2/C3 tables ----------

  test("C2/C3: table create / insert / select / rename / drop via SQL") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.t1 (id BIGINT, name STRING, score DOUBLE) TBLPROPERTIES ('team'='graft')")
    assert(sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("t1"))

    sql("INSERT INTO graft.db.t1 VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    sql("INSERT INTO graft.db.t1 VALUES (3, 'c', 3.5)")
    assert(sql("SELECT count(*) FROM graft.db.t1").collect().head.getLong(0) == 3)
    assert(sql("SELECT sum(score) FROM graft.db.t1").collect().head.getDouble(0) == 7.5)

    // metadata files exist on disk in the reference's shape
    val metaDir = new java.io.File(s"$warehouse/db/t1/metadata")
    val names = metaDir.listFiles().map(_.getName)
    assert(names.count(_.matches("v\\d+\\.metadata\\.json")) >= 3) // create + 2 commits
    assert(names.contains("version-hint.text"))

    sql("ALTER TABLE graft.db.t1 RENAME TO db.t1x")
    assert(sql("SELECT count(*) FROM graft.db.t1x").collect().head.getLong(0) == 3)
    sql("DROP TABLE graft.db.t1x")
    assert(!sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("t1x"))
  }

  test("C3: insert overwrite replaces visible data but keeps history") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.ow (id BIGINT)")
    sql("INSERT INTO graft.db.ow VALUES (1), (2)")
    sql("INSERT OVERWRITE graft.db.ow VALUES (9)")
    assert(sql("SELECT * FROM graft.db.ow").collect().map(_.getLong(0)).toSet == Set(9L))

    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    val dir = new Path(s"$warehouse/db/ow")
    val (_, meta) = cat.ops.load(dir).get
    assert(meta.snapshots.size == 2)
    val first = meta.snapshots.minBy(_.sequenceNumber)
    // time travel to the pre-overwrite snapshot
    val old = cat.ops.read(spark, dir, snapshotId = Some(first.snapshotId))
      .collect().map(_.getLong(0)).toSet
    assert(old == Set(1L, 2L))
  }

  // ---------- C4 commit requirements ----------

  test("C4: all 8 commit requirements check against current state") {
    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.reqs (id BIGINT)")
    val dir = new Path(s"$warehouse/db/reqs")
    val (_, meta) = cat.ops.load(dir).get

    import Requirement._
    def ok(r: Requirement) = assert(r.check(Some(meta)).isEmpty, r.name)
    def bad(r: Requirement) = assert(r.check(Some(meta)).isDefined, r.name)

    ok(AssertTableUuid(meta.tableUuid)); bad(AssertTableUuid("other"))
    ok(AssertRefSnapshotId("main", None)) // no snapshot yet → ref absent
    bad(AssertRefSnapshotId("main", Some(42L)))
    ok(AssertLastAssignedFieldId(1)); bad(AssertLastAssignedFieldId(7))
    ok(AssertCurrentSchemaId(0)); bad(AssertCurrentSchemaId(3))
    ok(AssertLastAssignedPartitionId(999)); bad(AssertLastAssignedPartitionId(1000))
    ok(AssertDefaultSpecId(0)); bad(AssertDefaultSpecId(1))
    ok(AssertDefaultSortOrderId(0)); bad(AssertDefaultSortOrderId(1))
    bad(AssertCreate) // table exists
    assert(AssertCreate.check(None).isEmpty)

    // a failed requirement aborts the commit atomically
    intercept[CommitFailedException] {
      cat.ops.commit(dir, Seq(AssertTableUuid("other")),
        Seq(MetadataUpdate.SetProperties(Map("x" -> "1"))))
    }
    assert(!cat.ops.load(dir).get._2.properties.contains("x"))
  }

  // ---------- C5 metadata updates ----------

  test("C5: every table update action applies") {
    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.upd (id BIGINT, v DOUBLE)")
    val dir = new Path(s"$warehouse/db/upd")
    import MetadataUpdate._

    val m1 = cat.ops.commit(dir, Seq.empty, Seq(
      SetProperties(Map("a" -> "1", "b" -> "2")),
      RemoveProperties(Seq("a")),
      AddSchema(TableSchema(1, Seq(
        NestedField(1, "id", "BIGINT", required = false),
        NestedField(2, "v", "DOUBLE", required = false),
        NestedField(3, "tag", "STRING", required = false)))),
      SetCurrentSchema(-1),
      AddSpec(PartitionSpec(1, Seq(PartitionField(1, 1000, "id", "identity")))),
      SetDefaultSpec(-1),
      AddSortOrder(SortOrder(1, Seq(SortField(1, "identity", "asc", "nulls-first")))),
      SetDefaultSortOrder(-1),
      SetLocation(dir.toString),
      UpgradeFormatVersion(2)))
    assert(m1.properties == Map("b" -> "2"))
    assert(m1.currentSchemaId == 1 && m1.lastColumnId == 3)
    assert(m1.defaultSpecId == 1 && m1.lastPartitionId == 1000)
    assert(m1.defaultSortOrderId == 1)

    // snapshot lifecycle: add → ref → stats → remove
    val m2 = cat.ops.commitFiles(dir, Seq.empty, "append")
    val snapId = m2.currentSnapshotId.get
    val m3 = cat.ops.commit(dir, Seq.empty, Seq(
      SetSnapshotRef("audit", snapId, "tag"),
      SetStatistics(snapId, "stats.json")))
    assert(m3.refs.keySet == Set("main", "audit"))
    assert(m3.statistics.map(_.snapshotId) == Seq(snapId))
    assert(m3.snapshotLog.map(_.snapshotId) == Seq(snapId))

    val m4 = cat.ops.commit(dir, Seq.empty, Seq(
      RemoveStatistics(snapId),
      RemoveSnapshotRef("audit"),
      RemoveSnapshots(Seq(snapId))))
    assert(m4.statistics.isEmpty && !m4.refs.contains("audit") && m4.snapshots.isEmpty)

    val m5 = cat.ops.commit(dir, Seq.empty, Seq(AssignUuid("00000000-0000-0000-0000-000000000001")))
    assert(m5.tableUuid.endsWith("1"))
    intercept[CommitFailedException](
      cat.ops.commit(dir, Seq.empty, Seq(UpgradeFormatVersion(1))))
    intercept[CommitFailedException](
      cat.ops.commit(dir, Seq.empty, Seq(RemoveProperties(Seq("missing")))))
  }

  // ---------- C6 optimistic concurrency ----------

  test("C6: concurrent commit — exactly one writer wins a version") {
    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.cas (id BIGINT)")
    val mdir = new Path(s"$warehouse/db/cas/metadata")
    val (v, json) = cat.store.currentVersion(mdir).get
    // two committers race for version v+1 with different payloads
    val winner = cat.store.publish(mdir, v + 1, json.replace("{", "{\n  \"w\": 1,"))
    val loser = cat.store.publish(mdir, v + 1, json)
    assert(winner && !loser)

    // and through the high-level protocol: stale-state commit still
    // lands on v+2 or fails, never silently overwrites
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        try cat.ops.commit(new Path(s"$warehouse/db/cas"), Seq.empty,
          Seq(MetadataUpdate.SetProperties(Map(s"t$i" -> "1"))))
        catch { case _: CommitFailedException => () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val versions = new java.io.File(s"$warehouse/db/cas/metadata").listFiles()
      .map(_.getName).filter(_.matches("v\\d+\\.metadata\\.json"))
    // no duplicated/lost version numbers: file names are unique by CAS
    assert(versions.distinct.length == versions.length)
  }

  // ---------- C7 snapshots & time travel via SQL ----------

  test("C7: snapshot log, refs, VERSION AS OF / TIMESTAMP AS OF") {
    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.tt (id BIGINT)")
    sql("INSERT INTO graft.db.tt VALUES (1)")
    sql("INSERT INTO graft.db.tt VALUES (2)")
    val dir = new Path(s"$warehouse/db/tt")
    val (_, meta) = cat.ops.load(dir).get
    assert(meta.snapshots.size == 2 && meta.snapshotLog.size == 2)
    val first = meta.snapshots.minBy(_.sequenceNumber)

    val v1 = sql(s"SELECT * FROM graft.db.tt VERSION AS OF ${first.snapshotId}")
      .collect().map(_.getLong(0)).toSet
    assert(v1 == Set(1L))
    val now = sql("SELECT * FROM graft.db.tt").collect().map(_.getLong(0)).toSet
    assert(now == Set(1L, 2L))

    // read option time travel (snapshot-id + named ref)
    cat.ops.commit(dir, Seq.empty,
      Seq(MetadataUpdate.SetSnapshotRef("v1tag", first.snapshotId, "tag")))
    val byOpt = spark.read.option("snapshot-id", first.snapshotId.toString)
      .table("graft.db.tt").collect().map(_.getLong(0)).toSet
    assert(byOpt == Set(1L))
    val byRef = spark.read.option("ref", "v1tag")
      .table("graft.db.tt").collect().map(_.getLong(0)).toSet
    assert(byRef == Set(1L))
    val byTs = spark.read.option("as-of-timestamp", first.timestampMs.toString)
      .table("graft.db.tt").collect().map(_.getLong(0)).toSet
    assert(byTs == Set(1L))
  }

  // ---------- C8 views ----------

  test("C8: view create / query / replace / rename / drop") {
    // Stock Spark has no v2 view DDL (its ViewCatalog API is consumed
    // by engine extensions), so DDL goes through the catalog API —
    // the same operations the reference exposes over REST
    // (logic/view.go) — while SELECT resolves through our
    // GraftExtensions substitution rule.
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.vt (id BIGINT, v DOUBLE)")
    sql("INSERT INTO graft.db.vt VALUES (1, 10.0), (2, 20.0)")

    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    val ns = Array("db")
    val ident = Identifier.of(ns, "big")
    def info(sqlText: String) = new ViewInfo(ident, sqlText, "graft", ns,
      sql(sqlText).schema, Array.empty, Array.empty, Array.empty,
      new java.util.HashMap[String, String]())

    cat.createView(info("SELECT id, v FROM graft.db.vt WHERE v > 15"))
    assert(sql("SELECT id FROM graft.db.big").collect().map(_.getLong(0)).toSet == Set(2L))
    assert(cat.listViews("db").map(_.name).contains("big"))
    intercept[Exception](cat.createView(info("SELECT 1"))) // already exists

    cat.replaceView(info("SELECT id, v FROM graft.db.vt WHERE v > 5"), orCreate = false)
    assert(sql("SELECT count(*) FROM graft.db.big").collect().head.getLong(0) == 2)

    // version history retained (add-view-version + set-current-view-version);
    // view metadata lands GZIP-compressed as vN.gz.metadata.json — the
    // reference's view encoding (logic/view.go:127-137 writes through
    // gzip.NewWriter; iceberg-overload/view/metadata.go reads gzip)
    val viewMetaDir = new java.io.File(s"$warehouse/db/.graft-views/big")
    val gzFiles = viewMetaDir.listFiles().map(_.getName)
      .filter(_.matches("v\\d+\\.gz\\.metadata\\.json")).sorted
    assert(gzFiles.length == 2, viewMetaDir.listFiles().map(_.getName).mkString(","))
    val gzBytes = java.nio.file.Files.readAllBytes(
      new java.io.File(viewMetaDir, gzFiles.head).toPath)
    assert((gzBytes(0) & 0xFF) == 0x1F && (gzBytes(1) & 0xFF) == 0x8B,
      "view metadata bytes must be gzip-compressed")

    import org.apache.spark.sql.connector.catalog.ViewChange
    cat.alterView(ident, ViewChange.setProperty("note", "x"))
    assert(cat.loadView(ident).properties.get("note") == "x")

    cat.renameView(ident, Identifier.of(ns, "big2"))
    assert(sql("SELECT count(*) FROM graft.db.big2").collect().head.getLong(0) == 2)
    assert(cat.dropView(Identifier.of(ns, "big2")))
    assert(cat.listViews("db").isEmpty)
  }

  test("C8c: plain (legacy / external) view metadata files stay readable") {
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    val ns = Array("db")
    val ident = Identifier.of(ns, "legacyv")
    cat.createView(new ViewInfo(ident, "SELECT 41 AS n", "graft", ns,
      sql("SELECT 41 AS n").schema, Array.empty, Array.empty, Array.empty,
      new java.util.HashMap[String, String]()))
    // rewrite version 0 as a PLAIN (uncompressed) file — the pre-gzip
    // on-disk form — and drop the gz one; loads must still resolve
    val store = new FsStore(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$warehouse/db/.graft-views/legacyv")
    val json = store.readString(store.gzVersionPath(dir, 0))
    store.writeString(store.versionPath(dir, 0), json)
    store.delete(store.gzVersionPath(dir, 0))
    assert(sql("SELECT n FROM graft.db.legacyv").collect().head.getInt(0) == 41)
    // a replace on top of the plain file publishes v1 as gzip
    cat.replaceView(new ViewInfo(ident, "SELECT 42 AS n", "graft", ns,
      sql("SELECT 42 AS n").schema, Array.empty, Array.empty, Array.empty,
      new java.util.HashMap[String, String]()), orCreate = false)
    assert(sql("SELECT n FROM graft.db.legacyv").collect().head.getInt(0) == 42)
    assert(store.exists(store.gzVersionPath(dir, 1)))
    cat.dropView(ident)
  }

  test("C8b: SQL-level view DDL routes to the ViewCatalog (extensions rule)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.sv (id BIGINT, v DOUBLE)")
    sql("INSERT INTO graft.db.sv VALUES (1, 10.0), (2, 20.0), (3, 30.0)")

    // CREATE VIEW via plain SQL lands in the graft ViewCatalog ...
    sql("CREATE VIEW graft.db.topv AS SELECT id, v FROM graft.db.sv WHERE v > 15")
    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    assert(cat.listViews("db").map(_.name).contains("topv"))
    // ... and SELECT resolves through the substitution rule
    assert(sql("SELECT count(*) FROM graft.db.topv").collect().head.getLong(0) == 2)

    // duplicate create fails; IF NOT EXISTS is a no-op
    intercept[Exception](sql("CREATE VIEW graft.db.topv AS SELECT 1 AS x"))
    sql("CREATE VIEW IF NOT EXISTS graft.db.topv AS SELECT 1 AS x")
    assert(sql("SELECT count(*) FROM graft.db.topv").collect().head.getLong(0) == 2)

    // OR REPLACE adds a view version (history retained on disk)
    sql("CREATE OR REPLACE VIEW graft.db.topv AS SELECT id FROM graft.db.sv WHERE v > 5")
    assert(sql("SELECT count(*) FROM graft.db.topv").collect().head.getLong(0) == 3)
    val viewMetaDir = new java.io.File(s"$warehouse/db/.graft-views/topv")
    assert(viewMetaDir.listFiles().map(_.getName)
      .count(_.matches("v\\d+\\.gz\\.metadata\\.json")) == 2)

    // DROP VIEW; IF EXISTS tolerates the missing view afterwards
    sql("DROP VIEW graft.db.topv")
    assert(!cat.listViews("db").map(_.name).contains("topv"))
    intercept[Exception](sql("DROP VIEW graft.db.topv"))
    sql("DROP VIEW IF EXISTS graft.db.topv")
  }

  // ---------- C2 partitioned create + alter schema ----------

  test("C2: partitioned table records identity spec; ALTER evolves schema") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.pt (id BIGINT, region STRING) PARTITIONED BY (region)")
    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    val (_, meta) = cat.ops.load(new Path(s"$warehouse/db/pt")).get
    assert(meta.specs.head.fields.map(f => (f.name, f.transform)) == Seq(("region", "identity")))
    assert(meta.lastPartitionId == 1000)

    sql("ALTER TABLE graft.db.pt ADD COLUMN score DOUBLE")
    sql("ALTER TABLE graft.db.pt SET TBLPROPERTIES ('p'='q')")
    val (_, m2) = cat.ops.load(new Path(s"$warehouse/db/pt")).get
    assert(m2.currentSchema.fields.map(_.name) == Seq("id", "region", "score"))
    assert(m2.currentSchema.fields.last.id == 3) // new column above lastColumnId
    assert(m2.properties("p") == "q")
    assert(m2.schemas.size == 2) // schema history kept

    sql("INSERT INTO graft.db.pt VALUES (1, 'eu', 0.5)")
    assert(sql("SELECT score FROM graft.db.pt").collect().head.getDouble(0) == 0.5)
  }

  test("C2b: files written before ADD COLUMN read as nulls after evolution") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.evo (id BIGINT, v STRING)")
    sql("INSERT INTO graft.db.evo VALUES (1, 'a'), (2, 'b')")
    sql("ALTER TABLE graft.db.evo ADD COLUMN score DOUBLE")
    sql("INSERT INTO graft.db.evo VALUES (3, 'c', 1.5)")

    val rows = sql("SELECT id, v, score FROM graft.db.evo ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows.take(2).forall(_.isNullAt(2)), "pre-evolution rows read the new column as null")
    assert(rows(2).getDouble(2) == 1.5)
    // predicates on the evolved column work across mixed-schema files
    assert(sql("SELECT count(*) FROM graft.db.evo WHERE score IS NULL")
      .collect().head.getLong(0) == 2)
    assert(sql("SELECT count(*) FROM graft.db.evo WHERE score > 1")
      .collect().head.getLong(0) == 1)
  }

  // ---------- metadata JSON round-trip ----------

  test("C2c: writeTo.createOrReplace + REPLACE TABLE AS SELECT (the reference's own pyspark example shape)") {
    // examples/pyspark_example.py drives denali through exactly this
    // API: spark_df.writeTo("westeros.my_table").createOrReplace()
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.westeros")
    Seq((1L, "jon_snow", 0.0)).toDF("id", "name", "what_they_know")
      .writeTo("graft.westeros.my_table").createOrReplace()
    val first = spark.table("graft.westeros.my_table").collect()
    assert(first.length == 1 && first.head.getString(1) == "jon_snow")
    // replace with a DIFFERENT schema: the new definition wins wholesale
    Seq((2L, "arya")).toDF("id", "name")
      .writeTo("graft.westeros.my_table").createOrReplace()
    val second = spark.table("graft.westeros.my_table")
    assert(second.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(second.collect().head.getString(1) == "arya")
    // SQL RTAS spelling
    spark.sql("REPLACE TABLE graft.westeros.my_table AS SELECT 3L AS id, 'bran' AS name")
    assert(spark.table("graft.westeros.my_table").collect().head.getLong(0) == 3L)

    // C87 atomicity: each replace was ONE commit on the SAME table —
    // uuid stable, snapshot history intact across both replaces (a
    // drop+create would have reset both), every snapshot an overwrite
    // with its own schema id
    val dir = new org.apache.hadoop.fs.Path(s"$warehouse/westeros/my_table")
    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    val (_, meta) = cat.ops.load(dir).get
    assert(meta.snapshots.size == 3, s"3 replace snapshots, got ${meta.snapshots.size}")
    assert(meta.schemas.size == 3, "each replace installs a fresh schema")
    // staged CREATE lands as v0 + first append; each staged REPLACE is
    // one atomic overwrite commit
    assert(meta.snapshots.sortBy(_.sequenceNumber).map(_.operation) ==
      Seq("append", "overwrite", "overwrite"))
    // fresh field ids above the prior schema's — old snapshots keep
    // their own schema for time travel
    assert(meta.schemas.map(_.highestFieldId).distinct.size == 3)
    // time travel resolves through the SNAPSHOT's schema — the
    // pre-replace row reads back through its own field ids
    val firstSnap = meta.snapshots.minBy(_.sequenceNumber)
    val asOf = spark.sql(
      s"SELECT * FROM graft.westeros.my_table VERSION AS OF ${firstSnap.snapshotId}")
    assert(asOf.schema.fieldNames.toSeq == Seq("id", "name", "what_they_know"))
    assert(asOf.collect().head.getString(1) == "jon_snow",
      "the pre-replace snapshot must stay time-travelable")
  }

  test("metadata JSON round-trips losslessly") {
    val meta = TableMetadata.create(
      "/wh/t", TableSchema(0, Seq(
        NestedField(1, "id", "BIGINT", required = true),
        NestedField(2, "emb", "ARRAY<FLOAT>", required = false))),
      PartitionSpec(0, Seq(PartitionField(1, 1000, "id", "identity"))),
      SortOrder(0, Seq(SortField(1, "identity", "asc", "nulls-first"))),
      Map("k" -> "v"))
    val withSnap = MetadataUpdate.AddSnapshot(Snapshot(
      7L, None, 1L, 123L, "append", "manifest-7.json", Map("added-data-files" -> "2"), 0))
      .apply(meta)
    val full = MetadataUpdate.SetSnapshotRef("main", 7L, "branch").apply(withSnap)
    val back = MetadataJson.fromJson(MetadataJson.toJson(full))
    assert(back == full)
  }

  test("C79 CHECK constraints: validated at ADD, enforced on every INSERT, droppable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ck")
    spark.sql("CREATE TABLE graft.ck.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.ck.t VALUES (1, 1.5), (2, 2.5)")

    // existing rows satisfy the predicate → constraint accepted
    spark.sql("ALTER TABLE graft.ck.t ADD CONSTRAINT v_positive CHECK (v > 0)")

    // violating INSERT fails at write and lands NOTHING
    intercept[Exception] {
      spark.sql("INSERT INTO graft.ck.t VALUES (3, -1.0)")
    }
    assert(spark.table("graft.ck.t").count() == 2,
      "failed insert must not commit any rows")

    // conforming INSERT passes
    spark.sql("INSERT INTO graft.ck.t VALUES (3, 3.5)")
    assert(spark.table("graft.ck.t").count() == 3)

    // a constraint the EXISTING rows violate is rejected at ADD
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ck.t ADD CONSTRAINT unreachable CHECK (v > 100)")
    }
    assert(ex.getMessage.contains("unreachable") || ex.getMessage.contains("violate"),
      ex.getMessage)

    // DROP CONSTRAINT re-opens the gate
    spark.sql("ALTER TABLE graft.ck.t DROP CONSTRAINT v_positive")
    spark.sql("INSERT INTO graft.ck.t VALUES (4, -4.5)")
    assert(spark.table("graft.ck.t").count() == 4)

    // dropping an unknown constraint errors unless IF EXISTS
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ck.t DROP CONSTRAINT nope")
    }
    spark.sql("ALTER TABLE graft.ck.t DROP CONSTRAINT IF EXISTS nope")
  }

  test("TIMESTAMP AS OF pins the schema of the SAME snapshot it serves (replace + rollback)") {
    // Regression (ADVICE r12): file resolution walks snapshotLog (main
    // lineage, log order) while the schema pin used the max-timestamp
    // snapshot across ALL snapshots — after a REPLACE + rollback those
    // disagree, serving pre-replace files through the post-replace
    // schema. Both must now resolve via TableOps.resolveSnapshot.
    val cat = spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.ttpin (id BIGINT, name STRING)")
    sql("INSERT INTO graft.db.ttpin VALUES (1, 'a')")
    val dir = new Path(s"$warehouse/db/ttpin")
    val pre = cat.ops.load(dir).get._2.currentSnapshot.get
    Thread.sleep(5) // distinct ms timestamps for the log entries
    sql("REPLACE TABLE graft.db.ttpin AS SELECT 2L AS id2")
    Thread.sleep(5)
    cat.ops.rollbackTo(dir, pre.snapshotId)
    // a timestamp AFTER the replace: the snapshotLog's last entry is
    // the rolled-back-to (pre-replace) snapshot, so that snapshot's
    // files AND schema must both be served
    Thread.sleep(5)
    val ts = java.time.Instant.ofEpochMilli(System.currentTimeMillis())
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val df = sql(s"SELECT * FROM graft.db.ttpin TIMESTAMP AS OF '$ts'")
    assert(df.schema.fieldNames.toSeq == Seq("id", "name"),
      s"pin must follow the lineage snapshot's schema, got ${df.schema.fieldNames.toSeq}")
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
    // the replace snapshot itself stays reachable by VERSION AS OF
    val (_, meta) = cat.ops.load(dir).get
    val repl = meta.snapshots.maxBy(_.sequenceNumber)
    val v = sql(s"SELECT * FROM graft.db.ttpin VERSION AS OF ${repl.snapshotId}")
    assert(v.schema.fieldNames.toSeq == Seq("id2"))
    assert(v.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("ADVICE r14: mixed-encoding publishes arbitrate on ONE name (single winner)") {
    val store = new FsStore(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$warehouse/.cas-mixed")
    // a gzip publish claims the PLAIN arbiter name (the mechanism that
    // closes the plain-vs-gzip two-filename race) and keeps the
    // reference's .gz layout name; content reads under either name
    assert(store.publish(dir, 0, """{"v":"gz0"}""", gzip = true))
    assert(store.exists(store.versionPath(dir, 0)),
      "gzip publish must claim the plain arbiter name")
    assert(store.exists(store.gzVersionPath(dir, 0)))
    assert(store.readString(store.versionPath(dir, 0)).contains("gz0"))
    assert(store.readString(store.gzVersionPath(dir, 0)).contains("gz0"))
    assert(!store.publish(dir, 0, """{"v":"plain0"}""", gzip = false))
    assert(store.currentVersion(dir).get._2.contains("gz0"))

    // 8 writers racing version 1, alternating encodings: exactly one
    // wins, and the survivor's content is the winner's
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Boolean)]()
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        start.await()
        results.add((i, store.publish(dir, 1, s"""{"w":$i}""", gzip = i % 2 == 0)))
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val winners = results.asScala.toList.filter(_._2)
    assert(winners.size == 1, s"expected one winner, got $winners")
    assert(store.readString(store.versionPath(dir, 1))
      .contains(s""""w":${winners.head._1}"""))
    assert(store.currentVersion(dir).get._1 == 1)
  }
}
