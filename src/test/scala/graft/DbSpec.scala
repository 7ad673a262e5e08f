package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** JDBC-backed catalog store (Derby embedded — the reference's
  * SQLite/Postgres transactional backing, denali models/pg,
  * models/sqlite, sqlgen/): version ledger in the database, data and
  * manifests on the filesystem, multi-table commits in one DB
  * transaction. */
class DbSpec extends SparkSpec {

  private lazy val dbRoot = java.nio.file.Files.createTempDirectory("graft-db-")
  private lazy val jdbcUrl = s"jdbc:derby:$dbRoot/ledger;create=true"
  private lazy val dbWarehouse = {
    val p = java.nio.file.Files.createTempDirectory("graft-dbwh-")
    spark.conf.set("spark.sql.catalog.graft_db", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_db.warehouse", p.toString)
    spark.conf.set("spark.sql.catalog.graft_db.jdbc-url", jdbcUrl)
    p
  }
  private def dbCat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft_db").asInstanceOf[GraftCatalog]
  private def store: JdbcStore = dbCat.store.asInstanceOf[JdbcStore]

  test("SQL round-trip through a JDBC-mounted catalog; DB is the source of truth") {
    dbWarehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_db.db")
    spark.sql("CREATE TABLE graft_db.db.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_db.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(spark.sql("SELECT sum(id) FROM graft_db.db.t").collect().head.getLong(0) == 6)

    // the ledger, not the FS mirror, carries correctness: blow the
    // mirrored version files away and reads still resolve
    val md = dbCat.ops.metadataDir(new Path(s"$dbWarehouse/db/t"))
    store.list(md).filter(p => store.versionOf(p).isDefined)
      .foreach(p => new java.io.File(p.toUri.getPath).delete())
    assert(spark.sql("SELECT count(*) FROM graft_db.db.t").collect().head.getLong(0) == 3)

    // snapshot history lives in the ledger as ordinary metadata
    spark.sql("INSERT INTO graft_db.db.t VALUES (4, 'd')")
    val dir = new Path(s"$dbWarehouse/db/t")
    assert(dbCat.ops.load(dir).get._2.snapshots.size == 2)
  }

  test("schema versioning: a pre-versioning v1 ledger upgrades in place") {
    import java.sql.DriverManager
    val root = java.nio.file.Files.createTempDirectory("graft-dbv1-")
    val url = s"jdbc:derby:$root/ledger;create=true"
    // hand-build the v1-era database: ONLY graft_versions, no stamp
    scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver"))
    val c = DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      "CREATE TABLE graft_versions(dir VARCHAR(1024) NOT NULL, " +
      "version INT NOT NULL, content CLOB NOT NULL, PRIMARY KEY (dir, version))")
    c.createStatement().executeUpdate(
      "INSERT INTO graft_versions VALUES ('/old/table', 1, '{\"legacy\":true}')")
    c.close()

    // mounting the store migrates: baseline stamp 1, then replay 2+
    val s = new JdbcStore(spark.sparkContext.hadoopConfiguration, url)
    val c2 = DriverManager.getConnection(url)
    val vs = {
      val rs = c2.createStatement()
        .executeQuery("SELECT version FROM graft_schema_version ORDER BY version")
      Iterator.continually(rs).takeWhile(_.next()).map(_.getInt(1)).toList
    }
    assert(vs == (1 to JdbcStore.SchemaVersion).toList, s"stamps: $vs")
    // v2's column exists and pre-existing rows survived the upgrade
    val rs2 = c2.createStatement().executeQuery(
      "SELECT content, committed_at FROM graft_versions WHERE dir = '/old/table'")
    assert(rs2.next() && rs2.getString(1).contains("legacy"))
    c2.close()
    // and the upgraded ledger serves reads/writes through the store API
    assert(s.currentVersion(new Path("/old/table")).contains((1, "{\"legacy\":true}")))
    assert(s.publish(new Path("/old/table"), 2, "{}"))
    assert(s.currentVersion(new Path("/old/table")).map(_._1).contains(2))
  }

  test("schema versioning: a FUTURE schema fails loudly instead of corrupting") {
    import java.sql.DriverManager
    val root = java.nio.file.Files.createTempDirectory("graft-dbv9-")
    val url = s"jdbc:derby:$root/ledger;create=true"
    scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver"))
    val c = DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      "CREATE TABLE graft_schema_version(version INT NOT NULL PRIMARY KEY, " +
      "applied_at TIMESTAMP NOT NULL)")
    c.createStatement().executeUpdate(
      s"INSERT INTO graft_schema_version VALUES (${JdbcStore.SchemaVersion + 97}, CURRENT_TIMESTAMP)")
    c.close()
    val e = intercept[IllegalStateException] {
      new JdbcStore(spark.sparkContext.hadoopConfiguration, url)
    }
    assert(e.getMessage.contains("newer than this build"))
  }

  test("dialects: per-engine DDL types, error detection, and URL selection") {
    import JdbcStore._
    // URL subprotocol drives selection (the reference validates its
    // dialect the same way: logic/state.go:219-226)
    assert(dialectFor("jdbc:postgresql://host/db").name == "postgresql")
    assert(dialectFor("jdbc:sqlite:/tmp/x.db").name == "sqlite")
    assert(dialectFor("jdbc:derby:/tmp/d;create=true").name == "derby")
    assert(dialectFor("jdbc:h2:mem:x").name == "ansi")

    // Postgres has no CLOB: its v1 DDL must say TEXT; Derby keeps CLOB
    def v1(d: Dialect) = d.migrations.find(_._1 == 1).get._2.head
    assert(v1(PostgresDialect).contains("content TEXT"), v1(PostgresDialect))
    assert(v1(SqliteDialect).contains("content TEXT"))
    assert(v1(DerbyDialect).contains("content CLOB"))
    // sqlite's ADD COLUMN cannot take a non-constant default
    def v2(d: Dialect) = d.migrations.find(_._1 == 2).get._2.head
    assert(!v2(SqliteDialect).contains("DEFAULT"), v2(SqliteDialect))
    assert(v2(PostgresDialect).contains("DEFAULT CURRENT_TIMESTAMP"))

    // constraint-violation detection does not trust SQLState alone:
    // sqlite-jdbc reports null states with message text
    val sqliteDup = new java.sql.SQLException(
      "[SQLITE_CONSTRAINT_PRIMARYKEY] A PRIMARY KEY constraint failed " +
      "(UNIQUE constraint failed: graft_versions.dir, graft_versions.version)")
    assert(SqliteDialect.isDuplicateKey(sqliteDup))
    assert(!DerbyDialect.isDuplicateKey(new java.sql.SQLException("boom", "X0Y32")))
    assert(SqliteDialect.isObjectExists(
      new java.sql.SQLException("[SQLITE_ERROR] SQL error or missing database " +
        "(table graft_versions already exists)")))
    assert(PostgresDialect.isObjectExists(new java.sql.SQLException("dup", "42P07")))
    assert(PostgresDialect.isDuplicateKey(new java.sql.SQLException("dup", "23505")))
    assert(DerbyDialect.isObjectExists(new java.sql.SQLException("exists", "X0Y32")))
    // the integrity-violation subclass counts even with a vendor state
    assert(AnsiDialect.isDuplicateKey(
      new java.sql.SQLIntegrityConstraintViolationException("dup", "99999")))
  }

  test("concurrent bootstrap: two fresh stores against one database both construct") {
    val root = java.nio.file.Files.createTempDirectory("graft-dbrace-")
    val url = s"jdbc:derby:$root/ledger;create=true"
    // drive the unguarded bootstrap from two threads — the in-JVM
    // `initialized` set would otherwise hide the cross-process race
    // where the loser hits CREATE TABLE object-exists, not a 23505
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(2)
    val runs = (1 to 2).map { _ =>
      Future { gate.countDown(); gate.await(); JdbcStore.bootstrap(url) }
    }
    runs.foreach(f => Await.result(f, scala.concurrent.duration.Duration(60, "s")))

    // exactly one stamp per version, and the ledger is fully usable
    import java.sql.DriverManager
    val c = DriverManager.getConnection(url)
    val rs = c.createStatement()
      .executeQuery("SELECT version FROM graft_schema_version ORDER BY version")
    val vs = Iterator.continually(rs).takeWhile(_.next()).map(_.getInt(1)).toList
    c.close()
    assert(vs == (1 to JdbcStore.SchemaVersion).toList, s"stamps: $vs")
    val s = new JdbcStore(spark.sparkContext.hadoopConfiguration, url)
    assert(s.publish(new Path("/race/t"), 1, "{}"))
    assert(s.currentVersion(new Path("/race/t")).map(_._1).contains(1))
  }

  test("publish is a DB CAS: 8 racing committers serialize to exactly one winner per version") {
    dbWarehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_db.db")
    spark.sql("CREATE TABLE graft_db.db.race (id BIGINT)")
    val dir = new Path(s"$dbWarehouse/db/race")
    val threads = 8
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(threads)
    (1 to threads).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          // every thread retries until it lands ONE commit
          var landed = false
          while (!landed) {
            try {
              dbCat.ops.commit(dir, Seq.empty,
                Seq(MetadataUpdate.SetProperties(Map(s"who-$i" -> "me"))))
              landed = true
              wins.incrementAndGet()
            } catch { case _: CommitFailedException => Thread.sleep(5) }
          }
          done.countDown()
        }
      })
    }
    start.countDown()
    assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(wins.get() == threads)
    val (v, meta) = dbCat.ops.load(dir).get
    assert(v == threads, s"8 commits over v0 must land versions 1..8, head at $v")
    (1 to threads).foreach(i => assert(meta.properties.get(s"who-$i").contains("me")))
  }

  test("publishAllAtomic: a conflict on ANY table publishes NOTHING (true multi-table atomicity)") {
    dbWarehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_db.db")
    spark.sql("CREATE TABLE graft_db.db.a1 (id BIGINT)")
    spark.sql("CREATE TABLE graft_db.db.a2 (id BIGINT)")
    val d1 = dbCat.ops.metadataDir(new Path(s"$dbWarehouse/db/a1"))
    val d2 = dbCat.ops.metadataDir(new Path(s"$dbWarehouse/db/a2"))
    val (v1, c1) = store.currentVersion(d1).get
    val (v2, c2) = store.currentVersion(d2).get

    // steal a2's next version first — the batch must then fail whole
    assert(store.publish(d2, v2 + 1, c2))
    assert(store.publishAllAtomic(Seq((d1, v1 + 1, c1), (d2, v2 + 1, c2)))
      .contains(false))
    assert(store.currentVersion(d1).get._1 == v1,
      "a1 must NOT advance when a2's entry conflicts — no torn prefix")

    // clean batch goes through, both advance together
    assert(store.publishAllAtomic(Seq((d1, v1 + 1, c1), (d2, v2 + 2, c2))).contains(true))
    assert(store.currentVersion(d1).get._1 == v1 + 1)
    assert(store.currentVersion(d2).get._1 == v2 + 2)
  }

  test("Transactions over the JDBC store commit atomically, no journal needed") {
    dbWarehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_db.db")
    spark.sql("CREATE TABLE graft_db.db.fact (id BIGINT)")
    spark.sql("CREATE TABLE graft_db.db.audit (id BIGINT)")
    val factDir = new Path(s"$dbWarehouse/db/fact")
    val auditDir = new Path(s"$dbWarehouse/db/audit")
    import spark.implicits._
    def stage(dir: Path, df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val stageDir = new Path(dir, s"data/stage-${java.util.UUID.randomUUID()}")
      df.write.parquet(stageDir.toString)
      store.listFilesRec(stageDir).filter(_.getName.endsWith(".parquet")).map(_.toString)
    }
    val tx = new Transactions(store)
    tx.appendAll(Seq(
      factDir -> stage(factDir, Seq(1L, 2L, 3L).toDF("id")),
      auditDir -> stage(auditDir, Seq(100L).toDF("id"))))
    assert(spark.sql("SELECT sum(id) FROM graft_db.db.fact").collect().head.getLong(0) == 6)
    assert(spark.sql("SELECT sum(id) FROM graft_db.db.audit").collect().head.getLong(0) == 100)

    // two concurrent multi-table transactions on the SAME tables both
    // land (one retries), and the tables stay mutually consistent
    val t1 = new Thread(() => tx.appendAll(Seq(
      factDir -> stage(factDir, Seq(10L).toDF("id")),
      auditDir -> stage(auditDir, Seq(200L).toDF("id")))))
    val t2 = new Thread(() => tx.appendAll(Seq(
      factDir -> stage(factDir, Seq(20L).toDF("id")),
      auditDir -> stage(auditDir, Seq(300L).toDF("id")))))
    t1.start(); t2.start(); t1.join(30000); t2.join(30000)
    assert(dbCat.ops.load(factDir).get._2.snapshots.size == 3)
    assert(dbCat.ops.load(auditDir).get._2.snapshots.size == 3)
    assert(spark.sql("SELECT sum(id) FROM graft_db.db.fact").collect().head.getLong(0) == 36)
    assert(spark.sql("SELECT sum(id) FROM graft_db.db.audit").collect().head.getLong(0) == 600)
  }

  test("rename moves the ledger; drop purges it (no resurrection on recreate)") {
    dbWarehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_db.db")
    spark.sql("CREATE TABLE graft_db.db.r1 (id BIGINT)")
    spark.sql("INSERT INTO graft_db.db.r1 VALUES (7)")
    // the RENAME TO target is catalog-relative (no catalog prefix)
    spark.sql("ALTER TABLE graft_db.db.r1 RENAME TO db.r2")
    assert(spark.sql("SELECT id FROM graft_db.db.r2").collect().head.getLong(0) == 7)
    assert(dbCat.ops.load(new Path(s"$dbWarehouse/db/r1")).isEmpty, "old ledger rows gone")
    // history came along with the rename
    assert(dbCat.ops.load(new Path(s"$dbWarehouse/db/r2")).get._2.snapshots.size == 1)

    spark.sql("DROP TABLE graft_db.db.r2")
    assert(dbCat.ops.load(new Path(s"$dbWarehouse/db/r2")).isEmpty)
    // recreating the same name starts a fresh ledger at version 0
    spark.sql("CREATE TABLE graft_db.db.r2 (id BIGINT)")
    assert(dbCat.ops.load(new Path(s"$dbWarehouse/db/r2")).get._1 == 0)
    assert(dbCat.ops.load(new Path(s"$dbWarehouse/db/r2")).get._2.snapshots.isEmpty)
  }

  test("catalog-prefixed RENAME TO target is catalog-relative: clean error, source intact") {
    dbWarehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_db.db")
    spark.sql("CREATE TABLE graft_db.db.p1 (id BIGINT)")
    spark.sql("INSERT INTO graft_db.db.p1 VALUES (9)")
    // Spark treats every part of the RENAME TO target as namespace
    // segments within the SOURCE's catalog — a 'graft_db.db.p2' target
    // means namespace (graft_db, db), which does not exist → the
    // catalog's requireNs rejects it cleanly instead of silently
    // renaming into a phantom directory
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_db.db.p1 RENAME TO graft_db.db.p2")
    }
    // source untouched, no phantom target ledger
    assert(spark.sql("SELECT id FROM graft_db.db.p1").collect().head.getLong(0) == 9)
    assert(dbCat.ops.load(new Path(s"$dbWarehouse/graft_db/db/p2")).isEmpty)
  }
}
