package graft.catalog

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Versioned-object store whose VERSION LEDGER lives in a JDBC
  * database, while manifests, statistics and data files stay on the
  * filesystem — the transactional-store backing the reference gets
  * from SQLite/Postgres (denali models/pg, models/sqlite, sqlgen/;
  * commit arbitration in logic/tx.go runs inside a DB transaction).
  *
  * Dialects: postgres and sqlite are first-class (per-dialect DDL
  * types and error detection, mirroring the reference's validated
  * dialect set); Derby embedded works out of the box (its jars ship
  * with Spark: `jdbc:derby:/path/to/db;create=true`); anything else
  * falls back to ANSI DDL with message-based error matching. See
  * [[JdbcStore.Dialect]].
  *
  * Semantics vs [[FsStore]]:
  *  - `publish` is a transactional INSERT into the `(dir, version)`
  *    primary key — a duplicate key IS the lost CAS. Same
  *    exactly-one-winner guarantee, arbitrated by the database
  *    instead of link(2)/rename semantics.
  *  - [[publishAllAtomic]] spans MANY objects in one transaction:
  *    multi-table commits become genuinely atomic — no publish
  *    ordering, no rollback window, no torn state
  *    ([[Transactions]] uses it when present and skips its
  *    journal/rollback machinery entirely).
  *  - Reads resolve from the database; after each successful publish
  *    the version file is also mirrored to the filesystem
  *    (best-effort, like `version-hint.text`) so path-based discovery
  *    and external inspection keep working.
  *
  * At 100 TB the ledger holds one small row per metadata version —
  * table count × history depth, independent of data volume — while
  * everything heavy stays on distributed storage; this is exactly the
  * Iceberg JDBC-catalog split of pointer-in-DB / content-on-FS.
  */
class JdbcStore(conf: Configuration, val jdbcUrl: String) extends FsStore(conf) {

  private val dialect = JdbcStore.dialectFor(jdbcUrl)

  JdbcStore.ensureSchema(jdbcUrl)

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(jdbcUrl)
    try f(c) finally c.close()
  }

  override def currentVersion(dir: Path): Option[(Int, String)] = withConn { c =>
    val ps = c.prepareStatement(
      "SELECT version, content FROM graft_versions WHERE dir = ? " +
      "ORDER BY version DESC FETCH FIRST 1 ROWS ONLY")
    ps.setString(1, dir.toString)
    val rs = ps.executeQuery()
    if (rs.next()) Some((rs.getInt(1), rs.getString(2))) else None
  }

  override def publish(dir: Path, next: Int, content: String): Boolean = {
    val ok = withConn { c =>
      c.setAutoCommit(false)
      val inserted = tryInsert(c, dir, next, content)
      if (inserted) c.commit() else c.rollback()
      inserted
    }
    if (ok) mirror(dir, next, content)
    ok
  }

  /** The database stores content as text — gzip is an FS-layer
    * encoding only, so it must not bypass the transactional insert. */
  override def publish(dir: Path, next: Int, content: String, gzip: Boolean): Boolean =
    publish(dir, next, content)

  override def publishAllAtomic(entries: Seq[(Path, Int, String)]): Option[Boolean] = {
    val ok = withConn { c =>
      c.setAutoCommit(false)
      val all = entries.forall { case (d, v, s) => tryInsert(c, d, v, s) }
      if (all) c.commit() else c.rollback()
      all
    }
    if (ok) entries.foreach { case (d, v, s) => mirror(d, v, s) }
    Some(ok)
  }

  /** Deleting a path also retires every ledger row at or under it
    * (DROP TABLE/VIEW, journal cleanup pass through here). */
  override def delete(p: Path): Boolean = {
    withConn { c =>
      val ps = c.prepareStatement(
        "DELETE FROM graft_versions WHERE dir = ? OR dir LIKE ? ESCAPE '!'")
      ps.setString(1, p.toString)
      ps.setString(2, likePrefix(p) + "%")
      ps.executeUpdate()
    }
    super.delete(p)
  }

  /** Rename moves the subtree's ledger rows with the files, in one
    * transaction (prefix rewrite on the key). */
  override def renameTree(from: Path, to: Path): Boolean = {
    val ok = super.renameTree(from, to)
    if (ok) withConn { c =>
      val ps = c.prepareStatement(
        "UPDATE graft_versions SET dir = ? || SUBSTR(dir, ?) " +
        "WHERE dir = ? OR dir LIKE ? ESCAPE '!'")
      ps.setString(1, to.toString)
      ps.setInt(2, from.toString.length + 1)
      ps.setString(3, from.toString)
      ps.setString(4, likePrefix(from) + "%")
      ps.executeUpdate()
    }
    ok
  }

  /** duplicate (dir, version) key = a concurrent committer already
    * claimed that version: the CAS loss. Detection is per-dialect —
    * SQLState 23505 is the standard, but sqlite-jdbc reports a null
    * SQLState with a message, so [[JdbcStore.Dialect.isDuplicateKey]]
    * decides. */
  private def tryInsert(c: Connection, dir: Path, v: Int, content: String): Boolean =
    try {
      val ps = c.prepareStatement(
        "INSERT INTO graft_versions(dir, version, content) VALUES (?, ?, ?)")
      ps.setString(1, dir.toString)
      ps.setInt(2, v)
      ps.setCharacterStream(3, new java.io.StringReader(content), content.length.toLong)
      ps.executeUpdate()
      true
    } catch {
      case e: SQLException if dialect.isDuplicateKey(e) => false
    }

  /** Escape the SQL-LIKE metacharacters in a path prefix. */
  private def likePrefix(p: Path): String =
    p.toString.replace("!", "!!").replace("%", "!%").replace("_", "!_") + "/"

  /** Best-effort FS mirror of a published version (discovery +
    * external inspection); correctness never depends on it — the
    * database is the source of truth and the CAS already won. */
  private def mirror(dir: Path, v: Int, content: String): Unit =
    scala.util.Try {
      writeString(versionPath(dir, v), content)
      writeString(new Path(dir, "version-hint.text"), v.toString)
    }
}

object JdbcStore {
  private val initialized = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Latest ledger schema version this build knows. A database stamped
    * with a HIGHER version was created by a newer build: refuse to run
    * rather than write through a schema we don't understand. */
  val SchemaVersion: Int = 2

  /** SQL dialect adapter. The reference treats postgres and sqlite as
    * first-class, validated dialects (denali logic/state.go:219-226
    * rejects anything else; models/pg + models/sqlite are generated
    * per dialect, sqlgen/migrations ships per-dialect DDL). Graft
    * mirrors that split and adds derby (its jars ship with Spark) plus
    * an ANSI fallback for anything else. Selected by JDBC
    * subprotocol. */
  private[graft] sealed abstract class Dialect(val name: String) {
    /** Unbounded-text column type for the metadata JSON payload. */
    def textType: String = "CLOB"
    /** Duplicate primary key on INSERT — the lost CAS / lost stamp. */
    def isDuplicateKey(e: SQLException): Boolean =
      e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      e.getSQLState == "23505"
    /** CREATE TABLE / ADD COLUMN target already exists — a concurrent
      * bootstrapper (or a pre-versioning ledger) got there first. */
    def isObjectExists(e: SQLException): Boolean =
      Option(e.getMessage).exists(_.toLowerCase.contains("already exists"))
    /** Serialize migrations across processes: take an exclusive DB
      * lock on the stamp table inside the current transaction (the
      * pressly/goose stance — it locks for the migration loop). The
      * lock is released by the caller's commit/rollback. Best-effort:
      * engines without LOCK TABLE fall back to error detection. */
    def lockMigrations(c: Connection): Unit =
      try { c.createStatement().executeUpdate(
        "LOCK TABLE graft_schema_version IN EXCLUSIVE MODE"); () }
      catch { case _: SQLException => () }

    /** Stepwise schema migrations, goose-style (the reference versions
      * its DB schema the same way: logic/state.go imports
      * pressly/goose/v3 over models/pg + models/sqlite). Each entry is
      * (version, DDL steps); steps of one version apply in ONE
      * transaction together with the version stamp, so a crash mid-
      * migration leaves the ledger at the previous version, not torn.
      * Append-only: NEVER edit a shipped version's steps — long-lived
      * databases (Postgres) replay only versions above their stamp. */
    def migrations: Seq[(Int, Seq[String])] = Seq(
      1 -> Seq(
        "CREATE TABLE graft_versions(" +
          "dir VARCHAR(1024) NOT NULL, " +
          "version INT NOT NULL, " +
          s"content $textType NOT NULL, " +
          "PRIMARY KEY (dir, version))"),
      2 -> Seq(
        // commit audit: when each metadata version landed (expiry
        // tooling and ops inspection; DEFAULT keeps tryInsert's
        // explicit column list working unchanged)
        "ALTER TABLE graft_versions ADD COLUMN committed_at TIMESTAMP " +
          "DEFAULT CURRENT_TIMESTAMP"))
  }

  private[graft] object DerbyDialect extends Dialect("derby") {
    // X0Y32: schema object already exists; X0Y68: duplicate column
    override def isObjectExists(e: SQLException): Boolean =
      e.getSQLState == "X0Y32" || e.getSQLState == "X0Y68"
  }

  private[graft] object PostgresDialect extends Dialect("postgresql") {
    override def textType: String = "TEXT" // PG has no CLOB
    // 42P07: duplicate_table, 42701: duplicate_column
    override def isObjectExists(e: SQLException): Boolean =
      e.getSQLState == "42P07" || e.getSQLState == "42701"
    override def lockMigrations(c: Connection): Unit =
      try { c.createStatement().executeUpdate(
        "LOCK TABLE graft_schema_version IN ACCESS EXCLUSIVE MODE"); () }
      catch { case _: SQLException => () }
  }

  private[graft] object SqliteDialect extends Dialect("sqlite") {
    override def textType: String = "TEXT"
    // sqlite-jdbc reports null/generic SQLStates: match the engine's
    // stable message forms as well as the standard signals
    override def isDuplicateKey(e: SQLException): Boolean =
      super.isDuplicateKey(e) || Option(e.getMessage).exists(m =>
        m.contains("UNIQUE constraint failed") ||
        m.contains("PRIMARY KEY constraint"))
    override def isObjectExists(e: SQLException): Boolean =
      Option(e.getMessage).exists(m =>
        m.contains("already exists") || m.contains("duplicate column name"))
    // sqlite has no LOCK TABLE: a dummy write upgrades the tx to a
    // RESERVED (single-writer) lock — the whole file serializes
    override def lockMigrations(c: Connection): Unit =
      try { c.createStatement().executeUpdate(
        "DELETE FROM graft_schema_version WHERE version < 0"); () }
      catch { case _: SQLException => () }
    // sqlite's ALTER TABLE ADD COLUMN forbids non-constant defaults:
    // the audit column is nullable with no default there
    override def migrations: Seq[(Int, Seq[String])] =
      super.migrations.map {
        case (2, _) =>
          2 -> Seq("ALTER TABLE graft_versions ADD COLUMN committed_at TIMESTAMP")
        case other => other
      }
  }

  private[graft] object AnsiDialect extends Dialect("ansi")

  private[graft] def dialectFor(url: String): Dialect =
    url.stripPrefix("jdbc:").takeWhile(_ != ':') match {
      case "derby"      => DerbyDialect
      case "postgresql" => PostgresDialect
      case "sqlite"     => SqliteDialect
      case _            => AnsiDialect
    }

  private def ensureSchema(url: String): Unit = {
    if (!initialized.add(url)) return
    // ANY failure un-registers the url: a later JdbcStore in this JVM
    // must retry the bootstrap, not run against a half-migrated ledger
    try bootstrap(url)
    catch { case t: Throwable => initialized.remove(url); throw t }
  }

  /** Idempotent, concurrency-safe bootstrap — no JVM-level guard here,
    * so tests can drive two "processes" against one fresh database.
    * Every lost race (duplicate stamp, object already exists) means a
    * concurrent bootstrapper won that step: roll back, re-read the
    * stamp table, continue from the winner's state. */
  private[graft] def bootstrap(url: String): Unit = {
    val dialect = dialectFor(url)
    if (sys.props.get("derby.stream.error.file").isEmpty)
      System.setProperty("derby.stream.error.file", "/tmp/graft-derby.log")
    // Derby 10.15+ keeps EmbeddedDriver in derbytools; ServiceLoader
    // normally auto-registers it, this covers stripped classpaths.
    scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver"))
    val c = DriverManager.getConnection(url)
    try {
      c.setAutoCommit(false)
      val st = c.createStatement()
      try {
        st.executeUpdate(
          "CREATE TABLE graft_schema_version(" +
          "version INT NOT NULL PRIMARY KEY, applied_at TIMESTAMP NOT NULL)")
        c.commit()
      } catch {
        case e: SQLException if dialect.isObjectExists(e) => c.rollback()
      }
      def current(): Int = {
        val rs = st.executeQuery("SELECT MAX(version) FROM graft_schema_version")
        try { if (rs.next()) rs.getInt(1) else 0 } finally rs.close()
      }
      // existence probe via a harmless SELECT, NOT getMetaData: catalog
      // metadata folds identifier case per engine (Derby upper-cases,
      // Postgres lower-cases) and a folded lookup misses the table
      def versionsTableExists(): Boolean =
        try { st.executeQuery("SELECT dir FROM graft_versions WHERE 1 = 0").close(); true }
        catch { case _: SQLException => c.rollback(); false }
      var cur = current()
      // a pre-versioning ledger (graft_versions exists, no stamp) IS
      // schema v1: baseline it in place, then replay the rest
      if (cur == 0 && versionsTableExists()) {
        try {
          st.executeUpdate(
            "INSERT INTO graft_schema_version VALUES (1, CURRENT_TIMESTAMP)")
          c.commit()
        } catch {
          case e: SQLException if dialect.isDuplicateKey(e) => c.rollback()
        }
        cur = current()
      }
      if (cur > SchemaVersion)
        throw new IllegalStateException(
          s"ledger at $url has schema v$cur, newer than this build's v$SchemaVersion — " +
          "refusing to run against a future schema (upgrade graft instead)")
      dialect.migrations.filter(_._1 > cur).foreach { case (v, steps) =>
        // exclusive lock on the stamp table for this version's
        // transaction: a concurrent bootstrapper blocks HERE until our
        // commit, re-reads `current()`, and skips — no DDL ever runs
        // against a descriptor another process is mutating
        dialect.lockMigrations(c)
        if (v > current()) {
          try {
            steps.foreach(st.executeUpdate)
            st.executeUpdate(
              s"INSERT INTO graft_schema_version VALUES ($v, CURRENT_TIMESTAMP)")
            c.commit() // releases the migration lock
          } catch {
            // belt-and-braces for engines where lockMigrations is a
            // no-op: a duplicate stamp / existing object means the
            // concurrent bootstrapper already committed this version
            case e: SQLException
                if dialect.isDuplicateKey(e) || dialect.isObjectExists(e) =>
              c.rollback()
              if (current() < v)
                throw new IllegalStateException(
                  s"ledger migration v$v at $url hit an object-exists conflict but no " +
                  s"concurrent bootstrapper stamped v$v — a pre-existing object clashes " +
                  "with the ledger schema; resolve the name collision manually", e)
          }
        } else c.rollback() // already migrated — just release the lock
      }
    } finally {
      // roll back any open read transaction first: closing an active
      // non-autocommit connection throws and would mask the real error
      scala.util.Try(c.rollback())
      scala.util.Try(c.close())
    }
  }
}
