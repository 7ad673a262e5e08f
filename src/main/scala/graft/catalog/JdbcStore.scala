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
  * Derby embedded works out of the box (its jars ship with Spark:
  * `jdbc:derby:/path/to/db;create=true`); any ANSI JDBC database with
  * the same DDL works the same way.
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
    * claimed that version: the CAS loss. Derby SQLState 23505. */
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
      case e: SQLException if e.getSQLState == "23505" => false
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

  /** Stepwise schema migrations, goose-style (the reference versions
    * its DB schema the same way: logic/state.go imports
    * pressly/goose/v3 over models/pg + models/sqlite). Each entry is
    * (version, DDL steps); steps of one version apply in ONE
    * transaction together with the version stamp, so a crash mid-
    * migration leaves the ledger at the previous version, not torn.
    * Append-only: NEVER edit a shipped version's steps — long-lived
    * databases (Postgres) replay only versions above their stamp. */
  private val migrations: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq(
      "CREATE TABLE graft_versions(" +
        "dir VARCHAR(1024) NOT NULL, " +
        "version INT NOT NULL, " +
        "content CLOB NOT NULL, " +
        "PRIMARY KEY (dir, version))"),
    2 -> Seq(
      // commit audit: when each metadata version landed (expiry
      // tooling and ops inspection; DEFAULT keeps tryInsert's explicit
      // column list working unchanged)
      "ALTER TABLE graft_versions ADD COLUMN committed_at TIMESTAMP " +
        "DEFAULT CURRENT_TIMESTAMP"))

  private def tableExists(c: Connection, name: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null, name, null)
    try rs.next() finally rs.close()
  }

  private def ensureSchema(url: String): Unit = {
    if (!initialized.add(url)) return
    if (sys.props.get("derby.stream.error.file").isEmpty)
      System.setProperty("derby.stream.error.file", "/tmp/graft-derby.log")
    // Derby 10.15+ keeps EmbeddedDriver in derbytools; ServiceLoader
    // normally auto-registers it, this covers stripped classpaths.
    scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver"))
    val c = DriverManager.getConnection(url)
    try {
      c.setAutoCommit(false)
      val st = c.createStatement()
      try st.executeUpdate(
        "CREATE TABLE graft_schema_version(" +
        "version INT NOT NULL PRIMARY KEY, applied_at TIMESTAMP NOT NULL)")
      catch { case e: SQLException if e.getSQLState == "X0Y32" => c.rollback() }
      c.commit()
      def current(): Int = {
        val rs = st.executeQuery("SELECT MAX(version) FROM graft_schema_version")
        try { if (rs.next()) rs.getInt(1) else 0 } finally rs.close()
      }
      var cur = current()
      // a pre-versioning ledger (graft_versions exists, no stamp) IS
      // schema v1: baseline it in place, then replay the rest
      if (cur == 0 && tableExists(c, "GRAFT_VERSIONS")) {
        st.executeUpdate(
          "INSERT INTO graft_schema_version VALUES (1, CURRENT_TIMESTAMP)")
        c.commit()
        cur = 1
      }
      if (cur > SchemaVersion) {
        initialized.remove(url)
        throw new IllegalStateException(
          s"ledger at $url has schema v$cur, newer than this build's v$SchemaVersion — " +
          "refusing to run against a future schema (upgrade graft instead)")
      }
      migrations.filter(_._1 > cur).foreach { case (v, steps) =>
        try {
          steps.foreach(st.executeUpdate)
          st.executeUpdate(
            s"INSERT INTO graft_schema_version VALUES ($v, CURRENT_TIMESTAMP)")
          c.commit()
        } catch {
          // duplicate version stamp = a concurrent bootstrapper won
          // this migration — roll back ours and continue from theirs
          case e: SQLException if e.getSQLState == "23505" => c.rollback()
        }
      }
    } finally {
      // roll back any open read transaction first: closing an active
      // non-autocommit connection throws and would mask the real error
      scala.util.Try(c.rollback())
      scala.util.Try(c.close())
    }
  }
}
