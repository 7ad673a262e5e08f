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

  private def ensureSchema(url: String): Unit = {
    if (!initialized.add(url)) return
    if (sys.props.get("derby.stream.error.file").isEmpty)
      System.setProperty("derby.stream.error.file", "/tmp/graft-derby.log")
    // Derby 10.15+ keeps EmbeddedDriver in derbytools; ServiceLoader
    // normally auto-registers it, this covers stripped classpaths.
    scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver"))
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.executeUpdate(
        "CREATE TABLE graft_versions(" +
        "dir VARCHAR(1024) NOT NULL, " +
        "version INT NOT NULL, " +
        "content CLOB NOT NULL, " +
        "PRIMARY KEY (dir, version))")
      catch { case e: SQLException if e.getSQLState == "X0Y32" => () } // exists
    } finally c.close()
  }
}
