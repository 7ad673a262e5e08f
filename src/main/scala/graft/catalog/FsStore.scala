package graft.catalog

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned-object store on a Hadoop `FileSystem` (works on local FS,
  * HDFS, S3A — anywhere Spark runs).
  *
  * Optimistic concurrency: a commit writes the next state to a temp
  * file and atomically renames it to `v<N+1>.metadata.json`. Rename
  * onto an existing destination fails, so exactly one of two racing
  * committers wins — the same guarantee the reference gets from its DB
  * transaction on `last_sequence_number` (denali logic/tx.go), with
  * the filesystem as the arbiter instead of SQLite/Postgres.
  * `version-hint.text` is a best-effort pointer; readers fall back to
  * scanning for the highest version, so a stale hint is never
  * incorrect, only slower.
  */
class FsStore(conf: Configuration) {

  def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def readString(p: Path): String = {
    val in = fs(p).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  def writeString(p: Path, s: String, overwrite: Boolean = true): Unit = {
    val out = fs(p).create(p, overwrite)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def exists(p: Path): Boolean = fs(p).exists(p)
  def delete(p: Path): Boolean = fs(p).delete(p, true)
  def mkdirs(p: Path): Boolean = fs(p).mkdirs(p)

  /** Move a whole subtree (table/view rename). Stores that keep state
    * outside the filesystem override this to move that state too. */
  def renameTree(from: Path, to: Path): Boolean = fs(from).rename(from, to)

  /** CAS-publish several versioned objects in ONE transaction, when
    * the backing store can span objects atomically. `None` = no such
    * support (this FS store: callers fall back to ordered CAS with
    * rollback/journal); `Some(true)` = every entry published;
    * `Some(false)` = a conflict, NOTHING published. */
  def publishAllAtomic(entries: Seq[(Path, Int, String)]): Option[Boolean] = None

  def list(p: Path): Seq[Path] =
    if (!exists(p)) Seq.empty
    else fs(p).listStatus(p).toSeq.map(_.getPath)

  /** All files under `p`, recursively. */
  def listFilesRec(p: Path): Seq[Path] = {
    if (!exists(p)) return Seq.empty
    val it = fs(p).listFiles(p, true)
    val buf = Seq.newBuilder[Path]
    while (it.hasNext) buf += it.next().getPath
    buf.result()
  }

  private val VersionFile = raw"v(\d+)\.metadata\.json".r

  def versionOf(p: Path): Option[Int] = p.getName match {
    case VersionFile(v) => Some(v.toInt)
    case _ => None
  }

  def versionPath(dir: Path, v: Int): Path = new Path(dir, s"v$v.metadata.json")

  /** Current (version, content) of a versioned object, using the hint
    * then scanning forward; None if the object has no versions. */
  def currentVersion(dir: Path): Option[(Int, String)] = {
    if (!exists(dir)) return None
    val hint = new Path(dir, "version-hint.text")
    val hinted =
      if (exists(hint)) scala.util.Try(readString(hint).trim.toInt).toOption.getOrElse(0)
      else 0
    // Advance past a stale hint.
    var v = math.max(hinted, 0)
    if (!exists(versionPath(dir, v))) {
      val vs = list(dir).flatMap(versionOf)
      if (vs.isEmpty) return None
      v = vs.max
    } else {
      while (exists(versionPath(dir, v + 1))) v += 1
    }
    Some((v, readString(versionPath(dir, v))))
  }

  /** CAS-publish version `next` (must be current+1). Returns false if a
    * concurrent committer already claimed it.
    *
    * The arbiter differs by filesystem because rename semantics do:
    * HDFS rename fails when the destination exists (a true CAS), but
    * POSIX rename(2) — what the local FS uses — silently REPLACES it,
    * so a check-then-rename has a lost-update window. On `file:` we
    * therefore hard-link the temp file into place: link(2) fails with
    * EEXIST atomically, giving exactly-one-winner on local disks too.
    */
  def publish(dir: Path, next: Int, content: String): Boolean = {
    mkdirs(dir)
    val target = versionPath(dir, next)
    if (exists(target)) return false
    val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}.metadata.json")
    writeString(tmp, content)
    val scheme = Option(fs(dir).getUri.getScheme).getOrElse("file")
    val ok =
      if (scheme == "file") {
        import java.nio.file.{Files, Paths => JPaths}
        try {
          Files.createLink(
            JPaths.get(target.toUri.getPath), JPaths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      } else {
        fs(dir).rename(tmp, target)
      }
    delete(tmp)
    if (ok) {
      // Best-effort hint; correctness never depends on it.
      scala.util.Try(writeString(new Path(dir, "version-hint.text"), next.toString))
    }
    ok
  }
}
