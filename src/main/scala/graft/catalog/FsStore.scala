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

  /** `file://` fast path: the java.nio path of `p` when it is local,
    * None otherwise. The store's own I/O goes through java.nio on
    * local filesystems because Hadoop's RawLocalFileSystem FORKS a
    * `chmod` per created file when the native lib is absent (measured
    * ~50-150 ms per metadata object on this image — commit latency was
    * process-spawn-bound, not disk-bound), and LocalFileSystem
    * additionally doubles every object with a `.crc` sidecar. java.nio
    * needs neither; HDFS/S3A keep the Hadoop path untouched. This
    * replaces r15's JVM-wide `setWriteChecksum(false)` on the SHARED
    * cached FileSystem (r15 ADVICE: that silently disabled checksum
    * verification for ALL local I/O in the process, including Spark's
    * own data files — the shared instance is no longer mutated at
    * all). */
  private def localNio(p: Path): Option[java.nio.file.Path] = {
    val uri = p.toUri
    val scheme = Option(uri.getScheme)
    if (scheme.forall(_ == "file") && Option(uri.getAuthority).isEmpty)
      Some(java.nio.file.Paths.get(uri.getPath))
    else None
  }

  /** Read a text object; gzip-compressed content (magic 1F 8B) is
    * decompressed transparently — the reference stores VIEW metadata
    * gzipped (`logic/view.go:127-137` writes through gzip.NewWriter,
    * `iceberg-overload/view/metadata.go:46-60` reads through
    * gzip.NewReader), so graft must read either encoding anywhere a
    * metadata file can appear. */
  def readString(p: Path): String = {
    val bytes = localNio(p) match {
      case Some(np) => java.nio.file.Files.readAllBytes(np)
      case None =>
        val in = fs(p).open(p)
        try in.readAllBytes() finally in.close()
    }
    val data =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B) {
        val gz = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try gz.readAllBytes() finally gz.close()
      } else bytes
    new String(data, StandardCharsets.UTF_8)
  }

  def writeString(p: Path, s: String, overwrite: Boolean = true): Unit =
    writeBytes(p, s.getBytes(StandardCharsets.UTF_8), overwrite)

  private def writeBytes(p: Path, bytes: Array[Byte], overwrite: Boolean): Unit =
    localNio(p) match {
      case Some(np) =>
        import java.nio.file.{Files, StandardOpenOption => O}
        Option(np.getParent).foreach(Files.createDirectories(_))
        if (overwrite)
          Files.write(np, bytes, O.CREATE, O.TRUNCATE_EXISTING, O.WRITE)
        else Files.write(np, bytes, O.CREATE_NEW, O.WRITE)
        ()
      case None =>
        val out = fs(p).create(p, overwrite)
        try out.write(bytes) finally out.close()
    }

  def exists(p: Path): Boolean = localNio(p) match {
    case Some(np) => java.nio.file.Files.exists(np)
    case None => fs(p).exists(p)
  }
  def delete(p: Path): Boolean = localNio(p) match {
    case Some(np) =>
      import java.nio.file.Files
      if (!Files.exists(np)) false
      else {
        if (Files.isDirectory(np)) {
          val walk = Files.walk(np)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { Files.deleteIfExists(f); () })
          finally walk.close()
        } else Files.deleteIfExists(np)
        true
      }
    case None => fs(p).delete(p, true)
  }
  def mkdirs(p: Path): Boolean = localNio(p) match {
    case Some(np) => java.nio.file.Files.createDirectories(np); true
    case None => fs(p).mkdirs(p)
  }

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
    else localNio(p) match {
      case Some(np) =>
        val s = java.nio.file.Files.list(np)
        try {
          import scala.jdk.CollectionConverters._
          // NOT Path(f.toUri): nio directory URIs carry a trailing
          // slash, which makes Hadoop Path.getName return "".
          s.iterator().asScala.map(f => new Path("file", null, f.toString)).toSeq
        } finally s.close()
      case None => fs(p).listStatus(p).toSeq.map(_.getPath)
    }

  /** All files under `p`, recursively. */
  def listFilesRec(p: Path): Seq[Path] = {
    if (!exists(p)) return Seq.empty
    localNio(p) match {
      case Some(np) =>
        val s = java.nio.file.Files.walk(np)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(f => new Path("file", null, f.toString)).toSeq
        } finally s.close()
      case None =>
        val it = fs(p).listFiles(p, true)
        val buf = Seq.newBuilder[Path]
        while (it.hasNext) buf += it.next().getPath
        buf.result()
    }
  }

  private val VersionFile = raw"v(\d+)\.metadata\.json".r
  private val VersionFileGz = raw"v(\d+)\.gz\.metadata\.json".r

  def versionOf(p: Path): Option[Int] = p.getName match {
    case VersionFile(v) => Some(v.toInt)
    case VersionFileGz(v) => Some(v.toInt)
    case _ => None
  }

  def versionPath(dir: Path, v: Int): Path = new Path(dir, s"v$v.metadata.json")

  /** Gzip-encoded version name — the reference's VIEW metadata layout
    * (`%05d-%v.gz.metadata.json` in logic/view.go; graft keeps its own
    * vN numbering, matching the `.gz.metadata.json` suffix). */
  def gzVersionPath(dir: Path, v: Int): Path = new Path(dir, s"v$v.gz.metadata.json")

  /** The on-disk path of version `v`, whichever encoding exists
    * (plain checked first). */
  def existingVersionPath(dir: Path, v: Int): Path = {
    val p = versionPath(dir, v)
    if (exists(p)) p else gzVersionPath(dir, v)
  }

  private def versionExists(dir: Path, v: Int): Boolean =
    exists(versionPath(dir, v)) || exists(gzVersionPath(dir, v))

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
    if (!versionExists(dir, v)) {
      val vs = list(dir).flatMap(versionOf)
      if (vs.isEmpty) return None
      v = vs.max
    } else {
      while (versionExists(dir, v + 1)) v += 1
    }
    Some((v, readString(existingVersionPath(dir, v))))
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
  def publish(dir: Path, next: Int, content: String): Boolean =
    publish(dir, next, content, gzip = false)

  /** As [[publish]]; with `gzip = true` the version ALSO lands as
    * `vN.gz.metadata.json` with gzip-compressed content (the
    * reference's view-metadata encoding).
    *
    * The CAS arbiter is ALWAYS the plain `vN.metadata.json` name,
    * whatever the encoding: two writers racing on version N with
    * DIFFERENT encodings would otherwise both win their check-then-act
    * on two distinct target filenames, leaving two files claiming N.
    * A gzip publish therefore claims the plain name with the gzip
    * BYTES (readers sniff the 1F 8B magic in [[readString]], so the
    * content is readable under either name) and then adds the
    * `.gz.metadata.json` layout name best-effort after winning —
    * a crash between the two leaves a fully readable version. */
  def publish(dir: Path, next: Int, content: String, gzip: Boolean): Boolean = {
    mkdirs(dir)
    val target = versionPath(dir, next)
    if (versionExists(dir, next)) return false
    val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}.metadata.json")
    val bytes =
      if (gzip) {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(content.getBytes(StandardCharsets.UTF_8)); gz.close()
        bos.toByteArray
      } else content.getBytes(StandardCharsets.UTF_8)
    writeBytes(tmp, bytes, overwrite = true)
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
      if (gzip) scala.util.Try {
        // Layout-parity name (the reference's view encoding); the
        // arbitrating plain file already holds the same gzip bytes.
        writeBytes(gzVersionPath(dir, next), bytes, overwrite = true)
      }
      // Best-effort hint; correctness never depends on it.
      scala.util.Try(writeString(new Path(dir, "version-hint.text"), next.toString))
    }
    ok
  }
}
