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

  def fs(p: Path): FileSystem = {
    val f = p.getFileSystem(conf)
    // Hadoop's LocalFileSystem wraps every write in a ChecksumFS: each
    // tiny metadata object becomes TWO files (payload + .crc sidecar)
    // plus a CRC pass, and commit latency on a local warehouse is
    // FS-op-bound (measured: manifest+publish ≈ 0.3 s per commit on
    // tmpfs-class disks, mostly op count). Integrity of the store does
    // not ride on the sidecars — the CAS publish arbitrates versions
    // and every read re-parses JSON — and non-local stores (HDFS/S3A)
    // have server-side integrity, so this is scheme-gated to file://.
    if (Option(f.getUri.getScheme).forall(_ == "file")) {
      f.setWriteChecksum(false)
      f.setVerifyChecksum(false)
    }
    f
  }

  /** Read a text object; gzip-compressed content (magic 1F 8B) is
    * decompressed transparently — the reference stores VIEW metadata
    * gzipped (`logic/view.go:127-137` writes through gzip.NewWriter,
    * `iceberg-overload/view/metadata.go:46-60` reads through
    * gzip.NewReader), so graft must read either encoding anywhere a
    * metadata file can appear. */
  def readString(p: Path): String = {
    val in = fs(p).open(p)
    try {
      val bytes = in.readAllBytes()
      val data =
        if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B) {
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try gz.readAllBytes() finally gz.close()
        } else bytes
      new String(data, StandardCharsets.UTF_8)
    } finally in.close()
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
    val out = fs(tmp).create(tmp, true)
    try out.write(bytes) finally out.close()
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
        val gzOut = fs(dir).create(gzVersionPath(dir, next), true)
        try gzOut.write(bytes) finally gzOut.close()
      }
      // Best-effort hint; correctness never depends on it.
      scala.util.Try(writeString(new Path(dir, "version-hint.text"), next.toString))
    }
    ok
  }
}
