package graft.catalog

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path

/** Minimal Apache Puffin writer — the Iceberg statistics-file format
  * ([[IcebergExport]] registers the result in the exported
  * metadata.json `statistics` array, the spec's table-level stats
  * hook).
  *
  * Layout per the Puffin spec: `Magic, Blob₁…Blobₙ, Footer` where
  * Footer = `Magic, FooterPayload (UTF-8 JSON), FooterPayloadSize
  * (4-byte LE int), Flags (4 bytes, zero = uncompressed), Magic` and
  * Magic = "PFA1". FileMetadata JSON carries one BlobMetadata per
  * blob: type, fields, snapshot-id, sequence-number, offset, length.
  *
  * The blob graft writes is `graft-column-stats-v1`: the
  * manifest-derived per-column min/max/null-count/file-count rollup of
  * the snapshot's live data files, as UTF-8 JSON — zero data-file
  * reads (the rollup is O(manifest)), and spec-conforming readers that
  * don't know the type skip it by contract ("ignore unknown blob
  * types"). The standard sketch blob (apache-datasketches-theta-v1)
  * needs the datasketches library, which this environment doesn't
  * ship; the container format is the compatibility surface. */
object PuffinStats {

  private val Magic = Array[Byte]('P', 'F', 'A', '1')
  private val mapper = new ObjectMapper()

  final case class Written(
      path: String, fileSize: Long, footerSize: Long, blobMetadataJson: String)

  /** Aggregate per-column stats over the snapshot's live data entries
    * (min of mins, max of maxes, sum of null counts — strings compare
    * by the schema's type semantics at read time, so the rollup keeps
    * the manifest's string forms verbatim where ordering is unclear
    * and numeric forms where it is). */
  private[catalog] def columnRollup(
      meta: TableMetadata, entries: Seq[DataFileEntry]): Map[String, (Option[String], Option[String], Long, Int)] = {
    val numeric: Set[String] = meta.currentSchema.fields.collect {
      case f if Set("tinyint", "smallint", "int", "integer", "bigint", "long",
        "float", "real", "double").contains(f.dataType.toLowerCase) => f.name
    }.toSet
    val data = entries.filter(_.isData)
    val cols = data.flatMap(_.stats.keys).distinct
    cols.map { c =>
      val s = data.flatMap(_.stats.get(c))
      def pick(vs: Seq[String], wantMin: Boolean): Option[String] =
        if (vs.isEmpty) None
        else Some(
          if (numeric.contains(c)) {
            val ds = vs.map(v => v -> v.toDouble)
            (if (wantMin) ds.minBy(_._2) else ds.maxBy(_._2))._1
          } else if (wantMin) vs.min else vs.max)
      val mins = pick(s.flatMap(_.min), wantMin = true)
      val maxs = pick(s.flatMap(_.max), wantMin = false)
      val nulls = s.flatMap(_.nulls).sum
      c -> ((mins, maxs, nulls, data.count(_.stats.contains(c))))
    }.toMap
  }

  /** Write a Puffin stats file for `snap`'s live state at `target`;
    * returns sizes + the blob-metadata JSON for the metadata.json
    * `statistics` entry. */
  def write(
      ops: TableOps,
      tableDir: Path,
      meta: TableMetadata,
      snap: Snapshot,
      target: Path): Written = {
    val rollup = columnRollup(meta, ops.snapshotEntries(tableDir, snap))
    val blobNode = mapper.createObjectNode()
    rollup.toSeq.sortBy(_._1).foreach { case (c, (mn, mx, nulls, files)) =>
      val co = blobNode.putObject(c)
      mn.foreach(co.put("min", _))
      mx.foreach(co.put("max", _))
      co.put("null-count", nulls)
      co.put("file-count", files)
    }
    val blob = blobNode.toString.getBytes(StandardCharsets.UTF_8)

    val fieldIds = meta.currentSchema.fields
      .filter(f => rollup.contains(f.name)).map(_.id)
    val blobMeta = mapper.createObjectNode()
    blobMeta.put("type", "graft-column-stats-v1")
    val fa = blobMeta.putArray("fields")
    fieldIds.foreach(fa.add)
    blobMeta.put("snapshot-id", snap.snapshotId)
    blobMeta.put("sequence-number", snap.sequenceNumber)
    blobMeta.put("offset", Magic.length.toLong) // first blob, after the header magic
    blobMeta.put("length", blob.length.toLong)

    val footerPayloadNode = mapper.createObjectNode()
    footerPayloadNode.putArray("blobs").add(blobMeta)
    footerPayloadNode.putObject("properties").put("created-by", "graft")
    val footerPayload = footerPayloadNode.toString.getBytes(StandardCharsets.UTF_8)

    val bos = new ByteArrayOutputStream()
    bos.write(Magic)          // header
    bos.write(blob)           // blob 1
    bos.write(Magic)          // footer start
    bos.write(footerPayload)
    val sizeBuf = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    sizeBuf.putInt(footerPayload.length)
    bos.write(sizeBuf.array())
    bos.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed payload
    bos.write(Magic)          // footer end
    val bytes = bos.toByteArray

    val out = ops.store.fs(target).create(target, true)
    try out.write(bytes) finally out.close()
    // footer = Magic + payload + size + flags + Magic
    Written(target.toString, bytes.length.toLong,
      (Magic.length + footerPayload.length + 4 + 4 + Magic.length).toLong,
      blobMeta.toString)
  }

  // ---------- Iceberg v3 deletion-vector blobs ----------

  /** The v3 DV blob's inner magic (spec: `delete-vector-v1` payload
    * starts with bytes D1 D3 39 64 after the 4-byte length prefix). */
  private[catalog] val DvMagic = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64)

  /** Serialize `snap`'s pending deletion vectors as an Iceberg v3
    * Puffin file: one `delete-vector-v1` blob per referenced data file
    * (vectors from multiple DV commits OR-merge — positional masking
    * is path-keyed and sequence-independent, and v3 allows at most one
    * DV per data file). Blob layout per the v3 spec:
    *
    * `length (4B big-endian, = |magic| + |vector|) | magic D1 D3 39 64
    *  | RoaringBitmap portable-64 serialization | CRC-32 (4B
    *  big-endian, over magic+vector — plain `java.util.zip.CRC32`,
    *  the Delta-compatible polynomial the v3 spec mandates, NOT
    *  CRC-32C)`
    *
    * Blob metadata carries `referenced-data-file` and `cardinality`
    * properties, the v3 manifest-side contract. Graft's internal DV
    * parquet already stores the portable-64 bytes
    * ([[DeletionVectors.serialize]]), so this is re-framing, not
    * re-encoding. Returns None when the snapshot has no DVs.
    *
    * Driver memory: one compressed bitmap per referenced data file in
    * flight (~128 KB per million dead rows) — the same budget as the
    * SQL MOR commit path, metadata-sized at any table scale. */
  def writeDeleteVectors(
      ops: TableOps,
      spark: org.apache.spark.sql.SparkSession,
      tableDir: Path,
      snap: Snapshot,
      target: Path): Option[Written] = {
    import org.roaringbitmap.longlong.Roaring64NavigableMap
    val dvEntries = ops.load(tableDir).map { case (_, m) =>
      ops.resolveEntries(tableDir, m, Some(snap.snapshotId)) }
      .getOrElse(Seq.empty).filter(_.isDvDelete)
    if (dvEntries.isEmpty) return None
    val basePrefix = tableDir.toUri.getPath + "/"
    val merged = scala.collection.mutable.TreeMap.empty[String, Roaring64NavigableMap]
    spark.read.schema(DeletionVectors.schema).parquet(dvEntries.map(_.path): _*)
      .collect().foreach { r =>
        val raw = r.getString(0)
        // stored paths may be table-relative (rename-safe form)
        val abs = if (raw.startsWith("/") || raw.contains(":/")) {
          raw.replaceFirst("^file:/+", "/")
        } else basePrefix + raw
        val bm = DeletionVectors.deserialize(r.getAs[Array[Byte]](2))
        merged.get(abs) match {
          case Some(acc) => acc.or(bm)
          case None      => merged.update(abs, bm)
        }
      }

    val blobMetas = Seq.newBuilder[com.fasterxml.jackson.databind.node.ObjectNode]
    val body = new ByteArrayOutputStream()
    body.write(Magic) // header
    var offset = Magic.length.toLong
    merged.foreach { case (dataFile, bm) =>
      val vec = DeletionVectors.serialize(bm)
      val crc = new java.util.zip.CRC32()
      crc.update(DvMagic)
      crc.update(vec)
      val buf = ByteBuffer.allocate(4 + DvMagic.length + vec.length + 4)
        .order(ByteOrder.BIG_ENDIAN)
      buf.putInt(DvMagic.length + vec.length)
      buf.put(DvMagic)
      buf.put(vec)
      buf.putInt(crc.getValue.toInt)
      val blob = buf.array()
      body.write(blob)
      val bmeta = mapper.createObjectNode()
      bmeta.put("type", "delete-vector-v1")
      bmeta.putArray("fields")
      bmeta.put("snapshot-id", snap.snapshotId)
      bmeta.put("sequence-number", snap.sequenceNumber)
      bmeta.put("offset", offset)
      bmeta.put("length", blob.length.toLong)
      val props = bmeta.putObject("properties")
      props.put("referenced-data-file", dataFile)
      props.put("cardinality", bm.getLongCardinality.toString)
      blobMetas += bmeta
      offset += blob.length
    }

    val footerPayloadNode = mapper.createObjectNode()
    val blobsArr = footerPayloadNode.putArray("blobs")
    blobMetas.result().foreach(blobsArr.add)
    footerPayloadNode.putObject("properties").put("created-by", "graft")
    val footerPayload = footerPayloadNode.toString.getBytes(StandardCharsets.UTF_8)
    body.write(Magic)
    body.write(footerPayload)
    val sizeBuf = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    sizeBuf.putInt(footerPayload.length)
    body.write(sizeBuf.array())
    body.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed payload
    body.write(Magic)
    val bytes = body.toByteArray

    val out = ops.store.fs(target).create(target, true)
    try out.write(bytes) finally out.close()
    Some(Written(target.toString, bytes.length.toLong,
      (Magic.length + footerPayload.length + 4 + 4 + Magic.length).toLong,
      footerPayloadNode.toString))
  }

  /** One `delete-vector-v1` blob's coordinates within a Puffin file —
    * what [[readDeleteVectorMetas]] returns so the vectors themselves
    * can be decoded on EXECUTORS (cardinality is the blob's declared
    * property, -1 when the writer omitted it). */
  final case class DvBlobMeta(
      referencedFile: String, offset: Long, length: Int, cardinality: Long)

  /** Footer-only parse of a Puffin file: container magics validated,
    * `delete-vector-v1` blob coordinates returned WITHOUT reading any
    * vector bytes — O(blobs) driver memory for an import whose blob
    * payload may be gigabytes. Positioned reads only touch the header,
    * the footer and 12 trailing bytes. */
  def readDeleteVectorMetas(ops: TableOps, path: Path): Seq[DvBlobMeta] = {
    val fs = ops.store.fs(path)
    val len = fs.getFileStatus(path).getLen
    require(len >= 24, s"$path is too short to be a Puffin file")
    val in = fs.open(path)
    try {
      def readAt(off: Long, n: Int): Array[Byte] = {
        val b = new Array[Byte](n); in.readFully(off, b, 0, n); b
      }
      require(java.util.Arrays.equals(readAt(0, 4), Magic),
        s"$path is not a Puffin file (missing header magic)")
      require(java.util.Arrays.equals(readAt(len - 4, 4), Magic),
        s"$path: missing trailing magic")
      require((readAt(len - 8, 1)(0) & 0x1) == 0,
        s"$path: compressed footer payload unsupported")
      val payloadSize = ByteBuffer.wrap(readAt(len - 12, 4))
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      val payloadOff = len - 12 - payloadSize
      require(payloadOff >= 8 && java.util.Arrays.equals(readAt(payloadOff - 4, 4), Magic),
        s"$path: missing footer-start magic")
      val footer = mapper.readTree(
        new String(readAt(payloadOff, payloadSize), StandardCharsets.UTF_8))
      import scala.jdk.CollectionConverters._
      Option(footer.get("blobs")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .filter(b => b.get("type").asText() == "delete-vector-v1")
        .map { b =>
          DvBlobMeta(
            b.get("properties").get("referenced-data-file").asText(),
            b.get("offset").asLong(),
            b.get("length").asLong().toInt,
            Option(b.get("properties").get("cardinality"))
              .map(_.asText().toLong).getOrElse(-1L))
        }
    } finally in.close()
  }

  /** Decode + validate ONE delete-vector-v1 blob's raw bytes (length
    * prefix, inner magic, CRC-32 over magic+vector) and return the
    * portable-serialized vector — executor-side worker of the
    * distributed import; also the single source of truth the
    * whole-file reader below delegates to. */
  def decodeDeleteVectorBlob(blob: Array[Byte], context: String): Array[Byte] = {
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val inner = buf.getInt // |magic| + |vector|
    require(inner == blob.length - 8, s"$context: blob length mismatch")
    val magic = new Array[Byte](4); buf.get(magic)
    require(java.util.Arrays.equals(magic, DvMagic),
      s"$context: delete-vector blob has wrong inner magic")
    val vec = new Array[Byte](inner - 4); buf.get(vec)
    val crcStored = buf.getInt
    val crc = new java.util.zip.CRC32()
    crc.update(DvMagic); crc.update(vec)
    // Spec checksum is plain CRC-32 (the v3/Delta polynomial). Blobs
    // exported by pre-r14 builds of this library used CRC-32C; accept
    // those on read (transition fallback) so old exports stay readable
    // — anything matching neither polynomial is genuine corruption.
    val ok = crc.getValue.toInt == crcStored || {
      val c = new java.util.zip.CRC32C()
      c.update(DvMagic); c.update(vec)
      c.getValue.toInt == crcStored
    }
    require(ok, s"$context: CRC mismatch in delete-vector blob")
    vec
  }

  /** Parse a Puffin file's `delete-vector-v1` blobs: (referenced data
    * file, dead-ordinal bitmap) per blob. Validates the container
    * magics, each blob's inner magic and its CRC-32 — a corrupt or
    * truncated vector fails LOUDLY rather than silently resurrecting
    * deleted rows. Blobs of other types are skipped by contract. */
  def readDeleteVectors(
      ops: TableOps,
      path: Path): Seq[(String, org.roaringbitmap.longlong.Roaring64NavigableMap)] = {
    val in = ops.store.fs(path).open(path)
    val bytes = try in.readAllBytes() finally in.close()
    def magicAt(off: Int): Boolean =
      off >= 0 && off + 4 <= bytes.length &&
        java.util.Arrays.equals(bytes.slice(off, off + 4), Magic)
    require(magicAt(0), s"$path is not a Puffin file (missing header magic)")
    require(magicAt(bytes.length - 4), s"$path: missing trailing magic")
    val flagsOff = bytes.length - 8
    val payloadSize = ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    require((bytes(flagsOff) & 0x1) == 0, s"$path: compressed footer payload unsupported")
    val payloadOff = bytes.length - 12 - payloadSize
    require(magicAt(payloadOff - 4), s"$path: missing footer-start magic")
    val footer = mapper.readTree(
      new String(bytes, payloadOff, payloadSize, StandardCharsets.UTF_8))
    import scala.jdk.CollectionConverters._
    Option(footer.get("blobs")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .filter(b => b.get("type").asText() == "delete-vector-v1")
      .map { b =>
        val off = b.get("offset").asLong().toInt
        val len = b.get("length").asLong().toInt
        val vec = decodeDeleteVectorBlob(
          java.util.Arrays.copyOfRange(bytes, off, off + len), s"$path@$off")
        val ref = b.get("properties").get("referenced-data-file").asText()
        ref -> DeletionVectors.deserialize(vec)
      }
  }
}
