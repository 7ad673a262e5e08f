package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.3 L12): image/audio/video
  * as opaque `binary` columns with typed metadata, processed in
  * distributed batches.
  *
  * The Spark-side machinery — schema, partition-parallel batch
  * processing, output shape — is real and tested. IMAGE decode is
  * REAL: `javax.imageio` ships in every JDK, so [[decodeFeatures]]
  * runs actual PNG/JPEG decode + bilinear resize on the executors
  * (MultimodalSpec proves it on generated PNG fixtures). Audio/video
  * codecs don't exist in this container, so those kinds (and the
  * SQL-mirrorable oracle query) use the deterministic `fakeDecode`
  * stub — a function of the byte content, stable across engines.
  *
  * In PySpark this is `mapInPandas` over arrow batches; the Scala
  * equivalent used here is `mapPartitions` over an iterator of rows —
  * same execution shape (per-partition batch worker, no driver
  * involvement).
  */
object Multimodal {

  /** Typed metadata carried with every blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),       // image | audio | video
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),      // images/video
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),   // audio/video
    StructField("content", BinaryType, nullable = false)))

  /** Deterministic synthetic media table derived from the documents
    * corpus — the binary payload is the document text bytes, so every
    * row is reproducible with no RNG. */
  def mediaFromDocuments(s: SparkSession, d: String): DataFrame =
    graft.Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      (when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4")).as("mime"),
      when(col("doc_id") % 3 =!= 1, (col("doc_id") % 640 + 16).cast("int")).as("width"),
      when(col("doc_id") % 3 =!= 1, (col("doc_id") % 480 + 16).cast("int")).as("height"),
      when(col("doc_id") % 3 =!= 0, col("n_chars") * 10L).as("duration_ms"),
      encode(col("text"), "UTF-8").as("content"))

  /** STUB decoder: a real implementation calls the codec here
    * (e.g. javax.imageio / ffmpeg bindings). The fake is a
    * deterministic function of the bytes: "gray level" = mean byte
    * value, "frames" = length/1024-sized chunks. */
  private[graft] def fakeDecode(content: Array[Byte]): (Double, Int) = {
    if (content.isEmpty) (0.0, 0)
    else {
      var sum = 0L
      content.foreach(b => sum += (b & 0xff))
      (sum.toDouble / content.length, (content.length + 1023) / 1024)
    }
  }

  private val featSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mean_level", DoubleType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Feature extraction over a media frame: per-partition batch loop,
    * the decode stub in the place a codec would run. The operation is
    * embarrassingly parallel — no shuffle — and the binary column
    * never moves to the driver. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val contentIdx = media.schema.fieldIndex("content")
    val rdd = media.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { ir =>
        val content = ir.getBinary(contentIdx)
        val (level, frames) = fakeDecode(content)
        Row(ir.getLong(idIdx), ir.getUTF8String(kindIdx).toString,
          content.length.toLong, level, frames)
      }
    }
    spark.createDataFrame(rdd, featSchema)
  }

  // ---------- real image codec (javax.imageio — ships in the JDK) ----------

  /** Real PNG/JPEG decode. Returns None for bytes no installed reader
    * understands (the caller falls back to the stub), so the pipeline
    * is total over arbitrary blobs. */
  private[graft] def decodeImage(
      content: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
    catch { case _: java.io.IOException => None }

  /** Mean luminance (ITU-R BT.601 weights), 0..255. */
  private[graft] def meanLuminance(img: java.awt.image.BufferedImage): Double = {
    var sum = 0.0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) +
               0.587 * ((rgb >> 8) & 0xff) +
               0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sum / (img.getWidth.toDouble * img.getHeight)
  }

  /** Bilinear resize re-encoded as PNG bytes. */
  private[graft] def resizePng(
      img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Byte] = {
    import java.awt.RenderingHints
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  private val decodeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("codec", StringType, nullable = false), // imageio | stub
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("mean_level", DoubleType, nullable = false),
    StructField("thumb_w", IntegerType, nullable = true),
    StructField("thumb_h", IntegerType, nullable = true),
    StructField("thumb_bytes", LongType, nullable = true)))

  /** Distributed decode with the REAL codec for image rows: PNG/JPEG
    * through `javax.imageio` ON THE EXECUTORS (per-partition batch
    * loop; the binary column never moves to the driver), including a
    * bilinear thumbnail re-encode whose size surfaces in the output.
    * Audio/video kinds and undecodable image bytes fall back to the
    * deterministic stub — video frame extraction genuinely needs
    * codecs this container lacks, and the fallback keeps the operator
    * total. The oracle-gated [[multimodalFeatures]] stays on the stub
    * (a real codec is not mirrorable in SQL); MultimodalSpec feeds
    * this path real PNG fixtures end-to-end. */
  def decodeFeatures(media: DataFrame, thumbW: Int = 32, thumbH: Int = 32): DataFrame = {
    val spark = media.sparkSession
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val contentIdx = media.schema.fieldIndex("content")
    val rdd = media.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { ir =>
        val content = ir.getBinary(contentIdx)
        val kind = ir.getUTF8String(kindIdx).toString
        val img = if (kind == "image") decodeImage(content) else None
        img match {
          case Some(i) =>
            val thumb = resizePng(i, thumbW, thumbH)
            Row(ir.getLong(idIdx), kind, "imageio",
              i.getWidth, i.getHeight, i.getColorModel.getNumComponents,
              meanLuminance(i), thumbW, thumbH, thumb.length.toLong)
          case None =>
            val (level, _) = fakeDecode(content)
            Row(ir.getLong(idIdx), kind, "stub",
              null, null, null, level, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, decodeSchema)
  }

  /** Frame sampling for video/image rows: explode each blob into
    * every-Nth "frame" (1 KiB chunk in the stub; a real impl yields
    * decoded frames). Output stays distributed and bounded:
    * at most `maxFrames` per media row. */
  def sampleFrames(media: DataFrame, everyNth: Int = 2, maxFrames: Int = 8): DataFrame =
    media
      .filter(col("kind") =!= "audio")
      .select(col("media_id"),
        posexplode(expr(
          s"slice(transform(sequence(0, CAST((length(content)-1)/1024 AS INT)), " +
          s"i -> substring(content, i*1024 + 1, 1024)), 1, ${everyNth * maxFrames})")))
      .filter(col("pos") % everyNth === 0)
      .select(col("media_id"), (col("pos") / everyNth).cast("int").as("frame_no"),
        length(col("col")).cast("long").as("frame_bytes"))

  /** Driver-facing query: full media pipeline — synthesize the media
    * frame, extract features per blob, attach sampled-frame counts.
    * Oracle-matched: the deterministic decode stub (mean byte level +
    * 1 KiB chunking) is mirrorable in SQL because the synthetic
    * payloads are ASCII; a real codec would be rows-only again.
    * MultimodalSpec asserts the semantics independently. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    val media = mediaFromDocuments(s, d)
    val frames = sampleFrames(media)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_sampled_frames"),
           sum(col("frame_bytes")).as("sampled_bytes"))
    extractFeatures(media)
      .join(frames, Seq("media_id"), "left")
      .select(col("media_id"), col("kind"), col("n_bytes"), col("mean_level"),
        col("n_frames").cast("long").as("n_frames"),
        coalesce(col("n_sampled_frames"), lit(0L)).as("n_sampled_frames"),
        coalesce(col("sampled_bytes"), lit(0L)).as("sampled_bytes"))
      .orderBy("media_id")
  }

  val multimodalFeaturesSql: String =
    """WITH base AS (SELECT doc_id AS media_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image'
                   WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
              text, CAST(length(text) AS BIGINT) AS n_bytes
       FROM documents),
       lv AS (SELECT media_id,
                     CAST(SUM(ascii(substring(text, i, 1))) AS DOUBLE) / n_bytes AS mean_level
              FROM base, UNNEST(range(1, CAST(n_bytes AS INT) + 1)) AS t(i)
              GROUP BY media_id, n_bytes),
       fr AS (SELECT media_id, kind, n_bytes,
                     CAST((n_bytes + 1023) // 1024 AS BIGINT) AS n_frames,
                     LEAST((n_bytes + 1023) // 1024, 16) AS capped
              FROM base),
       samp AS (SELECT f.media_id, COUNT(*) AS n_sampled,
                       CAST(SUM(LEAST(1024, f.n_bytes - t.i * 1024)) AS BIGINT) AS s_bytes
                FROM fr f, UNNEST(range(0, CAST(f.capped AS INT))) AS t(i)
                WHERE t.i % 2 = 0 AND f.kind != 'audio'
                GROUP BY f.media_id)
       SELECT b.media_id, b.kind, b.n_bytes, lv.mean_level, f.n_frames,
              COALESCE(s.n_sampled, 0) AS n_sampled_frames,
              COALESCE(s.s_bytes, 0) AS sampled_bytes
       FROM base b
       JOIN lv USING (media_id)
       JOIN fr f USING (media_id)
       LEFT JOIN samp s ON b.media_id = s.media_id
       ORDER BY b.media_id"""

  /** "Resize" metadata update (stub: recompute width/height metadata,
    * pass content through — a real impl transforms the bytes). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", when(col("kind") =!= "audio", lit(w)).cast("int"))
      .withColumn("height", when(col("kind") =!= "audio", lit(h)).cast("int"))
}
