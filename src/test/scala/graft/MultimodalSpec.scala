package graft

import graft.pipeline.Multimodal

/** L12 — multimodal binary-column plumbing: schema, distributed
  * feature extraction (decode stubbed deterministically), frame
  * sampling, resize metadata. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromDocuments(spark, sfDir).cache()

  test("media table has typed metadata + binary content") {
    val schema = media.schema
    assert(schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "mime", "width", "height", "duration_ms", "content"))
    assert(schema("content").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    // audio rows carry duration, image rows carry dimensions
    assert(media.filter("kind = 'audio' AND duration_ms IS NULL").count() == 0)
    assert(media.filter("kind = 'image' AND width IS NULL").count() == 0)
  }

  test("extractFeatures runs per-partition and matches the stub decode") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "mean_level", "n_frames"))
    assert(feats.count() == media.count())
    // cross-check one row against a local decode of the same bytes
    val row = media.orderBy("media_id").select("media_id", "content").first()
    val (level, frames) = Multimodal.fakeDecode(row.getAs[Array[Byte]]("content"))
    val got = feats.filter(s"media_id = ${row.getLong(0)}").first()
    assert(got.getAs[Double]("mean_level") == level)
    assert(got.getAs[Int]("n_frames") == frames)
    // distributed: respects input partitioning, no single-partition collapse
    assert(feats.rdd.getNumPartitions == media.rdd.getNumPartitions)
  }

  test("sampleFrames explodes bounded every-Nth frames, skips audio") {
    val frames = Multimodal.sampleFrames(media, everyNth = 2, maxFrames = 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_bytes"))
    val perMedia = frames.groupBy("media_id").count()
    assert(perMedia.filter("count > 4").count() == 0) // bounded
    val audioIds = media.filter("kind = 'audio'").select("media_id")
    assert(frames.join(audioIds, "media_id").count() == 0)
    assert(frames.filter("frame_bytes < 1 OR frame_bytes > 1024").count() == 0)
  }

  test("resize updates dimensions for visual media only") {
    val resized = Multimodal.resize(media, 224, 224)
    assert(resized.filter("kind != 'audio' AND (width != 224 OR height != 224)").count() == 0)
    assert(resized.filter("kind = 'audio' AND width IS NOT NULL").count() == 0)
  }

  test("real PNG decode end-to-end on executors (javax.imageio), stub fallback for the rest") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val rows = java.util.Arrays.asList(
      Row(1L, "image", png(40, 20, 0xFF0000)),          // pure red
      Row(2L, "image", png(8, 8, 0x000000)),            // pure black
      Row(3L, "audio", "not an image".getBytes("UTF-8")), // wrong kind -> stub
      Row(4L, "image", "garbage bytes".getBytes("UTF-8"))) // undecodable -> stub
    val media = spark.createDataFrame(rows, schema).repartition(3)
    val out = Multimodal.decodeFeatures(media, thumbW = 16, thumbH = 16)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 4)

    val red = out(1L)
    assert(red.getString(2) == "imageio")
    assert(red.getInt(3) == 40 && red.getInt(4) == 20, "decoded dimensions")
    assert(red.getInt(5) == 3, "RGB channel count")
    // BT.601 luminance of pure red = 0.299 * 255 = 76.245
    assert(math.abs(red.getDouble(6) - 76.245) < 1.0, s"red luminance: ${red.getDouble(6)}")
    assert(red.getInt(7) == 16 && red.getInt(8) == 16 && red.getLong(9) > 0L)

    val black = out(2L)
    assert(black.getString(2) == "imageio" && black.getDouble(6) == 0.0)

    // non-image kinds and undecodable bytes degrade to the stub, never throw
    assert(out(3L).getString(2) == "stub" && out(3L).isNullAt(3))
    assert(out(4L).getString(2) == "stub", "garbage image bytes fall back")

    // the resize path round-trips through the codec: thumbnail bytes
    // decode back to the requested geometry
    val img = Multimodal.decodeImage(png(64, 48, 0x00FF00)).get
    val thumb = Multimodal.decodeImage(Multimodal.resizePng(img, 16, 12)).get
    assert(thumb.getWidth == 16 && thumb.getHeight == 12)
  }
}
