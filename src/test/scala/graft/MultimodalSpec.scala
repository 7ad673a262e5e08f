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
}
