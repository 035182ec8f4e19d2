package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.sources.Tables

/** Contract tests for the multimodal plumbing (decode is a stub; schema,
  * shapes, determinism, and partition behavior are the real surface). */
class MultimodalSpec extends GraftSuite {

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.documents(spark, sf))

  test("media table has the canonical schema") {
    val fields = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("media_id") === "long")
    assert(fields("kind") === "string")
    assert(fields("payload") === "binary")
    assert(fields("meta") === "struct")
  }

  test("feature extraction is fixed-shape and deterministic") {
    val f1 = Multimodal.extractFeatures(media)
    assert(f1.select(size(col("feature"))).distinct().count() === 1)
    // deterministic: two runs produce identical features
    val a = f1.select("media_id", "feature").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Multimodal.extractFeatures(media)
      .select("media_id", "feature").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a === b)
  }

  test("feature extraction preserves row count across repartitioning") {
    val n = media.count()
    assert(Multimodal.extractFeatures(media.repartition(7)).count() === n)
    assert(Multimodal.extractFeatures(media.repartition(1)).count() === n)
  }

  test("resize updates image metadata and bounds payload") {
    val resized = Multimodal.resizeImages(media, 8, 8)
    val img = resized.filter(col("kind") === "image")
    assert(img.filter(col("meta.width") =!= 8).count() === 0)
    assert(img.filter(length(col("payload")) > 64).count() === 0)
    // non-images untouched
    val audio = resized.filter(col("kind") === "audio")
    assert(audio.filter(col("meta.width") === 8).count() === 0)
  }

  test("frame sampling explodes one row per frame, capped") {
    val frames = Multimodal.sampleFrames(media, maxFrames = 4)
    val perVideo = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
    assert(perVideo.filter(col("n") > 4).count() === 0)
    assert(frames.count() > 0)
  }
}
