package graft

import org.apache.spark.sql.functions._

import graft.ann.Knn
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthesis is deterministic and schema-correct") {
    val a = Multimodal.synthesize(spark, 10, "image").collect()
    val b = Multimodal.synthesize(spark, 10, "image").collect()
    assert(a.map(_.media.toSeq).toSeq == b.map(_.media.toSeq).toSeq)
    assert(a.forall(_.media.length == 2048))
    assert(a.forall(_.meta("codec") == "fake"))
  }

  test("image decode: batch-shaped, bounded dims, deterministic") {
    val media = Multimodal.synthesize(spark, 50, "image")
    val info = Multimodal.decodeImages(media).collect()
    assert(info.length == 50)
    info.foreach { i =>
      assert(i.width >= 16 && i.width < 256 && i.height >= 16 && i.height < 256)
      assert(i.channels == 3)
      assert(i.brightness >= 0.0 && i.brightness <= 1.0)
    }
  }

  test("resize rewrites payload and meta, preserves count") {
    val media = Multimodal.synthesize(spark, 20, "image")
    val resized = Multimodal.resizeImages(media, 512).collect()
    assert(resized.forall(_.media.length == 512))
    assert(resized.forall(_.meta("resized") == "512"))
  }

  test("video frame sampling explodes every nth fixed frame") {
    val media = Multimodal.synthesize(spark, 5, "video", bytesPerItem = 2560)
    val frames = Multimodal.sampleFrames(media, everyNth = 2)
    // 2560/256 = 10 frames, every 2nd → 5 per video
    assert(frames.count() == 25)
    val idxs = frames.filter(col("media_id") === 0)
      .select("frame_idx").as[Int].collect().sorted.toSeq
    assert(idxs == Seq(0, 2, 4, 6, 8))
  }

  test("audio features feed the standard ANN operator") {
    val media = Multimodal.synthesize(spark, 30, "audio")
    val feats = Multimodal.audioFeatures(media, windows = 16)
    assert(feats.select(size(col("features"))).as[Int].collect().forall(_ == 16))
    val q = feats.filter(col("media_id") === 0)
    val hits = Knn.bruteForceTopK(feats, "media_id", "features",
      q, "media_id", "features", 5)
    assert(hits.count() == 5)
    assert(hits.select("qid").distinct().as[Long].head() == 0L)
  }
}
