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

  test("resizeNearest: identity size returns the grid unchanged") {
    val grid = Array.tabulate(12)(i => i.toByte) // 4x3
    assert(Multimodal.resizeNearest(grid, 4, 3, 4, 3).toSeq == grid.toSeq)
  }

  test("resizeNearest: 4x4 -> 2x2 samples the integer-stride corners") {
    val grid = Array.tabulate(16)(i => i.toByte) // rows 0..3
    // src index = (oy*4/2)*4 + (ox*4/2): rows 0,2 cols 0,2
    assert(Multimodal.resizeNearest(grid, 4, 4, 2, 2).toSeq ==
      Seq[Byte](0, 2, 8, 10))
  }

  test("resizeNearest: upsample repeats nearest pixels") {
    val grid = Array[Byte](1, 2, 3, 4) // 2x2
    assert(Multimodal.resizeNearest(grid, 2, 2, 4, 4).toSeq ==
      Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }

  test("resizeFeatures drops media smaller than the target grid") {
    import spark.implicits._
    val tiny = Seq(
      Multimodal.MediaRecord(1L, "image", "u", "ab".getBytes, Map.empty),
      Multimodal.MediaRecord(2L, "image", "u",
        ("a" * 200).getBytes, Map.empty)).toDS()
    val out = Multimodal.resizeFeatures(tiny, 4, 4)
    assert(out.select("media_id").as[Long].collect().toSeq == Seq(2L))
    // doc 2: byte0 'a'=97 -> w = 8 + 97%8 = 9, h = 200/9 = 22; all
    // pixels 'a' -> checksum 16*97
    val r = out.head()
    assert(r.getInt(1) == 9 && r.getInt(2) == 22 &&
      r.getLong(3) == 16L * 97)
  }

  test("dHash: a one-byte interior perturbation stays within Hamming 3; " +
      "unrelated media are far") {
    import Multimodal.MediaRecord
    val base = Multimodal.synthesize(spark, 20, "image")
    val twin = base.filter(col("media_id") === 3L)
      .as[MediaRecord].map { m =>
        val b = m.media.clone(); b(100) = (b(100) ^ 0x5a).toByte
        m.copy(media_id = 1003L, media = b)
      }
    val all = base.as[MediaRecord].union(twin)
    val pairs = Multimodal.dhashNearDups(Multimodal.dhash(all))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // the planted twin is found with a small distance
    assert(pairs.exists { case (a, b, h) => a == 3L && b == 1003L && h <= 3 })
    // random media do not collide wholesale: pair count stays tiny
    assert(pairs.length < 5)
  }

  test("dHash banding finds exactly the pairs exact Hamming would") {
    import Multimodal.MediaRecord
    val media = Multimodal.synthesize(spark, 40, "image")
    val hashes = Multimodal.dhash(media)
    val banded = Multimodal.dhashNearDups(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1))
    val exact = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    // pigeonhole guarantee: banding can never MISS a within-distance pair
    assert(banded == exact)
  }

  test("audio fingerprint: one-byte perturbation flips at most 2 gradient bits") {
    val media = Multimodal.synthesize(spark, 20, "audio", bytesPerItem = 570)
    val pert = media.map { m =>
      val b = m.media.clone()
      b(100) = (b(100) ^ 0x7f).toByte
      m.copy(media_id = m.media_id + 1000, media = b)
    }
    val fps = Multimodal.audioFingerprint(media.union(pert))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach { id =>
      // one byte lands in one energy window -> only the two comparisons
      // touching that window can flip
      assert(java.lang.Long.bitCount(fps(id) ^ fps(id + 1000)) <= 2)
    }
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
