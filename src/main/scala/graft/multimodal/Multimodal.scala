package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Multimodal columns for the training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, processed in batch
  * shape via `mapPartitions` (the JVM analog of pandas-batched UDFs: one
  * iterator per partition, no per-row scheduling, codec state reused
  * across a partition).
  *
  * The actual codecs are STUBBED (`FakeCodec`) — this container has no
  * image/audio libraries — with deterministic fakes so every pipeline
  * stage is testable end-to-end. The Spark-side contracts are real:
  * schemas, partitioning, batch iteration, explode shapes, and the
  * feature→embedding→ANN handoff. Swapping FakeCodec for JavaCV/libpng
  * changes only the function bodies.
  *
  * Scale posture: media rows are large — repartition by media_id before
  * decode so a partition holds a bounded byte volume; features and
  * embeddings are small rows that flow into the standard dedup/ANN
  * operators (graft.dedup, graft.ann).
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      uri: String,
      media: Array[Byte],
      meta: Map[String, String])

  final case class ImageInfo(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      brightness: Double)

  /** STUB CODEC — deterministic fakes standing in for real decoders.
    * Every function is pure in the input bytes.
    */
  object FakeCodec {
    /** ??? real impl: javax.imageio / libpng. Fake: dims from header bytes. */
    def imageDims(bytes: Array[Byte]): (Int, Int, Int) = {
      val w = 16 + (math.abs(bytes.headOption.getOrElse(0.toByte).toInt) % 240)
      val h = 16 + (math.abs(bytes.lift(1).getOrElse(0.toByte).toInt) % 240)
      (w, h, 3)
    }

    /** ??? real impl: pixel decode + mean. Fake: mean of payload bytes. */
    def brightness(bytes: Array[Byte]): Double =
      if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length / 255.0

    /** ??? real impl: resample. Fake: deterministic truncate/repeat to
      * exactly `targetBytes`.
      */
    def resize(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
      if (bytes.isEmpty) new Array[Byte](targetBytes)
      else Array.tabulate(targetBytes)(i => bytes(i % bytes.length))

    /** ??? real impl: container demux. Fake: fixed-size byte frames. */
    val FrameBytes = 256
    def frames(bytes: Array[Byte]): Iterator[Array[Byte]] =
      bytes.grouped(FrameBytes)

    /** ??? real impl: PCM windowed RMS. Fake: per-window mean energy. */
    def audioEnergy(bytes: Array[Byte], windows: Int): Array[Double] = {
      if (bytes.isEmpty) return Array.fill(windows)(0.0)
      val size = math.max(1, bytes.length / windows)
      (0 until windows).map { w =>
        val slice = bytes.slice(w * size, math.min((w + 1) * size, bytes.length))
        if (slice.isEmpty) 0.0
        else slice.map(b => (b & 0xff).toDouble).sum / slice.length / 255.0
      }.toArray
    }
  }

  /** Deterministic synthetic media fixture (seeded from media_id). */
  def synthesize(spark: SparkSession, n: Int, kind: String,
      bytesPerItem: Int = 2048): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val rnd = new scala.util.Random(PortableHash.hash60Local(kind, id.toString))
      val bytes = new Array[Byte](bytesPerItem)
      rnd.nextBytes(bytes)
      MediaRecord(id, kind, s"synthetic://$kind/$id", bytes,
        Map("codec" -> "fake", "bytes" -> bytesPerItem.toString))
    }
  }

  /** Image decode + feature extraction, batch-shaped: one FakeCodec
    * "session" per partition (where a real codec would allocate buffers
    * once), iterator in / iterator out.
    */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs would initialize here, once per partition
      it.map { m =>
        val (w, h, c) = FakeCodec.imageDims(m.media)
        ImageInfo(m.media_id, w, h, c, FakeCodec.brightness(m.media))
      }
    }
  }

  /** Resize: binary→binary with meta update, partition-preserving. */
  def resizeImages(media: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        m.copy(
          media = FakeCodec.resize(m.media, targetBytes),
          meta = m.meta + ("resized" -> targetBytes.toString))
      }
    }
  }

  /** Video frame sampling: explode every nth frame →
    * (media_id, frame_idx, frame binary).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyNth: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      FakeCodec.frames(m.media).zipWithIndex.collect {
        case (f, i) if i % everyNth == 0 => (m.media_id, i, f)
      }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** REAL nearest-neighbor resize of a row-major single-channel grid —
    * NOT a stub: integer-stride sampling (`src = floor(dst·size/out)`)
    * is exactly the production grayscale nearest-neighbor kernel,
    * byte-exact and codec-free. Swapping in a real decoder changes how
    * the grid is obtained, not this arithmetic.
    */
  def resizeNearest(bytes: Array[Byte], w: Int, h: Int,
      ow: Int, oh: Int): Array[Byte] =
    Array.tabulate(oh * ow) { k =>
      val oy = k / ow
      val ox = k % ow
      bytes((oy.toLong * h / oh).toInt * w + (ox.toLong * w / ow).toInt)
    }

  /** Per-media thumbnail features: interpret the payload as a
    * header-derived w×h grid (w from byte 0, full rows only), resize to
    * ow×oh by nearest neighbor, emit the thumbnail checksum and mean
    * intensity. Media too small for the target grid are dropped —
    * the real-pipeline behavior for undecodable/degenerate inputs.
    */
  def resizeFeatures(media: Dataset[MediaRecord], ow: Int, oh: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val w = 8 + (math.abs(m.media.headOption.getOrElse(0.toByte).toInt) % 8)
        val h = m.media.length / w
        if (w < ow || h < oh) None
        else {
          val thumb = resizeNearest(m.media, w, h, ow, oh)
          val checksum = thumb.foldLeft(0L)((a, b) => a + (b & 0xff))
          Some((m.media_id, w, h, checksum,
            BigDecimal(checksum.toDouble / (ow * oh) / 255.0)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }
    }.toDF("media_id", "grid_w", "grid_h", "thumb_checksum", "thumb_mean")
  }

  /** 56-bit perceptual difference hash (dHash) over the header-derived
    * grid — REAL arithmetic end to end, like [[resizeNearest]]: resize
    * to (dw+1)×dh by integer-stride nearest neighbor, bit k set iff
    * pixel(y, x) < pixel(y, x+1) (the standard dHash gradient bits).
    * 56 bits (8×7) rather than the classic 64 keeps the fingerprint in
    * the non-negative long range, so segment extraction is pure
    * division (Spark `div` ≡ DuckDB `//` on non-negative operands) and
    * no engine's arithmetic right-shift sign-fill can diverge. Media
    * shorter than one grid row drop out (undecodable-input behavior).
    */
  def dhash(media: Dataset[MediaRecord], dw: Int = 8, dh: Int = 7): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val w = 8 + (math.abs(m.media.headOption.getOrElse(0.toByte).toInt) % 8)
        val h = m.media.length / w
        if (h < 1) None
        else {
          val g = resizeNearest(m.media, w, h, dw + 1, dh)
          var bits = 0L
          var k = 0
          while (k < dw * dh) {
            val y = k / dw
            val x = k % dw
            if ((g(y * (dw + 1) + x) & 0xff) < (g(y * (dw + 1) + x + 1) & 0xff))
              bits |= 1L << k
            k += 1
          }
          Some((m.media_id, bits))
        }
      }
    }.toDF("media_id", "dhash")
  }

  /** Near-duplicate media pairs within Hamming ≤ `maxDist` of their
    * dHashes, via pigeonhole banding (the simhash d5 trick at the
    * media granularity): split the fingerprint into maxDist+1 exact
    * segments — any pair within maxDist must agree on at least one —
    * equi-join on (segment, value), then exact `bit_count(xor)`
    * verification. Never all-pairs.
    */
  def dhashNearDups(hashes: DataFrame, maxDist: Int = 3,
      bits: Int = 56): DataFrame = {
    val nSeg = maxDist + 1
    val segBits = bits / nSeg
    val segs = hashes.select(col("media_id"), col("dhash"),
        explode(sequence(lit(0), lit(nSeg - 1))).as("s"))
      .withColumn("sv", expr(
        s"(dhash div shiftleft(cast(1 as bigint), s * $segBits)) " +
          s"% ${1L << segBits}"))
    val l = segs.select(col("s"), col("sv"), col("media_id").as("a"),
      col("dhash").as("da"))
    val r = segs.select(col("s"), col("sv"), col("media_id").as("b"),
      col("dhash").as("db"))
    l.join(r, Seq("s", "sv"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("da"), col("db"))
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(da ^ db) as int)"))
      .filter(col("hamming") <= maxDist)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Audio → fixed-width energy feature vector (as float array, ready
    * for the ANN/dedup operators).
    */
  def audioFeatures(media: Dataset[MediaRecord], windows: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(m => (m.media_id, FakeCodec.audioEnergy(m.media, windows).map(_.toFloat).toSeq))
    }.toDF("media_id", "features")
  }

  /** 56-bit audio fingerprint — the chromaprint-style energy-gradient
    * hash (the audio analog of [[dhash]], REAL arithmetic end to end):
    * 57 energy windows, bit w set iff energy(w) < energy(w+1). The
    * window energies are integer byte sums divided once per window, so
    * the comparisons are engine-portable; the 56-bit width keeps the
    * fingerprint non-negative for pure-division segment extraction.
    * Output (media_id, dhash) feeds [[dhashNearDups]] unchanged — the
    * banding machinery is modality-agnostic.
    */
  def audioFingerprint(media: Dataset[MediaRecord],
      bits: Int = 56): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val e = FakeCodec.audioEnergy(m.media, bits + 1)
        var fp = 0L
        var w = 0
        while (w < bits) {
          if (e(w) < e(w + 1)) fp |= 1L << w
          w += 1
        }
        (m.media_id, fp)
      }
    }.toDF("media_id", "dhash")
  }
}
