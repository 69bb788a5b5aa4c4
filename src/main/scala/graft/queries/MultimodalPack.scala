package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.tables.Tables

/** Multimodal-pipeline pack: the binary-column plumbing (decode →
  * features → frame sampling, all `mapPartitions` over
  * `Dataset[MediaRecord]`) exercised end-to-end with a DuckDB oracle.
  *
  * The codecs are the honest deterministic stubs (`FakeCodec`) — pure
  * functions of the payload bytes — so with an ASCII payload (the
  * documents text, where UTF-8 bytes == codepoints) every stage is
  * byte-for-byte mirrorable in SQL: header-byte dims via `unicode()`,
  * brightness/energy as codepoint means, frame sampling as
  * generate_series over ceil(len/256). What the oracle proves is the
  * PLUMBING: binary column handling, batch iteration, the explode
  * shape, and the integer windowing math a real codec swap inherits.
  */
object MultimodalPack {

  private def media(s: SparkSession, d: String): Dataset[Multimodal.MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // The oracle mirrors FakeCodec byte arithmetic with codepoint
        // arithmetic (unicode()), which is only equivalent for ASCII.
        // Fail loudly here if the corpus ever grows non-ASCII text,
        // rather than as a hash mismatch far from the cause.
        require(text.forall(_ < 128),
          s"mm1 fixture requires ASCII text; doc $id has non-ASCII chars")
        Multimodal.MediaRecord(id, "image", s"synthetic://doc/$id",
          text.getBytes("UTF-8"), Map.empty)
      }
  }

  /** DuckDB sum of codepoints of a string expression. */
  private def cpSum(e: String): String =
    s"list_aggregate(list_transform(string_split($e, ''), c -> unicode(c)), 'sum')"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_pipeline" -> ((s, d) => {
      val m = media(s, d)
      val info = Multimodal.decodeImages(m).toDF()
      val energy = Multimodal.audioFeatures(m, windows = 4)
        .select(col("media_id"),
          element_at(col("features"), 1).as("e0"),
          element_at(col("features"), 2).as("e1"),
          element_at(col("features"), 3).as("e2"),
          element_at(col("features"), 4).as("e3"))
      val frames = Multimodal.sampleFrames(m, everyNth = 2)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame")).cast("long")).as("frame_bytes"))
      info
        .join(energy, Seq("media_id"))
        .join(frames, Seq("media_id"))
        .select(col("media_id"), col("width"), col("height"),
          col("channels"), col("brightness"), col("n_frames"),
          col("frame_bytes"), col("e0"), col("e1"), col("e2"), col("e3"))
        .orderBy(col("media_id"))
    }),

    // mm3: perceptual dHash near-dup detection — REAL arithmetic end
    // to end (nearest-neighbor resize + gradient bits + pigeonhole
    // banding + exact Hamming): every planted perturbed twin (one
    // interior char changed) is recovered, plus organic near-dups.
    "mm3_dhash_neardups" -> ((s, d) => {
      import s.implicits._
      val pert = Tables.documents(s, d)
        .filter(col("doc_id") % 9 === 0 && length(col("text")) >= 16)
        .select((col("doc_id") + 10000).as("id"),
          concat(substring(col("text"), 1, 4), lit("z"),
            expr("substring(text, 6)")).as("text"))
        .as[(Long, String)]
        .map { case (id, t) =>
          require(t.forall(_ < 128), s"mm3 fixture requires ASCII")
          Multimodal.MediaRecord(id, "image", s"synthetic://p/$id",
            t.getBytes("UTF-8"), Map.empty)
        }
      val m = media(s, d).union(pert)
      Multimodal.dhashNearDups(Multimodal.dhash(m))
        .orderBy(col("a"), col("b"))
    }),

    // mm4: cross-video frame-level near-dup detection (scene dedup):
    // every-2nd-frame sampling → per-frame dHash (REAL gradient-bit
    // arithmetic, as mm3) → pigeonhole-banded pairing restricted to
    // pairs from DIFFERENT videos. Perturbed clip copies guarantee both
    // kinds of recovery: their frame 0 is a near-twin (one char
    // changed), frames 1+ are byte-identical (hamming 0).
    "mm4_frame_dedup" -> ((s, d) => {
      import s.implicits._
      val pert = Tables.documents(s, d)
        .filter(col("doc_id") % 9 === 0 && length(col("text")) >= 16)
        .select((col("doc_id") + 20000).as("id"),
          concat(substring(col("text"), 1, 4), lit("z"),
            expr("substring(text, 6)")).as("text"))
        .as[(Long, String)]
        .map { case (id, t) =>
          require(t.forall(_ < 128), s"mm4 fixture requires ASCII")
          Multimodal.MediaRecord(id, "video", s"synthetic://v/$id",
            t.getBytes("UTF-8"), Map.empty)
        }
      val vids = media(s, d).union(pert)
      val frames = Multimodal.sampleFrames(vids, everyNth = 2)
        .as[(Long, Int, Array[Byte])]
        .map { case (vid, i, f) =>
          Multimodal.MediaRecord(vid * 100 + i, "frame",
            s"synthetic://f/$vid/$i", f, Map.empty)
        }
      Multimodal.dhashNearDups(Multimodal.dhash(frames))
        .filter(expr("a div 100") =!= expr("b div 100"))
        .select(expr("cast(a div 100 as bigint)").as("video_a"),
          (col("a") % 100).cast("int").as("frame_a"),
          expr("cast(b div 100 as bigint)").as("video_b"),
          (col("b") % 100).cast("int").as("frame_b"),
          col("hamming"))
        .orderBy(col("video_a"), col("frame_a"), col("video_b"),
          col("frame_b"))
    }),

    // mm5: audio near-dup detection — the chromaprint-style
    // energy-gradient fingerprint (audio analog of mm3's dHash: 57
    // integer-sum energy windows, bit w iff e(w) < e(w+1)) through the
    // SAME modality-agnostic banding. Every planted one-char perturbed
    // twin recovers.
    "mm5_audio_neardups" -> ((s, d) => {
      import s.implicits._
      val pert = Tables.documents(s, d)
        .filter(col("doc_id") % 11 === 0 && length(col("text")) >= 16)
        .select((col("doc_id") + 30000).as("id"),
          concat(substring(col("text"), 1, 7), lit("q"),
            expr("substring(text, 9)")).as("text"))
        .as[(Long, String)]
        .map { case (id, t) =>
          require(t.forall(_ < 128), s"mm5 fixture requires ASCII")
          Multimodal.MediaRecord(id, "audio", s"synthetic://a/$id",
            t.getBytes("UTF-8"), Map.empty)
        }
      val auds = media(s, d).union(pert)
      Multimodal.dhashNearDups(Multimodal.audioFingerprint(auds))
        .orderBy(col("a"), col("b"))
    }),

    // mm2: REAL nearest-neighbor thumbnail resize (integer-stride
    // sampling over the header-derived byte grid) — the resize stage of
    // the brief, with the sampling arithmetic mirrored index-for-index
    // in SQL. Small/degenerate media drop out, as a real decoder would
    // drop undecodable inputs.
    "mm2_thumbnail" -> ((s, d) => {
      Multimodal.resizeFeatures(media(s, d), 4, 4)
        .orderBy(col("media_id"))
    }))

  def oracles: Map[String, String] = {
    // FakeCodec.audioEnergy window w over n bytes: size = max(1, n/4),
    // slice [w*size, min((w+1)*size, n)) — empty slice scores 0.0
    def energySql(w: Int): String =
      s"""CAST(CASE WHEN LEAST(($w + 1) * sz, n) - $w * sz <= 0
         |    THEN 0.0::DOUBLE
         |    ELSE CAST(${cpSum(s"substr(text, $w * sz + 1, LEAST(($w + 1) * sz, n) - $w * sz)")}
         |        AS DOUBLE)
         |      / (LEAST(($w + 1) * sz, n) - $w * sz) / 255.0::DOUBLE
         |    END AS FLOAT) AS e$w""".stripMargin
    Map(
      "mm1_media_pipeline" ->
        s"""WITH d0 AS (SELECT doc_id AS media_id, text,
           |    CAST(length(text) AS INTEGER) AS n FROM documents),
           |img AS (SELECT media_id,
           |    16 + (unicode(substr(text, 1, 1)) % 240) AS width,
           |    16 + (unicode(substr(text, 2, 1)) % 240) AS height,
           |    3 AS channels,
           |    CAST(${cpSum("text")} AS DOUBLE) / n / 255.0::DOUBLE
           |      AS brightness
           |  FROM d0),
           |en AS (SELECT media_id,
           |    ${energySql(0)}, ${energySql(1)}, ${energySql(2)},
           |    ${energySql(3)}
           |  FROM (SELECT media_id, text, n, GREATEST(1, n // 4) AS sz
           |    FROM d0)),
           |f AS (SELECT media_id, i,
           |    LEAST(256, n - i * 256) AS flen
           |  FROM d0, unnest(generate_series(0,
           |    CAST(ceil(n / 256.0) AS INTEGER) - 1)) AS t(i)
           |  WHERE i % 2 = 0),
           |fr AS (SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
           |    CAST(SUM(flen) AS BIGINT) AS frame_bytes
           |  FROM f GROUP BY media_id)
           |SELECT media_id, width, height, channels, brightness,
           |  n_frames, frame_bytes, e0, e1, e2, e3
           |FROM img JOIN en USING (media_id) JOIN fr USING (media_id)
           |ORDER BY media_id""".stripMargin,

      "mm3_dhash_neardups" ->
        """WITH base AS (
          |  SELECT doc_id AS media_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 10000, substr(text, 1, 4) || 'z' || substr(text, 6)
          |  FROM documents WHERE doc_id % 9 = 0 AND length(text) >= 16),
          |g AS (SELECT media_id, text, CAST(length(text) AS INTEGER) AS n,
          |    8 + (unicode(substr(text, 1, 1)) % 8) AS w
          |  FROM base),
          |g2 AS (SELECT media_id, text, w, n // w AS h FROM g
          |  WHERE n // w >= 1),
          |bits AS (SELECT media_id,
          |    CAST(sum(CASE WHEN
          |      unicode(substr(text,
          |        ((k // 8) * h // 7) * w + ((k % 8) * w // 9) + 1, 1))
          |      < unicode(substr(text,
          |        ((k // 8) * h // 7) * w + (((k % 8) + 1) * w // 9) + 1, 1))
          |      THEN CAST(1 AS BIGINT) << k ELSE 0 END) AS BIGINT) AS dh
          |  FROM g2, unnest(range(0, 56)) AS t(k)
          |  GROUP BY media_id),
          |segs AS (SELECT media_id, s,
          |    (dh // (CAST(1 AS BIGINT) << (CAST(s AS INTEGER) * 14)))
          |      % 16384 AS sv, dh
          |  FROM bits, unnest(range(0, 4)) AS t(s)),
          |cand AS (SELECT DISTINCT x.media_id AS a, y.media_id AS b,
          |    x.dh AS da, y.dh AS db
          |  FROM segs x JOIN segs y
          |    ON x.s = y.s AND x.sv = y.sv AND x.media_id < y.media_id)
          |SELECT a, b, CAST(bit_count(xor(da, db)) AS INTEGER) AS hamming
          |FROM cand WHERE bit_count(xor(da, db)) <= 3
          |ORDER BY a, b""".stripMargin,

      "mm4_frame_dedup" ->
        """WITH basev AS (
          |  SELECT doc_id AS media_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 20000, substr(text, 1, 4) || 'z' || substr(text, 6)
          |  FROM documents WHERE doc_id % 9 = 0 AND length(text) >= 16),
          |b2 AS (SELECT media_id, text, CAST(length(text) AS INTEGER) AS n
          |  FROM basev),
          |fr AS (SELECT media_id * 100 + i AS fid,
          |    substr(text, CAST(i * 256 + 1 AS INTEGER), 256) AS ftext
          |  FROM b2, unnest(generate_series(0,
          |    CAST(ceil(n / 256.0) AS INTEGER) - 1)) AS t(i)
          |  WHERE i % 2 = 0),
          |g AS (SELECT fid, ftext, CAST(length(ftext) AS INTEGER) AS fn,
          |    8 + (unicode(substr(ftext, 1, 1)) % 8) AS w
          |  FROM fr),
          |g2 AS (SELECT fid, ftext, w, fn // w AS h FROM g
          |  WHERE fn // w >= 1),
          |bits AS (SELECT fid,
          |    CAST(sum(CASE WHEN
          |      unicode(substr(ftext,
          |        ((k // 8) * h // 7) * w + ((k % 8) * w // 9) + 1, 1))
          |      < unicode(substr(ftext,
          |        ((k // 8) * h // 7) * w + (((k % 8) + 1) * w // 9) + 1, 1))
          |      THEN CAST(1 AS BIGINT) << k ELSE 0 END) AS BIGINT) AS dh
          |  FROM g2, unnest(range(0, 56)) AS t(k)
          |  GROUP BY fid),
          |segs AS (SELECT fid, s,
          |    (dh // (CAST(1 AS BIGINT) << (CAST(s AS INTEGER) * 14)))
          |      % 16384 AS sv, dh
          |  FROM bits, unnest(range(0, 4)) AS t(s)),
          |cand AS (SELECT DISTINCT x.fid AS a, y.fid AS b,
          |    x.dh AS da, y.dh AS db
          |  FROM segs x JOIN segs y
          |    ON x.s = y.s AND x.sv = y.sv AND x.fid < y.fid),
          |p AS (SELECT a, b, CAST(bit_count(xor(da, db)) AS INTEGER)
          |      AS hamming
          |  FROM cand WHERE bit_count(xor(da, db)) <= 3
          |    AND a // 100 <> b // 100)
          |SELECT CAST(a // 100 AS BIGINT) AS video_a,
          |  CAST(a % 100 AS INTEGER) AS frame_a,
          |  CAST(b // 100 AS BIGINT) AS video_b,
          |  CAST(b % 100 AS INTEGER) AS frame_b, hamming
          |FROM p ORDER BY video_a, frame_a, video_b, frame_b""".stripMargin,

      "mm5_audio_neardups" ->
        s"""WITH basea AS (
           |  SELECT doc_id AS media_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 30000,
           |    substr(text, 1, 7) || 'q' || substr(text, 9)
           |  FROM documents WHERE doc_id % 11 = 0 AND length(text) >= 16),
           |d0 AS (SELECT media_id, text,
           |    CAST(length(text) AS INTEGER) AS n,
           |    GREATEST(1, CAST(length(text) AS INTEGER) // 57) AS sz
           |  FROM basea),
           |en AS (SELECT media_id, w,
           |    CASE WHEN LEAST((w + 1) * sz, n) - w * sz <= 0
           |      THEN 0.0::DOUBLE
           |      ELSE CAST(${cpSum(
                    "substr(text, CAST(w * sz + 1 AS INTEGER), " +
                      "LEAST((w + 1) * sz, n) - w * sz)")} AS DOUBLE)
           |        / (LEAST((w + 1) * sz, n) - w * sz) / 255.0::DOUBLE
           |      END AS e
           |  FROM d0, unnest(range(0, 57)) AS t(w)),
           |bits AS (SELECT media_id,
           |    CAST(sum(CASE WHEN e < nxt
           |      THEN CAST(1 AS BIGINT) << CAST(w AS INTEGER)
           |      ELSE 0 END) AS BIGINT) AS dh
           |  FROM (SELECT media_id, w, e,
           |      lead(e) OVER (PARTITION BY media_id ORDER BY w) AS nxt
           |    FROM en)
           |  WHERE w < 56 GROUP BY media_id),
           |segs AS (SELECT media_id, s,
           |    (dh // (CAST(1 AS BIGINT) << (CAST(s AS INTEGER) * 14)))
           |      % 16384 AS sv, dh
           |  FROM bits, unnest(range(0, 4)) AS t(s)),
           |cand AS (SELECT DISTINCT x.media_id AS a, y.media_id AS b,
           |    x.dh AS da, y.dh AS db
           |  FROM segs x JOIN segs y
           |    ON x.s = y.s AND x.sv = y.sv AND x.media_id < y.media_id)
           |SELECT a, b, CAST(bit_count(xor(da, db)) AS INTEGER) AS hamming
           |FROM cand WHERE bit_count(xor(da, db)) <= 3
           |ORDER BY a, b""".stripMargin,

      "mm2_thumbnail" ->
        s"""WITH d0 AS (SELECT doc_id AS media_id, text,
           |    CAST(length(text) AS INTEGER) AS n FROM documents),
           |g AS (SELECT media_id, text, n,
           |    8 + (unicode(substr(text, 1, 1)) % 8) AS w
           |  FROM d0),
           |g2 AS (SELECT media_id, text, w, n // w AS h FROM g
           |  WHERE w >= 4 AND n // w >= 4),
           |px AS (SELECT media_id, w, h,
           |    unicode(substr(text,
           |      (oy * h // 4) * w + (ox * w // 4) + 1, 1)) AS p
           |  FROM g2, unnest(range(0, 4)) AS t1(oy),
           |    unnest(range(0, 4)) AS t2(ox))
           |SELECT media_id, CAST(w AS INTEGER) AS grid_w,
           |  CAST(h AS INTEGER) AS grid_h,
           |  CAST(sum(p) AS BIGINT) AS thumb_checksum,
           |  round(CAST(sum(p) AS DOUBLE) / 16 / 255.0, 6) AS thumb_mean
           |FROM px GROUP BY media_id, w, h ORDER BY media_id""".stripMargin)
  }
}
