package graft.queries

import graft.Q
import org.apache.spark.sql.functions._

/** Multimodal decode under the driver's hash gate.
  *
  * Until round 11 the media path ([[graft.operators.Multimodal]] +
  * [[graft.functions.MediaCodec]]) was spec-only — the one north-star
  * pillar with no CORRECTNESS entry. q113 closes that: deterministic
  * BMP / PNG / WAV payloads are synthesized in-query from integer
  * formulas ([[graft.sources.MediaGen]]), run through the REAL decoders
  * (hand BMP parser, JDK ImageIO, PCM16 WAV parser) inside
  * `extractFeatures`' partition loop, and the decoded statistics are
  * emitted as micro-unit BIGINTs. The DuckDB oracle recomputes the same
  * statistics from the same closed-form pixel/sample formulas — it never
  * sees a byte of payload, so a hash match proves the decoders extract
  * exactly the raster/stream the generator encoded.
  *
  * Bit-exactness design (why a float feature can survive a hash gate):
  * gray pixels keep luma integer, so every accumulated sum is an exact
  * integer in double; the remaining ops (one division, one multiply, one
  * subtract, sqrt) are single IEEE ops on identical operands — bit-equal
  * in both engines; Float truncation is reproduced with DuckDB's
  * `CAST(.. AS REAL)` (both round-to-nearest-even); and the zcr float
  * division is exact because the denominator is 2^7.
  */
object MultimodalQueries {

  val defs: Vector[Q] = Vector(
    // q113: image/audio decode + feature extraction. 24 media rows
    // (8 BMP / 8 PNG / 8 WAV), size-aware repartition, per-partition
    // decode, posexplode to (media, feature_idx) grain. `dir` is unused
    // by design: the corpus is generated, the operator is the decoder.
    Q(
      "q113_multimodal_features",
      (s, dir) => {
        import s.implicits._
        val media = s.range(0, 24)
          .map { m =>
            (m.toLong, graft.sources.MediaGen.kind(m), graft.sources.MediaGen.payload(m))
          }
          .toDF("media_id", "kind", "payload")
        val balanced = graft.operators.Multimodal.repartitionBySize(media, 1L << 20)
        graft.operators.Multimodal.extractFeatures(s, balanced)
          .toDF()
          .select(col("media_id"), col("kind"), col("dim"), posexplode(col("features")))
          .select(
            col("media_id"), col("kind"), col("dim"),
            col("pos").cast("int").as("feature_idx"),
            round(col("col").cast("double") * lit(1000000L)).cast("long").as("value_micro"))
          .orderBy("media_id", "feature_idx")
      },
      Some("""
        WITH media AS (
          SELECT i AS media_id, i // 3 AS grp, i % 3 AS sel
          FROM generate_series(0, 23) t(i)
        ),
        imgs AS (
          SELECT media_id, 3 + grp % 6 AS w, 2 + grp % 5 AS h
          FROM media WHERE sel < 2
        ),
        pix AS (
          SELECT i.media_id, i.w, i.h,
                 (i.media_id * 7 + x.x * 131 + y.y * 197) % 256 AS v
          FROM imgs i
          JOIN generate_series(0, 7) x(x) ON x.x < i.w
          JOIN generate_series(0, 5) y(y) ON y.y < i.h
        ),
        istats AS (
          SELECT media_id, w, h,
                 CAST(SUM(v) AS DOUBLE) / (CAST(w AS DOUBLE) * h) AS mean_d,
                 CAST(SUM(v * v) AS DOUBLE) / (CAST(w AS DOUBLE) * h) AS msq_d
          FROM pix GROUP BY media_id, w, h
        ),
        ifeat AS (
          SELECT media_id, 'image' AS kind, 8 AS dim,
                 CAST(f.p AS INTEGER) AS feature_idx,
                 CAST(CASE f.p
                   WHEN 0 THEN CAST(w AS REAL)
                   WHEN 1 THEN CAST(h AS REAL)
                   WHEN 2 THEN CAST(CAST(w AS DOUBLE) / h AS REAL)
                   WHEN 7 THEN CAST(SQRT(GREATEST(0.0, msq_d - mean_d * mean_d)) AS REAL)
                   ELSE CAST(mean_d AS REAL)
                 END AS DOUBLE) AS feat
          FROM istats, generate_series(0, 7) f(p)
        ),
        auds AS (
          SELECT media_id, 8000 + (grp % 4) * 4000 AS sr
          FROM media WHERE sel = 2
        ),
        samp AS (
          SELECT a.media_id, a.sr, t.i,
                 ((a.media_id * 7919 + t.i * 12345) % 65536) - 32768 AS s
          FROM auds a, generate_series(0, 128) t(i)
        ),
        astats AS (
          SELECT media_id, MAX(sr) AS sr,
                 CAST(SUM(s * s) AS DOUBLE) AS sum2,
                 SUM(CASE WHEN i > 0 AND ((s >= 0) <> (prev >= 0))
                          THEN 1 ELSE 0 END) AS crossings
          FROM (SELECT media_id, sr, i, s,
                       LAG(s) OVER (PARTITION BY media_id ORDER BY i) AS prev
                FROM samp)
          GROUP BY media_id
        ),
        afeat AS (
          SELECT media_id, 'audio' AS kind, 4 AS dim,
                 CAST(f.p AS INTEGER) AS feature_idx,
                 CAST(CASE f.p
                   WHEN 0 THEN CAST(sr AS REAL)
                   WHEN 1 THEN CAST(CAST(129 AS DOUBLE) / sr AS REAL)
                   WHEN 2 THEN CAST(SQRT(sum2 / 129) / 32768.0 AS REAL)
                   ELSE CAST(CAST(crossings AS DOUBLE) / 128 AS REAL)
                 END AS DOUBLE) AS feat
          FROM astats, generate_series(0, 3) f(p)
        )
        SELECT media_id, kind, dim, feature_idx,
               CAST(ROUND(feat * 1000000) AS BIGINT) AS value_micro
        FROM (SELECT * FROM ifeat UNION ALL SELECT * FROM afeat)
        ORDER BY media_id, feature_idx
      """)),

    // ----------------------------------------------------------------
    // q116: VIDEO frame sampling + per-frame decode under the gate —
    // the remaining multimodal path (sampleFrameFeatures' stride loop).
    // 12 animated-GIF clips (3-5 frames, varying dims) are synthesized
    // through a 256-entry gray IndexColorModel, so every decoded frame
    // raster equals the closed-form gifPixel formula exactly; every
    // 2nd frame is decoded by ImageIO's multi-frame reader (ONE reader
    // init per payload) to the 8 image stats, emitted as micro-unit
    // BIGINTs. The oracle enumerates (clip, sampled frame, pixel) with
    // the same integer formula — decoded=true in every row is part of
    // the hash: a payload that silently fell back to the stub would
    // flip it.
    Q(
      "q116_video_frame_features",
      (s, dir) => {
        import s.implicits._
        val media = s.range(0, 12)
          .map { m =>
            (m.toLong, "video", graft.sources.MediaGen.gifVideo(m),
              graft.sources.MediaGen.gifFrames(m))
          }
          .toDF("media_id", "kind", "payload", "nf")
          .select(col("media_id"), col("kind"), col("payload"),
            struct(
              lit(null).cast("int").as("width"),
              lit(null).cast("int").as("height"),
              lit(null).cast("int").as("sample_rate"),
              col("nf").as("n_frames")).as("meta"))
        graft.operators.Multimodal.sampleFrameFeatures(s, media, stride = 2)
          .toDF()
          .select(col("media_id"), col("frame_idx"), col("decoded"),
            posexplode(col("features")))
          .select(col("media_id"), col("frame_idx"), col("decoded"),
            col("pos").cast("int").as("feature_idx"),
            round(col("col").cast("double") * lit(1000000L)).cast("long").as("value_micro"))
          .orderBy("media_id", "frame_idx", "feature_idx")
      },
      Some("""
        WITH media AS (
          SELECT i AS media_id, 8 + i % 5 AS w, 8 + i % 4 AS h,
                 3 + i % 3 AS nf
          FROM generate_series(0, 11) t(i)
        ),
        frames AS (
          SELECT media_id, w, h, f.f
          FROM media, generate_series(0, 9) f(f)
          WHERE f.f < nf AND f.f % 2 = 0
        ),
        pix AS (
          SELECT fr.media_id, fr.f, fr.w, fr.h,
                 (fr.media_id * 7 + fr.f * 53 + x.x * 131 + y.y * 197) % 256 AS v
          FROM frames fr
          JOIN generate_series(0, 12) x(x) ON x.x < fr.w
          JOIN generate_series(0, 11) y(y) ON y.y < fr.h
        ),
        fstats AS (
          SELECT media_id, f, w, h,
                 CAST(SUM(v) AS DOUBLE) / (CAST(w AS DOUBLE) * h) AS mean_d,
                 CAST(SUM(v * v) AS DOUBLE) / (CAST(w AS DOUBLE) * h) AS msq_d
          FROM pix GROUP BY media_id, f, w, h
        )
        SELECT media_id, CAST(f AS INTEGER) AS frame_idx, TRUE AS decoded,
               CAST(p.p AS INTEGER) AS feature_idx,
               CAST(ROUND(CAST(CASE p.p
                 WHEN 0 THEN CAST(w AS REAL)
                 WHEN 1 THEN CAST(h AS REAL)
                 WHEN 2 THEN CAST(CAST(w AS DOUBLE) / h AS REAL)
                 WHEN 7 THEN CAST(SQRT(GREATEST(0.0, msq_d - mean_d * mean_d)) AS REAL)
                 ELSE CAST(mean_d AS REAL)
               END AS DOUBLE) * 1000000) AS BIGINT) AS value_micro
        FROM fstats, generate_series(0, 7) p(p)
        ORDER BY media_id, frame_idx, feature_idx
      """)),

    // ----------------------------------------------------------------
    // q117: the SECOND video container — uncompressed-DIB AVI — through
    // the same sampleFrameFeatures partition loop. Unlike q116's GIF
    // (decoded by the JDK's reader), AVI/DIB frames are a pure byte
    // layout decoded by the engine's own RIFF walk — no codec anywhere
    // — so the closed-form oracle checks the CONTAINER PARSER itself:
    // chunk walking, word alignment, strf header fields, bottom-up
    // padded rows. 12 clips with dims chosen small (5..10 x 4..8) on
    // purpose — our parser has no small-raster bug to avoid, unlike
    // the JDK GIF codec q116 steps around.
    Q(
      "q117_avi_video_frame_features",
      (s, dir) => {
        import s.implicits._
        val media = s.range(0, 12)
          .map { m =>
            (m.toLong, "video", graft.sources.MediaGen.aviDib(m),
              graft.sources.MediaGen.aviFrames(m))
          }
          .toDF("media_id", "kind", "payload", "nf")
          .select(col("media_id"), col("kind"), col("payload"),
            struct(
              lit(null).cast("int").as("width"),
              lit(null).cast("int").as("height"),
              lit(null).cast("int").as("sample_rate"),
              col("nf").as("n_frames")).as("meta"))
        graft.operators.Multimodal.sampleFrameFeatures(s, media, stride = 2)
          .toDF()
          .select(col("media_id"), col("frame_idx"), col("decoded"),
            posexplode(col("features")))
          .select(col("media_id"), col("frame_idx"), col("decoded"),
            col("pos").cast("int").as("feature_idx"),
            round(col("col").cast("double") * lit(1000000L)).cast("long").as("value_micro"))
          .orderBy("media_id", "frame_idx", "feature_idx")
      },
      Some("""
        WITH media AS (
          SELECT i AS media_id, 5 + i % 6 AS w, 4 + i % 5 AS h,
                 3 + i % 3 AS nf
          FROM generate_series(0, 11) t(i)
        ),
        frames AS (
          SELECT media_id, w, h, f.f
          FROM media, generate_series(0, 9) f(f)
          WHERE f.f < nf AND f.f % 2 = 0
        ),
        pix AS (
          SELECT fr.media_id, fr.f, fr.w, fr.h,
                 (fr.media_id * 11 + fr.f * 59 + x.x * 137 + y.y * 199) % 256 AS v
          FROM frames fr
          JOIN generate_series(0, 10) x(x) ON x.x < fr.w
          JOIN generate_series(0, 8) y(y) ON y.y < fr.h
        ),
        fstats AS (
          SELECT media_id, f, w, h,
                 CAST(SUM(v) AS DOUBLE) / (CAST(w AS DOUBLE) * h) AS mean_d,
                 CAST(SUM(v * v) AS DOUBLE) / (CAST(w AS DOUBLE) * h) AS msq_d
          FROM pix GROUP BY media_id, f, w, h
        )
        SELECT media_id, CAST(f AS INTEGER) AS frame_idx, TRUE AS decoded,
               CAST(p.p AS INTEGER) AS feature_idx,
               CAST(ROUND(CAST(CASE p.p
                 WHEN 0 THEN CAST(w AS REAL)
                 WHEN 1 THEN CAST(h AS REAL)
                 WHEN 2 THEN CAST(CAST(w AS DOUBLE) / h AS REAL)
                 WHEN 7 THEN CAST(SQRT(GREATEST(0.0, msq_d - mean_d * mean_d)) AS REAL)
                 ELSE CAST(mean_d AS REAL)
               END AS DOUBLE) * 1000000) AS BIGINT) AS value_micro
        FROM fstats, generate_series(0, 7) p(p)
        ORDER BY media_id, frame_idx, feature_idx
      """)),

    // ----------------------------------------------------------------
    // q118: windowed AUDIO segmentation — the per-window rms / mean-abs
    // / zero-crossing shape a VAD / silence-trim / loudness-filter
    // stage consumes, over 8 PCM16 clips (the q113 audio family's
    // formula, ids 3i+2). crossings stays a COUNT on purpose: a
    // /(win-1) would be a float division with engine-dependent
    // promotion; the count is integer-exact in both engines.
    Q(
      "q118_audio_window_features",
      (s, dir) => {
        import s.implicits._
        val media = s.range(0, 8)
          .map { m =>
            (m.toLong, "audio", graft.sources.MediaGen.wav(3 * m + 2))
          }
          .toDF("media_id", "kind", "payload")
        graft.operators.Multimodal.audioWindowFeatures(s, media, win = 32)
          .toDF()
          .select(col("media_id"), col("window_idx"), posexplode(col("features")))
          .select(col("media_id"), col("window_idx"),
            col("pos").cast("int").as("feature_idx"),
            round(col("col").cast("double") * lit(1000000L)).cast("long").as("value_micro"))
          .orderBy("media_id", "window_idx", "feature_idx")
      },
      Some("""
        WITH media AS (
          SELECT i AS media_id, 3 * i + 2 AS mid
          FROM generate_series(0, 7) t(i)
        ),
        samp AS (
          SELECT m.media_id, t.i // 32 AS w, t.i % 32 AS j,
                 ((m.mid * 7919 + t.i * 12345) % 65536) - 32768 AS s
          FROM media m, generate_series(0, 127) t(i)
        ),
        wstats AS (
          SELECT media_id, w,
                 CAST(SUM(s * s) AS DOUBLE) AS sum2,
                 CAST(SUM(ABS(s)) AS DOUBLE) AS sumabs,
                 SUM(CASE WHEN j > 0 AND ((s >= 0) <> (prev >= 0))
                          THEN 1 ELSE 0 END) AS crossings
          FROM (SELECT media_id, w, j, s,
                       LAG(s) OVER (PARTITION BY media_id, w ORDER BY j) AS prev
                FROM samp)
          GROUP BY media_id, w
        )
        SELECT media_id, CAST(w AS INTEGER) AS window_idx,
               CAST(p.p AS INTEGER) AS feature_idx,
               CAST(ROUND(CAST(CASE p.p
                 WHEN 0 THEN CAST(32 AS REAL)
                 WHEN 1 THEN CAST(SQRT(sum2 / 32) / 32768.0 AS REAL)
                 WHEN 2 THEN CAST(sumabs / 32 / 32768.0 AS REAL)
                 ELSE CAST(crossings AS REAL)
               END AS DOUBLE) * 1000000) AS BIGINT) AS value_micro
        FROM wstats, generate_series(0, 3) p(p)
        ORDER BY media_id, window_idx, feature_idx
      """)),

    // ----------------------------------------------------------------
    // q119: PHYSICAL image resize under the gate — planResize's
    // aspect-preserving metadata targets drive a nearest-neighbor
    // resize (src = ((x*w)/tw, (y*h)/th), integer floor, storage-flip
    // handled in the decoder) whose TARGET-raster stats the oracle
    // recomputes from the closed-form pixel formula through the same
    // integer index math. 8 BMP clips (the q113 image family, ids 3i),
    // maxSide 4 — one clip (3x2) hits the scale=1 no-resize edge.
    Q(
      "q119_image_resize_features",
      (s, dir) => {
        import s.implicits._
        val media = s.range(0, 8)
          .map { m =>
            val id = 3 * m
            val (w, h) = graft.sources.MediaGen.dims(id)
            (m.toLong, "image", graft.sources.MediaGen.bmp(id), w, h)
          }
          .toDF("media_id", "kind", "payload", "w", "h")
          .select(col("media_id"), col("kind"), col("payload"),
            struct(col("w").as("width"), col("h").as("height"),
              lit(null).cast("int").as("sample_rate"),
              lit(null).cast("int").as("n_frames")).as("meta"))
        graft.operators.Multimodal.resizeFeatures(s, media, maxSide = 4)
          .toDF()
          .select(col("media_id"), posexplode(col("features")))
          .select(col("media_id"),
            col("pos").cast("int").as("feature_idx"),
            round(col("col").cast("double") * lit(1000000L)).cast("long").as("value_micro"))
          .orderBy("media_id", "feature_idx")
      },
      Some("""
        WITH media AS (
          SELECT i AS media_id, 3 * i AS mid,
                 3 + i % 6 AS w, 2 + i % 5 AS h
          FROM generate_series(0, 7) t(i)
        ),
        plan AS (
          SELECT media_id, mid, w, h,
                 CAST(FLOOR(CAST(w AS DOUBLE) *
                   LEAST(4 / GREATEST(CAST(w AS DOUBLE), CAST(h AS DOUBLE)), 1.0))
                   AS INTEGER) AS tw,
                 CAST(FLOOR(CAST(h AS DOUBLE) *
                   LEAST(4 / GREATEST(CAST(w AS DOUBLE), CAST(h AS DOUBLE)), 1.0))
                   AS INTEGER) AS th
          FROM media
        ),
        pix AS (
          SELECT p.media_id, p.tw, p.th,
                 (p.mid * 7 + ((x.x * p.w) // p.tw) * 131
                            + ((y.y * p.h) // p.th) * 197) % 256 AS v
          FROM plan p
          JOIN generate_series(0, 7) x(x) ON x.x < p.tw
          JOIN generate_series(0, 5) y(y) ON y.y < p.th
        ),
        rstats AS (
          SELECT media_id, tw, th,
                 CAST(SUM(v) AS DOUBLE) / (CAST(tw AS DOUBLE) * th) AS mean_d,
                 CAST(SUM(v * v) AS DOUBLE) / (CAST(tw AS DOUBLE) * th) AS msq_d
          FROM pix GROUP BY media_id, tw, th
        )
        SELECT media_id, CAST(p.p AS INTEGER) AS feature_idx,
               CAST(ROUND(CAST(CASE p.p
                 WHEN 0 THEN CAST(tw AS REAL)
                 WHEN 1 THEN CAST(th AS REAL)
                 WHEN 2 THEN CAST(CAST(tw AS DOUBLE) / th AS REAL)
                 WHEN 7 THEN CAST(SQRT(GREATEST(0.0, msq_d - mean_d * mean_d)) AS REAL)
                 ELSE CAST(mean_d AS REAL)
               END AS DOUBLE) * 1000000) AS BIGINT) AS value_micro
        FROM rstats, generate_series(0, 7) p(p)
        ORDER BY media_id, feature_idx
      """)),

    // ----------------------------------------------------------------
    // q120: IMAGE near-dup dedup via perceptual difference-hash — the
    // multimodal pillar composed with the dedup pillar: decode + 9x8
    // dHash in the partition loop, then pure DataFrame dedup algebra —
    // band-keyed self-join for candidates (the SimHash/MinHash banding
    // move, never all-pairs) and exact Hamming via bit_count over the
    // four 16-bit band XORs. 24 clips in 12 near-dup pairs (the odd
    // member's perturbation flips exactly the small-wrapped-diff
    // comparisons in band 3, so bands 0-2 still collide); the oracle
    // recomputes the whole hash from the closed-form pixel formula
    // through the same resize index math and emits the identical
    // verified pair set.
    Q(
      "q120_image_phash_neardup",
      (s, dir) => {
        import s.implicits._
        val media = s.range(0, 24)
          .map { m => (m.toLong, "image", graft.sources.MediaGen.phashBmp(m)) }
          .toDF("media_id", "kind", "payload")
        val hashes = graft.operators.Multimodal.imageDHash(s, media).toDF()
        val bands = hashes
          .select(col("media_id"), posexplode(col("bands")))
          .select(col("media_id"), col("pos").as("band"), col("col").as("bval"))
        val cand = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
              col("a.media_id") < col("b.media_id"))
          .select(col("a.media_id").as("doc_a"), col("b.media_id").as("doc_b"))
          .distinct()
        cand
          .join(hashes.select(col("media_id").as("doc_a"), col("bands").as("ba")), Seq("doc_a"))
          .join(hashes.select(col("media_id").as("doc_b"), col("bands").as("bb")), Seq("doc_b"))
          .withColumn("hamming", expr(
            "bit_count(ba[0] ^ bb[0]) + bit_count(ba[1] ^ bb[1]) + " +
              "bit_count(ba[2] ^ bb[2]) + bit_count(ba[3] ^ bb[3])").cast("int"))
          .where(col("hamming") <= 10)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy("doc_a", "doc_b")
      },
      Some("""
        WITH media AS (
          SELECT i AS media_id, i // 2 AS base, i % 2 AS odd
          FROM generate_series(0, 23) t(i)
        ),
        g AS (
          SELECT m.media_id, gx.gx, gy.gy,
                 (m.base * 37 + ((gx.gx * 16) // 9) * 131
                              + ((gy.gy * 12) // 8) * 197
                  + CASE WHEN m.odd = 1 AND ((gy.gy * 12) // 8) >= 9
                              AND (((gx.gx * 16) // 9) + ((gy.gy * 12) // 8)) % 7 = 0
                         THEN 7 ELSE 0 END) % 256 AS v
          FROM media m, generate_series(0, 8) gx(gx), generate_series(0, 7) gy(gy)
        ),
        bits AS (
          SELECT a.media_id, a.gy // 2 AS band,
                 SUM(CASE WHEN b.v > a.v
                          THEN CAST(POWER(2, (a.gy % 2) * 8 + a.gx) AS BIGINT)
                          ELSE 0 END) AS bval
          FROM g a
          JOIN g b ON b.media_id = a.media_id AND b.gy = a.gy AND b.gx = a.gx + 1
          WHERE a.gx < 8
          GROUP BY a.media_id, a.gy // 2
        ),
        b2 AS (
          SELECT media_id, CAST(band AS INTEGER) AS band,
                 CAST(bval AS INTEGER) AS bval
          FROM bits
        ),
        cand AS (
          SELECT DISTINCT a.media_id AS doc_a, b.media_id AS doc_b
          FROM b2 a
          JOIN b2 b ON a.band = b.band AND a.bval = b.bval
                   AND a.media_id < b.media_id
        )
        SELECT c.doc_a, c.doc_b,
               CAST(SUM(bit_count(xor(x.bval, y.bval))) AS INTEGER) AS hamming
        FROM cand c
        JOIN b2 x ON x.media_id = c.doc_a
        JOIN b2 y ON y.media_id = c.doc_b AND y.band = x.band
        GROUP BY c.doc_a, c.doc_b
        HAVING CAST(SUM(bit_count(xor(x.bval, y.bval))) AS INTEGER) <= 10
        ORDER BY doc_a, doc_b
      """)),

    // ----------------------------------------------------------------
    // q173: audio SILENCE SEGMENTATION (VAD / silence-trim) — the stage
    // that turns q118's per-window energies into the SEGMENTS an
    // audio-curation pipeline actually cuts on: windows are flagged
    // silent below an RMS threshold, then folded into maximal runs via
    // the gaps-and-islands construction (boundary flag -> running
    // sum), one segment row per run with its window span. The flag
    // compares the 1e6-QUANTIZED integer RMS (q118's exact spelling),
    // so the threshold branch is integer arithmetic in both engines;
    // the segment window partitions per clip — decode and
    // segmentation are both per-media parallel at any corpus size.
    Q(
      "q173_audio_silence_segments",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val media = s.range(0, 8)
          .map { m =>
            (m.toLong, "audio", graft.sources.MediaGen.wav(3 * m + 2))
          }
          .toDF("media_id", "kind", "payload")
        val w = Window.partitionBy("media_id").orderBy("window_idx")
        graft.operators.Multimodal.audioWindowFeatures(s, media, win = 32)
          .toDF()
          .select(col("media_id"), col("window_idx"),
            round(col("features").getItem(1).cast("double") * lit(1000000L))
              .cast("long").as("rms_micro"))
          .withColumn("is_silent",
            (col("rms_micro") < lit(577000L)).cast("int"))
          .withColumn("boundary",
            when(lag(col("is_silent"), 1).over(w).isNull ||
              lag(col("is_silent"), 1).over(w) =!= col("is_silent"), 1)
              .otherwise(0))
          .withColumn("seg_id", sum(col("boundary")).over(w))
          .groupBy(col("media_id"), col("seg_id"), col("is_silent"))
          .agg(min(col("window_idx")).cast("int").as("start_w"),
            max(col("window_idx")).cast("int").as("end_w"),
            count(lit(1)).as("n_windows"))
          .select(col("media_id"), col("seg_id").cast("bigint").as("seg_id"),
            col("is_silent"), col("start_w"), col("end_w"), col("n_windows"))
          .orderBy("media_id", "seg_id")
      },
      Some("""
        WITH media AS (
          SELECT i AS media_id, 3 * i + 2 AS mid
          FROM generate_series(0, 7) t(i)
        ),
        samp AS (
          SELECT m.media_id, t.i // 32 AS w,
                 ((m.mid * 7919 + t.i * 12345) % 65536) - 32768 AS s
          FROM media m, generate_series(0, 127) t(i)
        ),
        wstats AS (
          SELECT media_id, CAST(w AS INTEGER) AS window_idx,
                 CAST(ROUND(CAST(CAST(SQRT(CAST(SUM(s * s) AS DOUBLE) / 32)
                   / 32768.0 AS REAL) AS DOUBLE) * 1000000) AS BIGINT) AS rms_micro
          FROM samp GROUP BY media_id, w
        ),
        flagged AS (
          SELECT media_id, window_idx,
                 CASE WHEN rms_micro < 577000 THEN 1 ELSE 0 END AS is_silent
          FROM wstats
        ),
        seg AS (
          SELECT media_id, window_idx, is_silent,
                 CAST(SUM(boundary) OVER (PARTITION BY media_id
                   ORDER BY window_idx) AS BIGINT) AS seg_id
          FROM (
            SELECT *, CASE WHEN LAG(is_silent) OVER (PARTITION BY media_id
                     ORDER BY window_idx) IS DISTINCT FROM is_silent
                   THEN 1 ELSE 0 END AS boundary
            FROM flagged)
        )
        SELECT media_id, seg_id, is_silent,
               MIN(window_idx) AS start_w, MAX(window_idx) AS end_w,
               COUNT(*) AS n_windows
        FROM seg GROUP BY media_id, seg_id, is_silent
        ORDER BY media_id, seg_id
      """)),

    // ----------------------------------------------------------------
    // q174: video SCENE-CUT detection — q173's construction on the
    // VISUAL axis: every AVI frame's mean intensity (q117's container
    // walk, stride 1 = every frame) is compared to its predecessor's,
    // a cut fires where the 1e6-quantized means differ by more than
    // the threshold (STRICTLY — equal-to-threshold deltas exist in
    // this corpus and pin the comparison's strictness), and frames
    // fold into scenes via the same boundary→running-sum islands.
    // Integer arithmetic end to end after quantization; per-clip
    // parallel decode and segmentation at any corpus size.
    Q(
      "q174_video_scene_cuts",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val media = s.range(0, 12)
          .map { m =>
            (m.toLong, "video", graft.sources.MediaGen.aviDib(m),
              graft.sources.MediaGen.aviFrames(m))
          }
          .toDF("media_id", "kind", "payload", "nf")
          .select(col("media_id"), col("kind"), col("payload"),
            struct(
              lit(null).cast("int").as("width"),
              lit(null).cast("int").as("height"),
              lit(null).cast("int").as("sample_rate"),
              col("nf").as("n_frames")).as("meta"))
        val w = Window.partitionBy("media_id").orderBy("frame_idx")
        graft.operators.Multimodal.sampleFrameFeatures(s, media, stride = 1)
          .toDF()
          .select(col("media_id"), col("frame_idx"),
            round(col("features").getItem(3).cast("double") * lit(1000000L))
              .cast("long").as("mean_micro"))
          .withColumn("delta",
            abs(col("mean_micro") - lag(col("mean_micro"), 1).over(w)))
          .withColumn("is_cut",
            when(col("delta") > 5000000L, 1).otherwise(0))
          .withColumn("scene_id", sum(col("is_cut")).over(w))
          .groupBy(col("media_id"), col("scene_id"))
          .agg(min(col("frame_idx")).cast("int").as("start_frame"),
            max(col("frame_idx")).cast("int").as("end_frame"),
            count(lit(1)).as("n_frames"))
          .select(col("media_id"), col("scene_id").cast("bigint").as("scene_id"),
            col("start_frame"), col("end_frame"), col("n_frames"))
          .orderBy("media_id", "scene_id")
      },
      Some("""
        WITH media AS (
          SELECT i AS media_id, 5 + i % 6 AS w, 4 + i % 5 AS h,
                 3 + i % 3 AS nf
          FROM generate_series(0, 11) t(i)
        ),
        frames AS (
          SELECT media_id, w, h, f.f
          FROM media, generate_series(0, 9) f(f)
          WHERE f.f < nf
        ),
        pix AS (
          SELECT fr.media_id, fr.f, fr.w, fr.h,
                 (fr.media_id * 11 + fr.f * 59 + x.x * 137 + y.y * 199) % 256 AS v
          FROM frames fr
          JOIN generate_series(0, 10) x(x) ON x.x < fr.w
          JOIN generate_series(0, 8) y(y) ON y.y < fr.h
        ),
        fmean AS (
          SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
                 CAST(ROUND(CAST(CAST(CAST(SUM(v) AS DOUBLE)
                   / (CAST(w AS DOUBLE) * h) AS REAL) AS DOUBLE) * 1000000)
                   AS BIGINT) AS mean_micro
          FROM pix GROUP BY media_id, f, w, h
        ),
        flagged AS (
          SELECT media_id, frame_idx,
                 CASE WHEN ABS(mean_micro - LAG(mean_micro) OVER (
                     PARTITION BY media_id ORDER BY frame_idx)) > 5000000
                   THEN 1 ELSE 0 END AS is_cut
          FROM fmean
        ),
        seg AS (
          SELECT media_id, frame_idx,
                 CAST(SUM(is_cut) OVER (PARTITION BY media_id
                   ORDER BY frame_idx) AS BIGINT) AS scene_id
          FROM flagged
        )
        SELECT media_id, scene_id,
               MIN(frame_idx) AS start_frame, MAX(frame_idx) AS end_frame,
               COUNT(*) AS n_frames
        FROM seg GROUP BY media_id, scene_id
        ORDER BY media_id, scene_id
      """)),

    // ----------------------------------------------------------------
    // q188: MEDIA CURATION PIPELINE — the multimodal tier composed the
    // way q172 composed text curation: every pillar stage feeds ONE
    // funnel manifest. Images decode to dHashes and drop LSH-banded
    // near-dups (q120's candidate join, keeper = lowest id of a pair);
    // audio decodes to windowed RMS and folds into silence segments
    // (q173's islands), keeping clips at least half voiced; video
    // decodes every frame and folds into scenes (q174's cut rule),
    // keeping clips with >= 2 scenes. The manifest is one aggregate
    // per kind: corpus size, decode count, survivors, and the kept
    // content units (voiced windows / frames / images). Every stage is
    // per-media parallel except the image candidate join, which is
    // band-bucketed (never all-pairs); at 100 TB the funnel aggregate
    // carries one flag row per media item — manifest-sized, not
    // content-sized. The oracle recomputes all three modalities from
    // the generators' closed-form integer formulas and never sees a
    // byte of payload.
    Q(
      "q188_media_curation_pipeline",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        // --- images: decode -> dHash -> banded near-dup (q120) ------
        val imgs = s.range(0, 24)
          .map { m => (m.toLong, "image", graft.sources.MediaGen.phashBmp(m)) }
          .toDF("media_id", "kind", "payload")
        val hashes = graft.operators.Multimodal.imageDHash(s, imgs).toDF()
        val bands = hashes
          .select(col("media_id"), posexplode(col("bands")))
          .select(col("media_id"), col("pos").as("band"), col("col").as("bval"))
        val cand = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
              col("a.media_id") < col("b.media_id"))
          .select(col("a.media_id").as("doc_a"), col("b.media_id").as("doc_b"))
          .distinct()
        val dups = cand
          .join(hashes.select(col("media_id").as("doc_a"), col("bands").as("ba")),
            Seq("doc_a"))
          .join(hashes.select(col("media_id").as("doc_b"), col("bands").as("bb")),
            Seq("doc_b"))
          .withColumn("hamming", expr(
            "bit_count(ba[0] ^ bb[0]) + bit_count(ba[1] ^ bb[1]) + " +
              "bit_count(ba[2] ^ bb[2]) + bit_count(ba[3] ^ bb[3])").cast("int"))
          .where(col("hamming") <= 10)
          .select(col("doc_b").as("media_id")).distinct()
          .withColumn("is_dup", lit(1))
        val imgFlags = imgs.select("media_id")
          .join(hashes.select(col("media_id"), lit(1).as("decoded")),
            Seq("media_id"), "left")
          .join(dups, Seq("media_id"), "left")
          .select(lit("image").as("kind"), col("media_id"),
            coalesce(col("decoded"), lit(0)).as("decoded"),
            (coalesce(col("decoded"), lit(0)) === 1 &&
              coalesce(col("is_dup"), lit(0)) === 0).cast("int").as("passes"),
            lit(1L).as("units"))
        // --- audio: windowed RMS -> silence islands (q173) ----------
        val auds = s.range(0, 8)
          .map { m => (m.toLong, "audio", graft.sources.MediaGen.wav(3 * m + 2)) }
          .toDF("media_id", "kind", "payload")
        val wA = Window.partitionBy("media_id").orderBy("window_idx")
        val segs = graft.operators.Multimodal
          .audioWindowFeatures(s, auds, win = 32).toDF()
          .select(col("media_id"), col("window_idx"),
            round(col("features").getItem(1).cast("double") * lit(1000000L))
              .cast("long").as("rms_micro"))
          .withColumn("is_silent",
            (col("rms_micro") < lit(577000L)).cast("int"))
          .withColumn("boundary",
            when(lag(col("is_silent"), 1).over(wA).isNull ||
              lag(col("is_silent"), 1).over(wA) =!= col("is_silent"), 1)
              .otherwise(0))
          .withColumn("seg_id", sum(col("boundary")).over(wA))
          .groupBy(col("media_id"), col("seg_id"), col("is_silent"))
          .agg(count(lit(1)).as("n_windows"))
        val audFlags = auds.select("media_id")
          .join(segs.groupBy("media_id").agg(
              sum(col("n_windows")).as("n_w"),
              sum(when(col("is_silent") === 0, col("n_windows"))
                .otherwise(lit(0L))).as("n_voiced")),
            Seq("media_id"), "left")
          .select(lit("audio").as("kind"), col("media_id"),
            col("n_w").isNotNull.cast("int").as("decoded"),
            (col("n_voiced") * 2 >= col("n_w")).cast("int").as("passes"),
            coalesce(col("n_voiced"), lit(0L)).cast("long").as("units"))
        // --- video: per-frame means -> scene islands (q174) ---------
        val vids = s.range(0, 12)
          .map { m =>
            (m.toLong, "video", graft.sources.MediaGen.aviDib(m),
              graft.sources.MediaGen.aviFrames(m))
          }
          .toDF("media_id", "kind", "payload", "nf")
          .select(col("media_id"), col("kind"), col("payload"),
            struct(
              lit(null).cast("int").as("width"),
              lit(null).cast("int").as("height"),
              lit(null).cast("int").as("sample_rate"),
              col("nf").as("n_frames")).as("meta"))
        val wV = Window.partitionBy("media_id").orderBy("frame_idx")
        val scenes = graft.operators.Multimodal
          .sampleFrameFeatures(s, vids, stride = 1).toDF()
          .select(col("media_id"), col("frame_idx"),
            round(col("features").getItem(3).cast("double") * lit(1000000L))
              .cast("long").as("mean_micro"))
          .withColumn("delta",
            abs(col("mean_micro") - lag(col("mean_micro"), 1).over(wV)))
          .withColumn("is_cut",
            when(col("delta") > 5000000L, 1).otherwise(0))
          .withColumn("scene_id", sum(col("is_cut")).over(wV))
          .groupBy(col("media_id"), col("scene_id"))
          .agg(count(lit(1)).as("n_frames"))
        val vidFlags = vids.select("media_id")
          .join(scenes.groupBy("media_id").agg(
              count(lit(1)).as("n_scenes"),
              sum(col("n_frames")).as("n_frames")),
            Seq("media_id"), "left")
          .select(lit("video").as("kind"), col("media_id"),
            col("n_scenes").isNotNull.cast("int").as("decoded"),
            (col("n_scenes") >= 2).cast("int").as("passes"),
            coalesce(col("n_frames"), lit(0L)).cast("long").as("units"))
        // --- the funnel manifest: ONE aggregate per kind ------------
        imgFlags.unionByName(audFlags).unionByName(vidFlags)
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("decoded").cast("long")).as("n_decoded"),
            sum(col("passes").cast("long")).as("n_kept"),
            sum(col("passes").cast("long") * col("units")).as("kept_units"))
          .orderBy("kind")
      },
      Some("""
        WITH im AS (
          SELECT i AS media_id, i // 2 AS base, i % 2 AS odd
          FROM generate_series(0, 23) t(i)
        ),
        ig AS (
          SELECT m.media_id, gx.gx, gy.gy,
                 (m.base * 37 + ((gx.gx * 16) // 9) * 131
                              + ((gy.gy * 12) // 8) * 197
                  + CASE WHEN m.odd = 1 AND ((gy.gy * 12) // 8) >= 9
                              AND (((gx.gx * 16) // 9) + ((gy.gy * 12) // 8)) % 7 = 0
                         THEN 7 ELSE 0 END) % 256 AS v
          FROM im m, generate_series(0, 8) gx(gx), generate_series(0, 7) gy(gy)
        ),
        ibits AS (
          SELECT a.media_id, a.gy // 2 AS band,
                 SUM(CASE WHEN b.v > a.v
                          THEN CAST(POWER(2, (a.gy % 2) * 8 + a.gx) AS BIGINT)
                          ELSE 0 END) AS bval
          FROM ig a
          JOIN ig b ON b.media_id = a.media_id AND b.gy = a.gy AND b.gx = a.gx + 1
          WHERE a.gx < 8
          GROUP BY a.media_id, a.gy // 2
        ),
        ib2 AS (
          SELECT media_id, CAST(band AS INTEGER) AS band,
                 CAST(bval AS INTEGER) AS bval
          FROM ibits
        ),
        icand AS (
          SELECT DISTINCT a.media_id AS doc_a, b.media_id AS doc_b
          FROM ib2 a
          JOIN ib2 b ON a.band = b.band AND a.bval = b.bval
                    AND a.media_id < b.media_id
        ),
        ipairs AS (
          SELECT c.doc_a, c.doc_b
          FROM icand c
          JOIN ib2 x ON x.media_id = c.doc_a
          JOIN ib2 y ON y.media_id = c.doc_b AND y.band = x.band
          GROUP BY c.doc_a, c.doc_b
          HAVING CAST(SUM(bit_count(xor(x.bval, y.bval))) AS INTEGER) <= 10
        ),
        idup AS (SELECT DISTINCT doc_b AS media_id FROM ipairs),
        iflags AS (
          SELECT 'image' AS kind, m.media_id, 1 AS decoded,
                 CASE WHEN d.media_id IS NULL THEN 1 ELSE 0 END AS passes,
                 CAST(1 AS BIGINT) AS units
          FROM im m LEFT JOIN idup d ON d.media_id = m.media_id
        ),
        am AS (
          SELECT i AS media_id, 3 * i + 2 AS mid
          FROM generate_series(0, 7) t(i)
        ),
        asamp AS (
          SELECT m.media_id, t.i // 32 AS w,
                 ((m.mid * 7919 + t.i * 12345) % 65536) - 32768 AS s
          FROM am m, generate_series(0, 127) t(i)
        ),
        awstats AS (
          SELECT media_id, CAST(w AS INTEGER) AS window_idx,
                 CAST(ROUND(CAST(CAST(SQRT(CAST(SUM(s * s) AS DOUBLE) / 32)
                   / 32768.0 AS REAL) AS DOUBLE) * 1000000) AS BIGINT) AS rms_micro
          FROM asamp GROUP BY media_id, w
        ),
        aflagged AS (
          SELECT media_id,
                 CASE WHEN rms_micro < 577000 THEN 1 ELSE 0 END AS is_silent
          FROM awstats
        ),
        aflags AS (
          SELECT 'audio' AS kind, media_id, 1 AS decoded,
                 CASE WHEN 2 * SUM(1 - is_silent) >= COUNT(*)
                      THEN 1 ELSE 0 END AS passes,
                 CAST(SUM(1 - is_silent) AS BIGINT) AS units
          FROM aflagged GROUP BY media_id
        ),
        vm AS (
          SELECT i AS media_id, 5 + i % 6 AS w, 4 + i % 5 AS h,
                 3 + i % 3 AS nf
          FROM generate_series(0, 11) t(i)
        ),
        vframes AS (
          SELECT media_id, w, h, f.f
          FROM vm, generate_series(0, 9) f(f)
          WHERE f.f < nf
        ),
        vpix AS (
          SELECT fr.media_id, fr.f, fr.w, fr.h,
                 (fr.media_id * 11 + fr.f * 59 + x.x * 137 + y.y * 199) % 256 AS v
          FROM vframes fr
          JOIN generate_series(0, 10) x(x) ON x.x < fr.w
          JOIN generate_series(0, 8) y(y) ON y.y < fr.h
        ),
        vfmean AS (
          SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
                 CAST(ROUND(CAST(CAST(CAST(SUM(v) AS DOUBLE)
                   / (CAST(w AS DOUBLE) * h) AS REAL) AS DOUBLE) * 1000000)
                   AS BIGINT) AS mean_micro
          FROM vpix GROUP BY media_id, f, w, h
        ),
        vflagged AS (
          SELECT media_id,
                 CASE WHEN ABS(mean_micro - LAG(mean_micro) OVER (
                     PARTITION BY media_id ORDER BY frame_idx)) > 5000000
                   THEN 1 ELSE 0 END AS is_cut
          FROM vfmean
        ),
        vflags AS (
          SELECT 'video' AS kind, media_id, 1 AS decoded,
                 CASE WHEN SUM(is_cut) + 1 >= 2 THEN 1 ELSE 0 END AS passes,
                 CAST(COUNT(*) AS BIGINT) AS units
          FROM vflagged GROUP BY media_id
        ),
        allflags AS (
          SELECT * FROM iflags
          UNION ALL SELECT * FROM aflags
          UNION ALL SELECT * FROM vflags
        )
        SELECT kind, COUNT(*) AS n_media,
               CAST(SUM(decoded) AS BIGINT) AS n_decoded,
               CAST(SUM(passes) AS BIGINT) AS n_kept,
               CAST(SUM(passes * units) AS BIGINT) AS kept_units
        FROM allflags
        GROUP BY kind
        ORDER BY kind
      """))
  )
}
