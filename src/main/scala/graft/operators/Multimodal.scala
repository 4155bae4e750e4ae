package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star requirement): image/audio/video
  * travel as opaque BINARY columns with typed metadata; decode /
  * feature-extract / resize / frame-sample are per-partition batch
  * transforms.
  *
  * The DECODE step is real for images (JPEG/PNG/GIF/BMP via the JDK's
  * bundled `javax.imageio.ImageIO`, plus a zero-allocation hand parser
  * for 24-bit BMP as the fast path), for audio (PCM16 WAV, pure byte
  * layout), and for VIDEO frames of two containers
  * ([[sampleFrameFeatures]]: animated GIF via ImageIO's multi-frame
  * reader; uncompressed-DIB AVI via a dependency-free RIFF walk) — see
  * [[graft.functions.MediaCodec]]. Only COMPRESSED video decode remains
  * a clearly-marked deterministic STUB: a bare JVM ships no such codec.
  * Everything around it is the real Spark shape a production pipeline
  * needs: fixed schema, per-partition batching (one decoder init per
  * partition, not per row — the JVM analog of mapInPandas batch
  * semantics), size-aware repartitioning, and generated frame indices
  * for video sampling.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  final case class MediaFeatures(media_id: Long, kind: String, dim: Int,
                                 features: Array[Float])

  /** Binary payloads are large: rebalance by size so no task gets all the
    * videos. `targetBytes` is the max payload volume per partition. */
  def repartitionBySize(df: DataFrame, targetBytes: Long): DataFrame = {
    val totalBytes = df.select(sum(length(col("payload")))).head.getLong(0)
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytes)).toInt)
    df.repartition(parts, col("media_id"))
  }

  /** Decode + feature-extract, batched per partition (one decoder init
    * per partition, not per row — the pattern that matters at scale).
    *
    * The decode is REAL for images — hand-rolled 24-bit BMP fast path,
    * then JDK ImageIO (JPEG/PNG/GIF/any installed reader) — and for
    * PCM16 WAV audio ([[graft.functions.MediaCodec]] — channel means/
    * luma stats, RMS/zero-cross features). Payloads no decoder accepts
    * (unrecognized or corrupt images, compressed audio, all video — no
    * video codec in a bare JVM) fall back to a clearly-marked
    * deterministic STUB feature (rolling hash of the bytes). Dim stays
    * fixed per kind: 8 image, 4 audio, 16 video. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real pipeline: expensive codec init would go here, once/partition
        rows.map { case (id, kind, bytes) =>
          val dim = kind match {
            case "image" => 8
            case "audio" => 4
            case _       => 16
          }
          def stub = Array.tabulate(dim) { d =>
            var h = 1125899906842597L + d
            var i = 0
            while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
            ((h % 1000003L).toFloat) / 1000003f
          }
          val feats = (kind match {
            case "image" =>
              graft.functions.MediaCodec.bmpFeatures(bytes)
                .orElse(graft.functions.MediaCodec.imageIoFeatures(bytes))
            case "audio" => graft.functions.MediaCodec.wavFeatures(bytes)
            case _       => None // >>> STUB: video decode needs real codecs
          }).getOrElse(stub)
          MediaFeatures(id, kind, dim, feats)
        }
      }
  }

  /** Video frame sampling: every `stride`-th frame index from metadata —
    * pure generated plumbing (the decode of each sampled frame goes
    * through [[sampleFrameFeatures]]' partition loop). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .where(col("kind") === "video" && col("meta.n_frames").isNotNull)
      .select(
        col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          lit(stride))).as("frame_idx"))

  final case class FrameFeatures(media_id: Long, frame_idx: Int,
                                 decoded: Boolean, features: Array[Float])

  /** Frame sampling with REAL per-frame decode for TWO containers:
    * animated GIF (ImageIO's multi-frame reader — one reader init per
    * payload) and uncompressed-DIB AVI (RIFF walk + raw 24bpp frame
    * rasters, [[graft.functions.MediaCodec.aviDibFrameFeatures]] — no
    * codec needed at all); every `stride`-th frame decodes in the
    * partition loop to the 8 image stats. Compressed video (H.264 etc.)
    * stays the documented stub ceiling — a bare JVM ships no such
    * codec: sampled indices come from `meta.n_frames` with
    * deterministic hash features and `decoded = false`, so downstream
    * consumers can tell a real statistic from a placeholder. */
  def sampleFrameFeatures(spark: SparkSession, media: DataFrame,
                          stride: Int): Dataset[FrameFeatures] = {
    import spark.implicits._
    media
      .where(col("kind") === "video")
      .select(col("media_id"), col("payload"), col("meta.n_frames"))
      .as[(Long, Array[Byte], Option[Int])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes, nFrames) =>
          graft.functions.MediaCodec.gifFrameFeatures(bytes, stride)
            .orElse(graft.functions.MediaCodec.aviDibFrameFeatures(bytes, stride)) match {
            case Some(frames) =>
              frames.iterator.map { case (i, f) =>
                FrameFeatures(id, i, decoded = true, f)
              }
            case None => // >>> STUB: no JVM codec for non-GIF video
              // One pass over the payload; per-(dim, frame) placeholder
              // values derive from (payloadHash, d, i) arithmetic. The
              // previous shape rescanned the full payload once per
              // (dimension, frame) — 8 x nFrames passes, ~80 GB of
              // scanning for a 10 MB payload with 1000 sampled frames.
              var ph = 1125899906842597L
              var j = 0
              while (j < bytes.length) { ph = 31 * ph + bytes(j); j += 1 }
              (0 until nFrames.getOrElse(0) by stride).iterator.map { i =>
                val feats = Array.tabulate(8) { d =>
                  var h = ph + d * 7919L + i
                  h = (h ^ (h >>> 33)) * 0x9E3779B97F4A7C15L
                  (java.lang.Math.floorMod(h, 1000003L).toFloat) / 1000003f
                }
                FrameFeatures(id, i, decoded = false, feats)
              }
          }
        }
      }
  }

  /** PHYSICAL resize + feature extraction: [[planResize]]'s metadata
    * targets joined back to the payloads, then a nearest-neighbor
    * resize (pure integer index math — deterministic, so the driver's
    * oracle can replay it) and the 8 raster stats over the TARGET
    * raster, all in one partition loop next to decode. BMP goes
    * through the zero-copy byte-walk
    * ([[graft.functions.MediaCodec.bmpResizeFeatures]]); anything else
    * falls back to the deterministic stub with the same dim. */
  def resizeFeatures(spark: SparkSession, media: DataFrame,
                     maxSide: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .join(planResize(media, maxSide), Seq("media_id"))
      .select(col("media_id"), col("payload"),
        col("target_width"), col("target_height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, tw, th) =>
          def stub = Array.tabulate(8) { d =>
            var h = 1125899906842597L + d
            var i = 0
            while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
            ((h % 1000003L).toFloat) / 1000003f
          }
          val feats = graft.functions.MediaCodec
            .bmpResizeFeatures(bytes, tw, th).getOrElse(stub)
          MediaFeatures(id, "image", 8, feats)
        }
      }
  }

  final case class DHash(media_id: Long, bands: Array[Int])

  /** Perceptual-hash fingerprints for IMAGE near-dup dedup — the
    * multimodal counterpart of the text MinHash family: decode +
    * 9x8 dHash in the partition loop
    * ([[graft.functions.MediaCodec.bmpDHashBands]]), one row per
    * decodable image, four 16-bit bands per row. Downstream dedup is
    * pure DataFrame algebra: band-keyed self-join for candidates
    * (never all-pairs — two images within Hamming r collide on a band
    * unless the r flips spread across all four), exact Hamming via
    * `bit_count` over the four XORs for the verify. Undecodable
    * payloads yield no fingerprint (can't near-dup what can't be
    * decoded). */
  def imageDHash(spark: SparkSession, media: DataFrame): Dataset[DHash] = {
    import spark.implicits._
    media
      .where(col("kind") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          graft.functions.MediaCodec.bmpDHashBands(bytes).map(DHash(id, _))
        }
      }
  }

  final case class AudioWindow(media_id: Long, window_idx: Int,
                               features: Array[Float])

  /** Audio segmentation: consecutive full `win`-sample windows of each
    * PCM16 WAV payload, each with [win, rms, meanAbs, crossings] —
    * the per-window shape a VAD / silence-trim / loudness-filter
    * pipeline consumes. Undecodable payloads yield NO rows (a corrupt
    * clip is filtered, never fabricated — the opposite default from
    * [[extractFeatures]]'s whole-clip stub, and the right one for
    * per-window rows that downstream thresholds act on). */
  def audioWindowFeatures(spark: SparkSession, media: DataFrame,
                          win: Int): Dataset[AudioWindow] = {
    import spark.implicits._
    media
      .where(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          graft.functions.MediaCodec.wavWindowFeatures(bytes, win)
            .getOrElse(Seq.empty)
            .iterator.map { case (wi, f) => AudioWindow(id, wi, f) }
        }
      }
  }

  /** Resize planning: pure metadata math (target box, preserve aspect) —
    * the physical resize belongs in the partition loop next to decode. */
  def planResize(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width").cast(DoubleType)
    val h = col("meta.height").cast(DoubleType)
    val scale = least(lit(maxSide) / greatest(w, h), lit(1.0))
    media
      .where(col("kind") === "image")
      .select(
        col("media_id"),
        floor(w * scale).cast(IntegerType).as("target_width"),
        floor(h * scale).cast(IntegerType).as("target_height"))
  }
}
