package graft

import graft.functions.MediaCodec
import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.nio.{ByteBuffer, ByteOrder}

/** Real decode of the byte-layout media formats: hand-assembled 24-bit
  * BMP (with row padding) and PCM16 WAV bytes against hand-computed
  * channel/RMS statistics, plus the fallback-to-stub path through the
  * full extractFeatures pipeline. */
class MediaCodecSpec extends AnyFunSuite {

  /** 2x2 24bpp BMP, bottom-up, rows padded to 8 bytes:
    * bottom row blue+green, top row red+white. */
  private def bmp2x2: Array[Byte] = {
    val buf = ByteBuffer.allocate(54 + 16).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + 16).putInt(0).putInt(54) // file size, reserved, data offset
    buf.putInt(40).putInt(2).putInt(2)       // DIB size, width, height
    buf.putShort(1).putShort(24)             // planes, bpp
    buf.putInt(0).putInt(16)                 // compression, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    buf.put(Array[Byte](-1, 0, 0, 0, -1, 0, 0, 0))   // blue, green + pad
    buf.put(Array[Byte](0, 0, -1, -1, -1, -1, 0, 0)) // red, white + pad
    buf.array()
  }

  /** Mono 8 kHz PCM16 WAV with samples [1000, -1000, 1000, -1000]. */
  private def wav4: Array[Byte] = {
    val buf = ByteBuffer.allocate(44 + 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + 8).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
    buf.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(8)
    Seq(1000, -1000, 1000, -1000).foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  test("bmpFeatures decodes 24-bit BMP with row padding") {
    val f = MediaCodec.bmpFeatures(bmp2x2).get
    assert(f(0) == 2f && f(1) == 2f && f(2) == 1f)
    assert(f(3) == 127.5f && f(4) == 127.5f && f(5) == 127.5f) // B, G, R means
    assert(math.abs(f(6) - 127.5f) < 1e-3)                     // mean luma
    assert(math.abs(f(7) - math.sqrt(5418.75)) < 1e-3)         // luma stddev
  }

  test("wavFeatures decodes PCM16 and computes rate/duration/rms/zcr") {
    val f = MediaCodec.wavFeatures(wav4).get
    assert(f(0) == 8000f)
    assert(math.abs(f(1) - 4.0 / 8000) < 1e-9)
    assert(math.abs(f(2) - 1000.0 / 32768) < 1e-6)
    assert(f(3) == 1f) // every adjacent pair flips sign
  }

  test("corrupt payloads return None, never throw") {
    assert(MediaCodec.bmpFeatures(Array.fill[Byte](100)(7)).isEmpty)
    assert(MediaCodec.wavFeatures(Array.fill[Byte](100)(7)).isEmpty)
    assert(MediaCodec.bmpFeatures("BM".getBytes).isEmpty)        // truncated
    assert(MediaCodec.wavFeatures("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("extractFeatures uses real decode for BMP/WAV and stub otherwise") {
    val spark = TestSpark.spark
    val rows = Seq(
      Row(1L, "image", bmp2x2, Row(2, 2, null, null)),
      Row(2L, "audio", wav4, Row(null, null, 8000, null)),
      Row(3L, "image", Array.fill[Byte](32)(7), Row(8, 4, null, null))) // not BMP
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val got = Multimodal.extractFeatures(spark, media).collect()
      .map(m => m.media_id -> m.features).toMap
    assert(got(1L)(0) == 2f && got(1L)(3) == 127.5f)
    assert(got(2L)(0) == 8000f)
    // fallback path: still 8 deterministic dims, but not BMP stats
    assert(got(3L).length == 8 && got(3L)(0) != 8f)
  }
}
