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

  /** Encode a pixel grid (packed sRGB ints, row-major) to image bytes via
    * the JDK writer — the fixture generator is the JDK encoder, the
    * expected stats are computed by hand from the source pixels below,
    * independent of any MediaCodec code path. */
  private def encode(pixels: Array[Array[Int]], format: String): Array[Byte] = {
    val h = pixels.length
    val w = pixels(0).length
    val imgType =
      if (format == "jpg") java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  /** Same pixel set as the BMP fixture: blue, green / red, white. */
  private val rgbw: Array[Array[Int]] =
    Array(Array(0x0000ff, 0x00ff00), Array(0xff0000, 0xffffff))

  test("imageIoFeatures decodes PNG losslessly to hand-computed stats") {
    val f = MediaCodec.imageIoFeatures(encode(rgbw, "png")).get
    assert(f(0) == 2f && f(1) == 2f && f(2) == 1f)
    // hand-computed from rgbw: each channel is 255 in exactly 2 of 4 px
    assert(f(3) == 127.5f && f(4) == 127.5f && f(5) == 127.5f)
    // lumas 85,85,85,255 -> mean 127.5, var 5418.75
    assert(math.abs(f(6) - 127.5f) < 1e-3)
    assert(math.abs(f(7) - math.sqrt(5418.75)) < 1e-3)
    // PNG is lossless: must agree exactly with the BMP parse of the same pixels
    val bmp = MediaCodec.bmpFeatures(bmp2x2).get
    assert(f.toSeq == bmp.toSeq, "PNG(ImageIO) and BMP(hand parser) stats must match")
  }

  test("imageIoFeatures decodes JPEG (lossy: solid gray within tolerance)") {
    val gray = Array.fill(8, 8)(0x808080) // solid 128-gray survives DCT ~exactly
    val f = MediaCodec.imageIoFeatures(encode(gray, "jpg")).get
    assert(f(0) == 8f && f(1) == 8f)
    Seq(f(3), f(4), f(5), f(6)).foreach(m => assert(math.abs(m - 128f) <= 2f, s"mean $m"))
    assert(f(7) <= 2f, s"solid-color stdLuma ${f(7)}")
  }

  test("imageIoFeatures decodes grayscale and palette color models via sRGB") {
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, 0x646464) // gray 100
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val f = MediaCodec.imageIoFeatures(out.toByteArray).get
    assert(f(0) == 4f && f(1) == 2f && f(2) == 2f)
    // sRGB<->linear-gray round trip may shift the level by a step or two,
    // but all channels must stay equal and the image must stay flat
    assert(f(3) == f(4) && f(4) == f(5) && f(5) == f(6))
    assert(math.abs(f(6) - 100f) <= 3f && f(7) == 0f)
  }

  test("aviDibFrameFeatures decodes uncompressed AVI frames with the engine's own RIFF walk") {
    import graft.sources.MediaGen
    val bytes = MediaGen.aviDib(3)
    val frames = MediaCodec.aviDibFrameFeatures(bytes, 2).get
    val (w, h) = MediaGen.aviDims(3)
    assert(frames.map(_._1) == (0 until MediaGen.aviFrames(3) by 2))
    val f0 = frames.head._2
    assert(f0(0) == w.toFloat && f0(1) == h.toFloat)
    // mean gray must equal the generator's closed form (gray ⇒ B=G=R=luma)
    val vals = for (y <- 0 until h; x <- 0 until w) yield MediaGen.aviPixel(3, 0, x, y)
    val mean = vals.sum.toDouble / vals.size
    assert(f0(3) == mean.toFloat && f0(6) == mean.toFloat)
    // sanity on the second sampled frame too (frame index 2)
    val f2 = frames(1)._2
    val vals2 = for (y <- 0 until h; x <- 0 until w) yield MediaGen.aviPixel(3, 2, x, y)
    assert(f2(3) == (vals2.sum.toDouble / vals2.size).toFloat)
    // rejections: truncated container, garbage, and a compressed fourcc
    assert(MediaCodec.aviDibFrameFeatures("RIFFxxxxAVI ".getBytes, 1).isEmpty)
    assert(MediaCodec.aviDibFrameFeatures(Array.fill[Byte](64)(9), 1).isEmpty)
  }

  test("bmpResizeFeatures samples nearest-neighbor in image coordinates") {
    // 2x2 bmp2x2 is stored bottom-up (storage row 0 = blue,green =
    // image BOTTOM row), so a 1x1 resize samples image (0,0) = the
    // TOP-left = RED — the storage flip is exactly what's under test:
    // an unflipped walk would sample blue here
    val f = MediaCodec.bmpResizeFeatures(bmp2x2, 1, 1).get
    assert(f(0) == 1f && f(1) == 1f)
    assert(f(3) == 0f && f(4) == 0f && f(5) == 255f, f.toSeq.toString)
    assert(f(7) == 0f) // single pixel: zero variance
    // identity resize reproduces bmpFeatures' stats exactly
    val id = MediaCodec.bmpResizeFeatures(bmp2x2, 2, 2).get
    assert(id.toSeq == MediaCodec.bmpFeatures(bmp2x2).get.toSeq)
    assert(MediaCodec.bmpResizeFeatures(bmp2x2, 0, 1).isEmpty)
    assert(MediaCodec.bmpResizeFeatures("BM".getBytes, 1, 1).isEmpty)
  }

  test("wavWindowFeatures segments full windows with per-window stats") {
    // wav4 = [1000, -1000, 1000, -1000]: win=2 -> 2 windows, each
    // rms = 1000/32768, meanAbs = 1000/32768, crossings = 1
    val ws = MediaCodec.wavWindowFeatures(wav4, 2).get
    assert(ws.map(_._1) == Seq(0, 1))
    ws.foreach { case (_, f) =>
      assert(f(0) == 2f)
      assert(f(1) == (1000.0 / 32768).toFloat)
      assert(f(2) == (1000.0 / 32768).toFloat)
      assert(f(3) == 1f)
    }
    // win=3 -> one full window (ragged tail dropped), crossings = 2
    val w3 = MediaCodec.wavWindowFeatures(wav4, 3).get
    assert(w3.size == 1 && w3.head._2(3) == 2f)
    assert(MediaCodec.wavWindowFeatures(wav4, 5).isEmpty, "no full window")
    assert(MediaCodec.wavWindowFeatures(Array.fill[Byte](64)(9), 2).isEmpty)
  }

  test("corrupt payloads return None, never throw") {
    assert(MediaCodec.bmpFeatures(Array.fill[Byte](100)(7)).isEmpty)
    assert(MediaCodec.wavFeatures(Array.fill[Byte](100)(7)).isEmpty)
    assert(MediaCodec.bmpFeatures("BM".getBytes).isEmpty)        // truncated
    assert(MediaCodec.wavFeatures("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("crafted near-Int.MaxValue sizes return None instead of wrapping") {
    def withLe32(base: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val b = base.clone()
      ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(v)
      b
    }
    // BMP width 0x2AAAAAAB: `width * 3` wraps negative in Int, so an
    // Int row stride would slip past the bounds check and index OOB
    val hugeW = withLe32(bmp2x2, 18, 0x2AAAAAAB)
    assert(MediaCodec.bmpFeatures(hugeW).isEmpty)
    assert(MediaCodec.bmpResizeFeatures(hugeW, 2, 2).isEmpty)
    assert(MediaCodec.bmpDHashBands(hugeW).isEmpty)
    // height Int.MinValue: math.abs stays negative
    assert(MediaCodec.bmpFeatures(withLe32(bmp2x2, 22, Int.MinValue)).isEmpty)
    // WAV fmt chunk size 0x7FFFFFF0: `off + 8 + size` wraps negative
    val hugeChunk = withLe32(wav4, 16, 0x7FFFFFF0)
    assert(MediaCodec.wavFeatures(hugeChunk).isEmpty)
    assert(MediaCodec.wavWindowFeatures(hugeChunk, 2).isEmpty)
    // AVI LIST chunk with a wrapping size
    val avi = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    avi.put("RIFF".getBytes).putInt(16).put("AVI ".getBytes)
    avi.put("LIST".getBytes).putInt(0x7FFFFFF0).putInt(0)
    assert(MediaCodec.aviDibFrameFeatures(avi.array(), 1).isEmpty)
  }

  test("extractFeatures uses real decode for BMP/PNG/JPEG/WAV and stub otherwise") {
    val spark = TestSpark.spark
    val rows = Seq(
      Row(1L, "image", bmp2x2, Row(2, 2, null, null)),
      Row(2L, "audio", wav4, Row(null, null, 8000, null)),
      Row(3L, "image", Array.fill[Byte](32)(7), Row(8, 4, null, null)), // no decoder
      Row(4L, "image", encode(rgbw, "png"), Row(2, 2, null, null)),
      Row(5L, "image", encode(Array.fill(8, 8)(0x808080), "jpg"), Row(8, 8, null, null)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val got = Multimodal.extractFeatures(spark, media).collect()
      .map(m => m.media_id -> m.features).toMap
    assert(got(1L)(0) == 2f && got(1L)(3) == 127.5f)
    assert(got(2L)(0) == 8000f)
    // fallback path: still 8 deterministic dims, but not BMP stats
    assert(got(3L).length == 8 && got(3L)(0) != 8f)
    // PNG through ImageIO: identical stats to the BMP of the same pixels
    assert(got(4L).toSeq == got(1L).toSeq)
    // JPEG through ImageIO: real dimensions, near-exact solid gray
    assert(got(5L)(0) == 8f && math.abs(got(5L)(6) - 128f) <= 2f)
  }
}
