package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Deterministic synthetic media payloads for the multimodal gate (q113).
  *
  * Every payload is a pure integer byte layout derived from `media_id`
  * alone, so an external oracle can recompute the DECODED statistics from
  * the same closed-form formulas without ever seeing the bytes:
  *
  *   - 24-bit BMP and PNG images with gray pixels (b = g = r =
  *     [[pixel]](m, x, y)) — gray keeps the decoder's luma (b+g+r)/3
  *     integer-exact, so every accumulated sum is an exact integer in
  *     double and the final mean/std divisions are single IEEE ops that
  *     are bit-identical across engines.
  *   - PCM16 mono WAV with samples [[sample]](m, i) over a fixed
  *     129-sample window — 129-1 = 128 = 2^7 makes the zero-cross-rate
  *     float division exact, immune to float-vs-double promotion.
  *
  * PNG goes through the JDK encoder ([[javax.imageio.ImageIO]]); its
  * BYTES are not required to be deterministic — only the decoded raster
  * is (PNG is lossless, `TYPE_INT_RGB` round-trips setRGB/getRGB
  * exactly), which is what the feature oracle checks. This mirrors how a
  * production corpus works: the engine never trusts payload bytes, only
  * the decode contract.
  *
  * At 100 TB the payloads arrive as parquet BINARY columns; this
  * generator only replaces the SOURCE for the correctness gate — the
  * operator under test ([[graft.operators.Multimodal.extractFeatures]])
  * is byte-identical either way.
  */
object MediaGen {

  /** media_id -> kind cycle: BMP image, PNG image, WAV audio. */
  def kind(m: Long): String = if (m % 3 == 2) "audio" else "image"

  def payload(m: Long): Array[Byte] = (m % 3) match {
    case 0 => bmp(m)
    case 1 => png(m)
    case _ => wav(m)
  }

  /** Image dims vary with the media group so BMP row padding (width*3 %
    * 4 != 0) and non-square aspects are both exercised. */
  def dims(m: Long): (Int, Int) = {
    val grp = (m / 3).toInt
    (3 + grp % 6, 2 + grp % 5)
  }

  /** Gray level of pixel (x, y) of image m — the oracle's closed form. */
  def pixel(m: Long, x: Int, y: Int): Int =
    ((m * 7 + x * 131 + y * 197) % 256).toInt

  /** Signed 16-bit sample i of clip m — multiplier chosen so the mod
    * wraps many times across 129 samples (frequent sign crossings). */
  def sample(m: Long, i: Int): Int =
    ((m * 7919 + i * 12345) % 65536).toInt - 32768

  val WavSamples = 129

  def sampleRate(m: Long): Int = 8000 + ((m / 3) % 4).toInt * 4000

  /** Hand-assembled 24bpp bottom-up gray BMP with 4-byte row padding. */
  private def grayBmp(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val buf = ByteBuffer.allocate(54 + stride * h).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + stride * h).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h) // positive height = bottom-up
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(stride * h)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var r = 0
    while (r < h) {
      val y = h - 1 - r // storage row r holds image row h-1-r
      var x = 0
      while (x < w) {
        val g = v(x, y).toByte
        buf.put(g).put(g).put(g)
        x += 1
      }
      var p = w * 3
      while (p < stride) { buf.put(0.toByte); p += 1 }
      r += 1
    }
    buf.array()
  }

  def bmp(m: Long): Array[Byte] = {
    val (w, h) = dims(m)
    grayBmp(w, h, (x, y) => pixel(m, x, y))
  }

  // ---- perceptual-hash near-dup corpus (q120): 16x12 clips in PAIRS
  // (base = m/2); the odd member perturbs only image rows y >= 9 at a
  // sparse (x+y)%7 pattern with amplitude 7 — calibrated so exactly the
  // dHash comparisons whose wrapped adjacent diff is small flip (the
  // near-dup signal lands in band 3 only, so bands 0-2 still collide
  // for the LSH blocking step while the Hamming distance is nonzero).

  def phashPixel(m: Long, x: Int, y: Int): Int = {
    val base = m / 2
    val pert = if (m % 2 == 1 && y >= 9 && (x + y) % 7 == 0) 7 else 0
    ((base * 37 + x * 131 + y * 197 + pert) % 256).toInt
  }

  def phashBmp(m: Long): Array[Byte] =
    grayBmp(16, 12, (x, y) => phashPixel(m, x, y))

  /** Same raster as [[bmp]]'s formula, through the JDK PNG encoder. */
  def png(m: Long): Array[Byte] = {
    val (w, h) = dims(m)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = pixel(m, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ---- animated-GIF "video" payloads (q116): every frame is a full
  // gray raster through a 256-entry gray IndexColorModel, so the GIF
  // round trip is EXACT — palette index v decodes to (v, v, v), no
  // quantization, no sRGB conversion (the trap TYPE_BYTE_GRAY has).

  def gifFrames(m: Long): Int = 3 + (m % 3).toInt

  /** Frame dims stay >= 8: the JDK GIF codec corrupts rows past the
    * first on tiny rasters (measured: 3x2/4x4/5x3 keep only row 0;
    * 8x8 and up round-trip exactly). */
  def gifDims(m: Long): (Int, Int) = (8 + (m % 5).toInt, 8 + (m % 4).toInt)

  /** Gray level of pixel (x, y) of frame f of clip m. */
  def gifPixel(m: Long, f: Int, x: Int, y: Int): Int =
    ((m * 7 + f * 53 + x * 131 + y * 197) % 256).toInt

  /** Animated GIF via the JDK's sequence writer — the one video
    * container a bare JVM decodes frame-by-frame for real. */
  def gifVideo(m: Long): Array[Byte] = {
    val (w, h) = gifDims(m)
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < gifFrames(m)) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, gifPixel(m, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  // ---- uncompressed-DIB AVI "video" payloads (q117): a real RIFF/AVI
  // container whose frames are raw 24bpp bottom-up DIB rasters — pure
  // byte layout end to end, no codec, so frame stats are closed-form.

  def aviFrames(m: Long): Int = 3 + (m % 3).toInt
  def aviDims(m: Long): (Int, Int) = (5 + (m % 6).toInt, 4 + (m % 5).toInt)

  /** Gray level of pixel (x, y) of frame f of AVI clip m. */
  def aviPixel(m: Long, f: Int, x: Int, y: Int): Int =
    ((m * 11 + f * 59 + x * 137 + y * 199) % 256).toInt

  /** Minimal-but-valid AVI: RIFF(AVI ) > LIST(hdrl){avih, LIST(strl)
    * {strh vids/DIB, strf BITMAPINFOHEADER}} > LIST(movi){00db x nf}. */
  def aviDib(m: Long): Array[Byte] = {
    val (w, h) = aviDims(m)
    val nf = aviFrames(m)
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h
    val moviSize = 4 + nf * (8 + frameBytes)
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(riffSize).put("AVI ".getBytes)
    buf.put("LIST".getBytes).putInt(hdrlSize).put("hdrl".getBytes)
    buf.put("avih".getBytes).putInt(56)
    buf.putInt(100000).putInt(frameBytes * 10).putInt(0).putInt(0) // usec/frame, bytes/s, pad, flags
    buf.putInt(nf).putInt(0).putInt(1).putInt(frameBytes)          // frames, init, streams, bufsize
    buf.putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    buf.put("LIST".getBytes).putInt(strlSize).put("strl".getBytes)
    buf.put("strh".getBytes).putInt(56)
    buf.put("vids".getBytes).put("DIB ".getBytes)
    buf.putInt(0).putShort(0).putShort(0).putInt(0)                // flags, prio, lang, init
    buf.putInt(1).putInt(10).putInt(0).putInt(nf)                  // scale, rate, start, length
    buf.putInt(frameBytes).putInt(-1).putInt(0)                    // bufsize, quality, samplesize
    buf.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    buf.put("strf".getBytes).putInt(40)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)    // BITMAPINFOHEADER
    buf.putInt(0).putInt(frameBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    buf.put("LIST".getBytes).putInt(moviSize).put("movi".getBytes)
    var f = 0
    while (f < nf) {
      buf.put("00db".getBytes).putInt(frameBytes)
      var r = 0
      while (r < h) {
        val y = h - 1 - r // bottom-up storage
        var x = 0
        while (x < w) {
          val v = aviPixel(m, f, x, y).toByte
          buf.put(v).put(v).put(v)
          x += 1
        }
        var p = w * 3
        while (p < stride) { buf.put(0.toByte); p += 1 }
        r += 1
      }
      f += 1
    }
    buf.array()
  }

  /** Mono PCM16 WAV, 129 samples of [[sample]] at [[sampleRate]]. */
  def wav(m: Long): Array[Byte] = {
    val sr = sampleRate(m)
    val n = WavSamples
    val buf = ByteBuffer.allocate(44 + n * 2).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + n * 2).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
    buf.putShort(1).putShort(1).putInt(sr).putInt(sr * 2).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(n * 2)
    var i = 0
    while (i < n) { buf.putShort(sample(m, i).toShort); i += 1 }
    buf.array()
  }
}
