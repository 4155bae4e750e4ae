package graft.functions

/** Dependency-free decoders for multimodal payloads.
  *
  * Images decode through two real paths: a hand-rolled 24-bit BMP parser
  * (pure byte layout, no allocation beyond the stats — the fast path) and
  * the JDK's own `javax.imageio.ImageIO`, which ships with every JVM and
  * handles JPEG/PNG/GIF/BMP ([[imageIoFeatures]]). Audio decodes PCM16
  * WAV. Animated-GIF frames decode individually ([[gifFrameFeatures]]),
  * which makes frame sampling end-to-end real for that one container;
  * all other video remains a stub upstream — no codec exists in a bare
  * JVM.
  *
  * All parsers are defensive: any structural violation returns None
  * rather than throwing, because at 100 TB a corrupt payload must
  * degrade to the fallback path, never kill the task.
  */
object MediaCodec {

  // ImageIO's default read path spills to a temp-file cache per call;
  // executor-local decode wants pure in-memory streams.
  javax.imageio.ImageIO.setUseCache(false)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** 24-bit uncompressed BMP -> 8 features:
    * [width, height, aspect, meanB, meanG, meanR, meanLuma, stdLuma]
    * (channel means in 0-255, luma = (b+g+r)/3). Handles 4-byte row
    * padding and both bottom-up (height > 0) and top-down (height < 0)
    * pixel orders — order doesn't change channel statistics, but the
    * parser must still walk the rows correctly to skip padding. */
  def bmpFeatures(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = le32(bytes, 10)
    val width = le32(bytes, 18)
    val rawHeight = le32(bytes, 22)
    val height = math.abs(rawHeight)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    // height <= 0 also rejects abs(Int.MinValue); Long row stride: a
    // crafted width near Int.MaxValue/3 wraps `width * 3` negative in
    // Int and would slip past the bounds check below
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0) return None
    val rowStrideL = (width.toLong * 3 + 3) / 4 * 4
    if (dataOffset < 0 || dataOffset.toLong + rowStrideL * height > bytes.length)
      return None
    val rowStride = rowStrideL.toInt // fits: rowStrideL * height <= bytes.length
    var (sb, sg, sr) = (0.0, 0.0, 0.0)
    var sl, sl2 = 0.0
    var row = 0
    while (row < height) {
      var cx = 0
      val base = dataOffset + row * rowStride
      while (cx < width) {
        val o = base + cx * 3
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        sb += b; sg += g; sr += r
        val luma = (b + g + r) / 3.0
        sl += luma; sl2 += luma * luma
        cx += 1
      }
      row += 1
    }
    val n = width.toDouble * height
    val meanL = sl / n
    val varL = math.max(0.0, sl2 / n - meanL * meanL)
    Some(Array(
      width.toFloat, height.toFloat, (width.toDouble / height).toFloat,
      (sb / n).toFloat, (sg / n).toFloat, (sr / n).toFloat,
      meanL.toFloat, math.sqrt(varL).toFloat))
  }

  /** JPEG/PNG/GIF/BMP via the JDK's bundled ImageIO readers -> the same
    * 8 features as [[bmpFeatures]]:
    * [width, height, aspect, meanB, meanG, meanR, meanLuma, stdLuma]
    * (channel means in 0-255, luma = (b+g+r)/3, alpha ignored). Pixels
    * are normalized to packed sRGB via getRGB so grayscale/palette/CMYK
    * color models all land in the same feature space. Returns None for
    * bytes no installed reader recognizes or any decoder failure. */
  def imageIoFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(rgbFeatures(img))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The shared 8-stat extraction over a decoded image:
    * [width, height, aspect, meanB, meanG, meanR, meanLuma, stdLuma]. */
  private def rgbFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var (sb, sg, sr) = (0.0, 0.0, 0.0)
    var sl, sl2 = 0.0
    var y = 0
    // row-at-a-time getRGB: one int[] per row, not per image — bounded
    // memory even for pathologically tall payloads
    val row = new Array[Int](w)
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val px = row(x)
        val r = (px >> 16) & 0xff
        val g = (px >> 8) & 0xff
        val b = px & 0xff
        sb += b; sg += g; sr += r
        val luma = (b + g + r) / 3.0
        sl += luma; sl2 += luma * luma
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * h
    val meanL = sl / n
    val varL = math.max(0.0, sl2 / n - meanL * meanL)
    Array(
      w.toFloat, h.toFloat, (w.toDouble / h).toFloat,
      (sb / n).toFloat, (sg / n).toFloat, (sr / n).toFloat,
      meanL.toFloat, math.sqrt(varL).toFloat)
  }

  /** Animated-GIF frame sampling — the one video-ish container a bare
    * JVM decodes for real: ImageIO's bundled GIF reader exposes every
    * frame via `ImageReader.read(frameIdx)`. Returns every `stride`-th
    * frame's index with the same 8 stats as [[imageIoFeatures]]. ONE
    * reader init per payload (not per frame). Frames are decoded as
    * stored — no disposal-method compositing — so the stats are
    * deterministic per-frame raster statistics. None if the payload is
    * not a GIF or any decode step fails. */
  def gifFrameFeatures(bytes: Array[Byte], stride: Int): Option[Seq[(Int, Array[Float])]] = {
    if (stride <= 0 || bytes.length < 6 ||
        bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F') return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        // seekForwardOnly=false: frame count needs a full scan first
        reader.setInput(iis, false, true)
        try {
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n by stride).map(i => i -> rgbFeatures(reader.read(i))))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode a 24-bit BMP and resize NEAREST-NEIGHBOR to (tw, th),
    * returning the same 8 stats as [[bmpFeatures]] computed over the
    * TARGET raster: [tw, th, tw/th, meanB, meanG, meanR, meanLuma,
    * stdLuma]. Sampling is in IMAGE coordinates — src(x,y) =
    * ((x*w)/tw, (y*h)/th), integer floor — with the bottom-up/top-down
    * storage flip handled here, so the sampled pixel set is
    * layout-independent. The resize itself is pure integer index math:
    * deterministic, oracle-replayable, and the physical shape a real
    * pipeline runs next to decode in the partition loop. */
  def bmpResizeFeatures(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Float]] = {
    if (tw <= 0 || th <= 0) return None
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = le32(bytes, 10)
    val width = le32(bytes, 18)
    val rawHeight = le32(bytes, 22)
    val height = math.abs(rawHeight)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    // height <= 0 also rejects abs(Int.MinValue); Long row stride: a
    // crafted width near Int.MaxValue/3 wraps `width * 3` negative in
    // Int and would slip past the bounds check below
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0) return None
    val rowStrideL = (width.toLong * 3 + 3) / 4 * 4
    if (dataOffset < 0 || dataOffset.toLong + rowStrideL * height > bytes.length)
      return None
    val rowStride = rowStrideL.toInt // fits: rowStrideL * height <= bytes.length
    var (sb, sg, sr) = (0.0, 0.0, 0.0)
    var sl, sl2 = 0.0
    var yo = 0
    while (yo < th) {
      val sy = (yo * height) / th // image row
      val r = if (rawHeight > 0) height - 1 - sy else sy
      val base = dataOffset + r * rowStride
      var xo = 0
      while (xo < tw) {
        val sx = (xo * width) / tw
        val o = base + sx * 3
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val rr = bytes(o + 2) & 0xff
        sb += b; sg += g; sr += rr
        val luma = (b + g + rr) / 3.0
        sl += luma; sl2 += luma * luma
        xo += 1
      }
      yo += 1
    }
    val n = tw.toDouble * th
    val meanL = sl / n
    val varL = math.max(0.0, sl2 / n - meanL * meanL)
    Some(Array(
      tw.toFloat, th.toFloat, (tw.toDouble / th).toFloat,
      (sb / n).toFloat, (sg / n).toFloat, (sr / n).toFloat,
      meanL.toFloat, math.sqrt(varL).toFloat))
  }

  /** Perceptual DIFFERENCE HASH of a 24-bit BMP — the classic dHash
    * image near-dup fingerprint: nearest-neighbor resize to a 9x8 gray
    * grid (same integer index mapping as [[bmpResizeFeatures]], flip
    * handled), then 64 bits b(x,y) = luma(x+1,y) > luma(x,y). Returned
    * as FOUR 16-bit band ints (band k = rows 2k..2k+1, bit (y%2)*8+x)
    * rather than one 64-bit word: the bands ARE the LSH blocking keys
    * downstream (two images within Hamming r share a band whenever the
    * flips don't spread across all four), and 16-bit ints dodge the
    * sign-bit gymnastics a 64-bit hash would force on both engines.
    * Luma = (b+g+r)/3 compared EXACTLY as doubles — deterministic,
    * oracle-replayable. */
  def bmpDHashBands(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = le32(bytes, 10)
    val width = le32(bytes, 18)
    val rawHeight = le32(bytes, 22)
    val height = math.abs(rawHeight)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    // height <= 0 also rejects abs(Int.MinValue); Long row stride: a
    // crafted width near Int.MaxValue/3 wraps `width * 3` negative in
    // Int and would slip past the bounds check below
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0) return None
    val rowStrideL = (width.toLong * 3 + 3) / 4 * 4
    if (dataOffset < 0 || dataOffset.toLong + rowStrideL * height > bytes.length)
      return None
    val rowStride = rowStrideL.toInt // fits: rowStrideL * height <= bytes.length
    def luma(gx: Int, gy: Int): Double = {
      val sx = (gx * width) / 9
      val sy = (gy * height) / 8
      val r = if (rawHeight > 0) height - 1 - sy else sy
      val o = dataOffset + r * rowStride + sx * 3
      ((bytes(o) & 0xff) + (bytes(o + 1) & 0xff) + (bytes(o + 2) & 0xff)) / 3.0
    }
    val bands = new Array[Int](4)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y))
          bands(y / 2) |= 1 << ((y % 2) * 8 + x)
        x += 1
      }
      y += 1
    }
    Some(bands)
  }

  /** PCM16 WAV windowed segmentation — the VAD-ish per-window shape a
    * training-data pipeline runs over audio: consecutive FULL windows
    * of `win` samples (the ragged tail is dropped), each yielding
    * [win, rms (of full-scale), meanAbs (of full-scale), crossings]
    * — crossings stays a COUNT (no division: a /(win-1) would make the
    * value float-division-order sensitive across engines). None for
    * anything [[wavFeatures]] would reject. */
  def wavWindowFeatures(bytes: Array[Byte], win: Int): Option[Seq[(Int, Array[Float])]] = {
    if (win <= 1) return None
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    var off = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(bytes, off + 4)
      // Long: `off + 8 + size` wraps negative in Int for sizes near
      // Int.MaxValue and would slip past this check
      if (size < 0 || off.toLong + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          if (le16(bytes, off + 8) != 1) return None
          channels = le16(bytes, off + 10)
          sampleRate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
        case "data" =>
          dataOff = off + 8
          dataLen = size
        case _ => ()
      }
      val next = off.toLong + 8 + size + (size & 1) // chunks are word-aligned
      if (next > Int.MaxValue) return None
      off = next.toInt
    }
    if (sampleRate <= 0 || channels <= 0 || bits != 16 || dataOff < 0) return None
    val nSamples = dataLen / 2
    val nWin = nSamples / win
    if (nWin == 0) return None
    Some((0 until nWin).map { wi =>
      var i = 0
      var sum2 = 0.0
      var sumAbs = 0.0
      var crossings = 0
      var prev = 0
      while (i < win) {
        val s = le16(bytes, dataOff + (wi * win + i) * 2).toShort.toInt
        sum2 += s.toDouble * s
        sumAbs += math.abs(s)
        if (i > 0 && ((s >= 0) != (prev >= 0))) crossings += 1
        prev = s
        i += 1
      }
      wi -> Array(
        win.toFloat,
        (math.sqrt(sum2 / win) / 32768.0).toFloat,
        (sumAbs / win / 32768.0).toFloat,
        crossings.toFloat)
    })
  }

  /** RIFF/AVI with UNCOMPRESSED 24-bit DIB video frames ('00db'/'00dc'
    * chunks, biCompression = 0) — a real video container whose frames
    * are a pure byte layout, so decode needs no codec at all: the
    * BITMAPINFOHEADER comes from the first 'vids' stream's strf, each
    * movi chunk is one bottom-up padded-row frame. Returns every
    * `stride`-th frame's index with the same 8 stats as
    * [[bmpFeatures]]. None on any structural violation, unknown
    * compression, or frame-size mismatch — never throws, never guesses.
    */
  def aviDibFrameFeatures(bytes: Array[Byte], stride: Int): Option[Seq[(Int, Array[Float])]] = {
    if (stride <= 0 || bytes.length < 24) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '))
      return None
    def fourcc(o: Int) =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var width = 0
    var height = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (off, len)
    // walk LIST trees; only hdrl (for strf) and movi (for frames) matter
    def walk(from: Int, to: Int): Boolean = {
      var off = from
      while (off + 8 <= to) {
        val id = fourcc(off)
        val size = le32(bytes, off + 4)
        // Long: Int `off + 8 + size` wraps negative for huge sizes
        if (size < 0 || off.toLong + 8 + size > to) return false
        if (id == "LIST") {
          if (size < 4) return false
          if (!walk(off + 12, off + 8 + size)) return false
        } else if (id == "strf" && width == 0 && size >= 40) {
          val o = off + 8
          val bpp = le16(bytes, o + 14)
          val compression = le32(bytes, o + 16)
          if (bpp != 24 || compression != 0) return false
          width = le32(bytes, o + 4)
          height = math.abs(le32(bytes, o + 8))
        } else if (id.endsWith("db") || id.endsWith("dc")) {
          frames += ((off + 8, size))
        }
        val next = off.toLong + 8 + size + (size & 1) // word-aligned
        if (next > Int.MaxValue) return false
        off = next.toInt
      }
      true
    }
    if (!walk(12, bytes.length)) return None
    if (width <= 0 || height <= 0 || frames.isEmpty) return None
    // Long: a crafted strf width wraps `width * 3` negative in Int
    val rowStrideL = (width.toLong * 3 + 3) / 4 * 4
    if (frames.exists(_._2.toLong != rowStrideL * height)) return None
    val rowStride = rowStrideL.toInt // fits: equals a validated chunk size
    try {
      Some((0 until frames.length by stride).map { i =>
        val (base, _) = frames(i)
        var (sb, sg, sr) = (0.0, 0.0, 0.0)
        var sl, sl2 = 0.0
        var row = 0
        while (row < height) {
          var cx = 0
          val ro = base + row * rowStride
          while (cx < width) {
            val o = ro + cx * 3
            val b = bytes(o) & 0xff
            val g = bytes(o + 1) & 0xff
            val r = bytes(o + 2) & 0xff
            sb += b; sg += g; sr += r
            val luma = (b + g + r) / 3.0
            sl += luma; sl2 += luma * luma
            cx += 1
          }
          row += 1
        }
        val n = width.toDouble * height
        val meanL = sl / n
        val varL = math.max(0.0, sl2 / n - meanL * meanL)
        i -> Array(
          width.toFloat, height.toFloat, (width.toDouble / height).toFloat,
          (sb / n).toFloat, (sg / n).toFloat, (sr / n).toFloat,
          meanL.toFloat, math.sqrt(varL).toFloat)
      })
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** RIFF/WAVE PCM16 -> 4 features:
    * [sample_rate, duration_sec, rms (of full-scale), zero_cross_rate]
    * over the interleaved sample stream (channel-agnostic statistics). */
  def wavFeatures(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    var off = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(bytes, off + 4)
      // Long: Int `off + 8 + size` wraps negative for huge sizes
      if (size < 0 || off.toLong + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val fmt = le16(bytes, off + 8)
          if (fmt != 1) return None // PCM only
          channels = le16(bytes, off + 10)
          sampleRate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
        case "data" =>
          dataOff = off + 8
          dataLen = size
        case _ => ()
      }
      val next = off.toLong + 8 + size + (size & 1) // word-aligned
      if (next > Int.MaxValue) return None
      off = next.toInt
    }
    if (sampleRate <= 0 || channels <= 0 || bits != 16 || dataOff < 0) return None
    val nSamples = dataLen / 2
    if (nSamples == 0) return None
    var i = 0
    var sum2 = 0.0
    var crossings = 0
    var prev = 0
    while (i < nSamples) {
      val s = le16(bytes, dataOff + i * 2).toShort.toInt
      sum2 += s.toDouble * s
      if (i > 0 && ((s >= 0) != (prev >= 0))) crossings += 1
      prev = s
      i += 1
    }
    val framesPerChannel = nSamples.toDouble / channels
    Some(Array(
      sampleRate.toFloat,
      (framesPerChannel / sampleRate).toFloat,
      (math.sqrt(sum2 / nSamples) / 32768.0).toFloat,
      if (nSamples > 1) crossings.toFloat / (nSamples - 1) else 0f))
  }
}
