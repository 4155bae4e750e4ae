package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def media() = {
    val rows = Seq(
      Row(1L, "image", Array.fill[Byte](64)(3), Row(640, 480, null, null)),
      Row(2L, "image", Array.fill[Byte](32)(7), Row(200, 100, null, null)),
      Row(3L, "audio", Array.fill[Byte](128)(1), Row(null, null, 16000, null)),
      Row(4L, "video", Array.fill[Byte](256)(9), Row(1920, 1080, null, 10)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("extractFeatures is deterministic with per-kind dimensions") {
    val got1 = Multimodal.extractFeatures(spark, media()).collect()
      .map(m => m.media_id -> (m.dim, m.features.toSeq)).toMap
    val got2 = Multimodal.extractFeatures(spark, media()).collect()
      .map(m => m.media_id -> (m.dim, m.features.toSeq)).toMap
    assert(got1 == got2, "stub decode must be deterministic")
    assert(got1(1L)._1 == 8 && got1(3L)._1 == 4 && got1(4L)._1 == 16)
    assert(got1.values.forall { case (d, f) => f.size == d })
  }

  test("sampleFrames generates strided indices from metadata") {
    val got = Multimodal.sampleFrames(media(), 3)
      .orderBy("frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((4L, 0), (4L, 3), (4L, 6), (4L, 9)))
  }

  /** A real animated GIF built with the JDK's own GIF writer: one solid
    * color per frame, so per-frame channel stats are hand-computable. */
  private def animatedGif(colors: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(c))
      g.fillRect(0, 0, w, h)
      g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  private val redGreenBlue = Seq(0xff0000, 0x00ff00, 0x0000ff)

  test("gifFrameFeatures decodes every frame of an animated GIF with exact stats") {
    val gif = animatedGif(redGreenBlue, 4, 2)
    val frames = graft.functions.MediaCodec.gifFrameFeatures(gif, 1).get
    assert(frames.map(_._1) == Seq(0, 1, 2))
    // solid frames: [w=4, h=2, aspect=2, meanB, meanG, meanR, luma=85, std=0]
    val expected = Seq(
      (0f, 0f, 255f), // red
      (0f, 255f, 0f), // green
      (255f, 0f, 0f)) // blue
    frames.zip(expected).foreach { case ((idx, f), (b, g, r)) =>
      assert(f(0) == 4f && f(1) == 2f && f(2) == 2f, s"frame $idx dims")
      assert(f(3) == b && f(4) == g && f(5) == r, s"frame $idx channels: ${f.toSeq}")
      assert(math.abs(f(6) - 85f) < 1e-4 && f(7) == 0f, s"frame $idx luma")
    }
  }

  test("gifFrameFeatures honors stride and rejects non-GIF bytes") {
    val gif = animatedGif(redGreenBlue, 4, 2)
    assert(graft.functions.MediaCodec.gifFrameFeatures(gif, 2).get.map(_._1) == Seq(0, 2))
    assert(graft.functions.MediaCodec.gifFrameFeatures(Array.fill[Byte](64)(9), 1).isEmpty)
  }

  test("sampleFrameFeatures really decodes GIF video frames and stubs the rest") {
    val gif = animatedGif(redGreenBlue, 4, 2)
    val rows = Seq(
      Row(10L, "video", gif, Row(4, 2, null, 3)),
      Row(11L, "video", Array.fill[Byte](256)(9), Row(1920, 1080, null, 4)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val got = Multimodal.sampleFrameFeatures(spark, df, 2).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    // GIF row: frames 0 and 2 really decoded — red then blue
    assert(got.keySet == Set((10L, 0), (10L, 2), (11L, 0), (11L, 2)))
    assert(got((10L, 0)).decoded && got((10L, 2)).decoded)
    assert(got((10L, 0)).features.toSeq.take(6) == Seq(4f, 2f, 2f, 0f, 0f, 255f))
    assert(got((10L, 2)).features.toSeq.take(6) == Seq(4f, 2f, 2f, 255f, 0f, 0f))
    // junk payload: metadata-driven indices, stub features, flagged as such
    assert(!got((11L, 0)).decoded && !got((11L, 2)).decoded)
    assert(got((11L, 0)).features.length == 8)
  }

  test("planResize preserves aspect and never upscales") {
    val got = Multimodal.planResize(media(), 320)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got(1L) == ((320, 240)))
    assert(got(2L) == ((200, 100)), "small image untouched")
  }

  test("repartitionBySize spreads payload volume") {
    val df = Multimodal.repartitionBySize(media(), targetBytes = 100)
    assert(df.rdd.getNumPartitions >= 2)
    assert(df.count() == 4)
  }
}
