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
