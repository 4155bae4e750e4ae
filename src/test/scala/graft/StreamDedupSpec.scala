package graft

import graft.streaming.StreamDedup
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Watermark-bounded streaming dedup: first occurrence emitted, duplicates
  * within the watermark window dropped (within AND across micro-batches),
  * state expired by the advancing watermark so a late recurrence re-emits. */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("dedups within watermark, re-emits after state expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = StreamDedup.withinWatermark(
      in.toDF().toDF("id", "ts"), "ts", "10 minutes", Seq("id"))
    val ckpt = Files.createTempDirectory("graft_sdd_").toString
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("sdd_out")
      .option("checkpointLocation", ckpt + "/ckpt").start()

    // same-batch duplicate (id 1) + distinct keys
    in.addData((1L, t("2024-01-01 00:00:00")), (1L, t("2024-01-01 00:01:00")),
      (2L, t("2024-01-01 00:00:30")))
    q.processAllAvailable()
    // cross-batch duplicate within the 10-minute window -> dropped
    in.addData((1L, t("2024-01-01 00:02:00")), (3L, t("2024-01-01 00:03:00")))
    q.processAllAvailable()
    // advance the watermark far past id 1's state, then recur id 1:
    // the fingerprint has expired, so the recurrence is a NEW first
    in.addData((9L, t("2024-01-01 02:00:00")))
    q.processAllAvailable()
    in.addData((1L, t("2024-01-01 01:55:00")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sdd_out").as[(Long, java.sql.Timestamp)]
      .collect().groupBy(_._1).view.mapValues(_.length).toMap
    assert(got(2L) == 1 && got(3L) == 1 && got(9L) == 1)
    assert(got(1L) == 2, s"id 1 should emit once per state lifetime, got $got")
  }
}
