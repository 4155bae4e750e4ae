package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Stream-stream interval join (§2.F completeness): clicks joined to
  * purchases on key within a 1-hour event-time window, both sides
  * watermarked so the join state is bounded — the property that keeps an
  * unbounded two-stream join runnable at scale (state holds only rows
  * younger than watermark + interval, not the whole history). */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("interval join matches within the window and bounds state via watermarks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val c = clicks.toDF().toDF("c_ad", "click_time")
      .withWatermark("click_time", "2 hours")
    val p = purchases.toDF().toDF("p_ad", "purchase_time")
      .withWatermark("purchase_time", "2 hours")
    val joined = c.join(p,
      col("c_ad") === col("p_ad") &&
        col("purchase_time") >= col("click_time") &&
        col("purchase_time") <= col("click_time") + expr("interval 1 hour"))
      .select(col("c_ad").as("ad"),
        col("click_time").cast("string").as("ct"),
        col("purchase_time").cast("string").as("pt"))
    val ckpt = Files.createTempDirectory("graft_ssj_").toString
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .option("checkpointLocation", ckpt + "/ckpt").start()

    clicks.addData((1L, t("2024-01-01 00:00:00")), (2L, t("2024-01-01 00:10:00")))
    purchases.addData(
      (1L, t("2024-01-01 00:30:00")), // inside the 1 h window -> match
      (1L, t("2024-01-01 02:30:00")), // outside -> dropped
      (3L, t("2024-01-01 00:20:00"))) // no click -> dropped (inner)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj_out")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "2024-01-01 00:00:00", "2024-01-01 00:30:00")))
  }

  test("stream-static broadcast enrichment joins each micro-batch against the dim") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // static dim joins stateless per micro-batch (no watermark needed):
    // the canonical "enrich the event stream with a dimension" shape,
    // broadcast so the stream side never shuffles
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("tier_id", "tier")
    val events = MemoryStream[(Long, Long)]
    val enriched = events.toDF().toDF("event_id", "tier_id")
      .join(broadcast(dim), Seq("tier_id"), "left")
    val ckpt = Files.createTempDirectory("graft_ssd2_").toString
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .option("checkpointLocation", ckpt + "/ckpt").start()
    events.addData((100L, 1L), (101L, 2L), (102L, 9L)) // 9 -> no dim row
    q.processAllAvailable()
    events.addData((103L, 1L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out")
      .select("event_id", "tier")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set(
      (100L, Some("gold")), (101L, Some("silver")),
      (102L, None), (103L, Some("gold"))))
  }
}
