package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.Event
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Stateful sessionization over a memory stream: gap merging inside a
  * session, gap break opening a new one, and watermark-driven timeout
  * emission of the final open session. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessions merge within gap, split at gap, and close via timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = Sessionize.sessions(mem.toDS(), gapMs = 10 * 60 * 1000, "0 seconds")
    val ckpt = Files.createTempDirectory("graft_sess_").toString
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .option("checkpointLocation", ckpt + "/ckpt").start()

    // key 1: three events within 10 min gaps (one session), then a 30 min
    // jump (second session); key 2 rides along to prove key isolation
    mem.addData(
      Event(1L, t("2024-01-01 00:00:00"), 1.0),
      Event(1L, t("2024-01-01 00:05:00"), 2.0),
      Event(2L, t("2024-01-01 00:00:00"), 5.0))
    q.processAllAvailable()
    mem.addData(
      Event(1L, t("2024-01-01 00:09:00"), 3.0),
      Event(1L, t("2024-01-01 00:40:00"), 4.0))
    q.processAllAvailable()
    // advance the watermark far past 00:40 + gap so every session times out
    mem.addData(Event(3L, t("2024-01-01 03:00:00"), 0.0))
    q.processAllAvailable()
    mem.addData(Event(3L, t("2024-01-01 06:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions_out")
      .select($"key", $"session_start".cast("string"), $"n_events", $"total_value")
      .as[(Long, String, Long, Double)].collect().toSet
    // key 1 session A: 3 events 00:00-00:09 totaling 6; session B: the
    // 00:40 singleton; key 2: its lone event
    assert(got.contains((1L, "2024-01-01 00:00:00", 3L, 6.0)), s"got $got")
    assert(got.contains((1L, "2024-01-01 00:40:00", 1L, 4.0)), s"got $got")
    assert(got.contains((2L, "2024-01-01 00:00:00", 1L, 5.0)), s"got $got")
  }
}
