package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental SCD2 maintenance ([[graft.operators.Scd2Index]]):
  * maintained == one-shot [[graft.operators.Scd2.intervals]] across
  * random time-split batches (including batches that EXTEND the open
  * run vs CLOSE it — the two merge cases), a mid-stream compact, an
  * empty batch, and the out-of-order refusal. The DuckDB gate (q209
  * vs q192's oracle verbatim) certifies the same equality engine-vs-
  * engine at sf0.01; here the batch boundaries are adversarial.
  */
class Scd2IndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }

  private def root(tag: String): String = {
    val p = Q.scratch(spark, s"scd2idx_$tag", "spec")
    rm(new java.io.File(p)); p
  }

  // events: (k, tie, us, attr) — runs engineered so batch splits land
  // mid-run (extend case) and on run boundaries (close case)
  private def corpus(seed: Int, nKeys: Int, nPerKey: Int) = {
    val rnd = new scala.util.Random(seed)
    (for {
      k <- 0 until nKeys
      i <- 0 until nPerKey
    } yield {
      val us = i * 1000L + k // unique per key, shared order across keys
      (k.toLong, (k * nPerKey + i).toLong, us, rnd.nextInt(3))
    }).toDF("k", "tie", "us", "attr")
  }

  private def oneShot(df: org.apache.spark.sql.DataFrame) =
    graft.operators.Scd2.intervals(df, "k", "us", "tie", "attr",
        fromName = "valid_from_us", toName = "valid_to_us")
      .select("k", "island", "attr", "valid_from_us", "valid_to_us",
        "is_current", "n_events")
      .as[(Long, Long, Int, Long, Option[Long], Boolean, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  private def maintained(r: String) =
    graft.operators.Scd2Index.intervals(spark, r)
      .as[(Long, Long, Int, Long, Option[Long], Boolean, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("maintained == one-shot across random time-split batches + compacts") {
    for (seed <- 1 to 3) {
      val ev = corpus(seed, nKeys = 7, nPerKey = 40).cache()
      val r = root(s"rand$seed")
      // 4 waves at random time cuts; compact after wave 2
      val rnd = new scala.util.Random(seed * 17)
      val cuts = Seq.fill(3)(rnd.nextInt(39000).toLong).sorted
      val waves = Seq(
        ev.where(col("us") <= cuts(0)),
        ev.where(col("us") > cuts(0) && col("us") <= cuts(1)),
        ev.where(col("us") > cuts(1) && col("us") <= cuts(2)),
        ev.where(col("us") > cuts(2)))
      waves.zipWithIndex.foreach { case (w, i) =>
        graft.operators.Scd2Index.appendBatch(spark, w, r, i + 1)
        if (i == 1) graft.operators.Scd2Index.compact(spark, r)
      }
      assert(maintained(r) == oneShot(ev), s"seed $seed")
      ev.unpersist()
    }
  }

  test("empty batch is a no-op; replay of a committed batch passes the guard") {
    val ev = corpus(9, nKeys = 3, nPerKey = 10).cache()
    val r = root("replay")
    val w1 = ev.where(col("us") <= 4000L)
    val w2 = ev.where(col("us") > 4000L)
    graft.operators.Scd2Index.appendBatch(spark, w1, r, 1)
    graft.operators.Scd2Index.appendBatch(spark, ev.where(lit(false)), r, 2)
    graft.operators.Scd2Index.appendBatch(spark, w2, r, 3)
    // checkpoint replay: batch 3 re-appends identically and must PASS
    // the horizon guard (its own delta is excluded from the check)
    graft.operators.Scd2Index.appendBatch(spark, w2, r, 3)
    assert(maintained(r) == oneShot(ev))
    ev.unpersist()
  }

  test("out-of-order append is refused loudly, not silently corrupted") {
    val ev = corpus(5, nKeys = 3, nPerKey = 10).cache()
    val r = root("ooo")
    graft.operators.Scd2Index.appendBatch(spark, ev.where(col("us") > 4000L), r, 1)
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Scd2Index.appendBatch(
        spark, ev.where(col("us") <= 4000L), r, 2)
    }
    assert(ex.getMessage.contains("out-of-order"))
    ev.unpersist()
  }
}
