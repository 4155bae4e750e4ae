package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Auto-compaction policy ([[graft.operators.DeltaStore.maybeCompact]]
  * and the per-index wrappers): fires exactly when the committed delta
  * tail exceeds the threshold, drops the live delta count to zero
  * below the horizon, never folds a batch above the horizon (the
  * crashed-batch double-count hazard for additive folds), and leaves
  * the folded contents identical. The streaming gates (q216/q221/q225/
  * q227/q229) exercise the policy end-to-end; here the firing rule and
  * the horizon protection are pinned adversarially.
  */
class AutoCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("x", LongType), StructField("c", LongType)))

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }

  private def root(tag: String): String = {
    val p = Q.scratch(spark, s"autocompact_$tag", "spec")
    rm(new java.io.File(p)); p
  }

  private def cellsOf(r: String) =
    graft.operators.StatCellIndex.cells(spark, r, schema)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("policy fires iff the committed tail exceeds the threshold; count drops; contents unchanged") {
    val r = root("fire")
    val store = graft.operators.DeltaStore(r)
    val batch = (i: Int) => Seq.fill(3)(i.toLong).toDF("x")
    val fired = (0 until 5).map { k =>
      // batch-start policy check, then the batch's own append
      val f = graft.operators.StatCellIndex.maybeCompact(spark, r, schema,
        maxDeltas = 2, upTo = Some(k - 1))
      graft.operators.StatCellIndex.appendBatch(spark, batch(k), r, k, schema)
      f
    }
    // deltas below k: 0,1,2 at k=3 -> first firing; k=4 sees only
    // delta 3 live below it (1 <= 2) -> no fire
    assert(fired == Seq(false, false, false, true, false))
    assert(store.deltaCount(Some(2)) == 0)
    assert(cellsOf(r) == (0 until 5).map(i => (i.toLong, 3L)))
  }

  test("the horizon never folds a not-yet-committed batch (additive double-count hazard)") {
    val r = root("horizon")
    (0 until 4).foreach { k =>
      graft.operators.StatCellIndex.appendBatch(spark,
        Seq.fill(2)(k.toLong).toDF("x"), r, k, schema)
    }
    val store = graft.operators.DeltaStore(r)
    // batch 3 is on disk but (by scenario) not checkpoint-committed:
    // policy at the start of its replay folds only deltas <= 2
    val fired = graft.operators.StatCellIndex.maybeCompact(spark, r, schema,
      maxDeltas = 0, upTo = Some(2))
    assert(fired)
    assert(store.deltaCount(Some(2)) == 0)
    assert(store.deltaCount(None) == 1, "batch 3's delta must stay live")
    assert(new java.io.File(r, "delta=3").isDirectory)
    // the replay now replaces its still-live delta — no double count
    graft.operators.StatCellIndex.appendBatch(spark,
      Seq.fill(2)(3L).toDF("x"), r, 3, schema)
    assert(cellsOf(r) == (0 until 4).map(i => (i.toLong, 2L)))
  }

  test("grouped-table policy (CcIndex wrapper) folds both tables at the horizon") {
    val r = root("grouped")
    val e0 = Seq(("a1", "a2"), ("b1", "b2")).toDF("a", "b")
    val e1 = Seq(("a2", "a3")).toDF("a", "b")
    val e2 = Seq(("b2", "b3")).toDF("a", "b")
    graft.operators.CcIndex.appendWave(spark, e0, r, 0)
    graft.operators.CcIndex.appendWave(spark, e1, r, 1)
    val fired = graft.operators.CcIndex.maybeCompact(spark, r,
      maxDeltas = 1, upTo = Some(1))
    assert(fired)
    assert(graft.operators.DeltaStore(r).deltaCount(None) == 0)
    assert(!graft.operators.CcIndex.maybeCompact(spark, r,
      maxDeltas = 1, upTo = Some(1)))
    graft.operators.CcIndex.appendWave(spark, e2, r, 2)
    val labs = graft.operators.CcIndex.labels(spark, r)
      .as[(String, String)].collect().toMap
    assert(labs("a3") == "a1" && labs("b3") == "b1")
  }
}
