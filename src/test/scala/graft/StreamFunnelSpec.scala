package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Why q210's maintained state is the stage-event CANDIDATE LOG and
  * not per-batch anchor frames: funnel anchors are NOT additive across
  * micro-batches. This spec constructs the counter-example — a later
  * batch delivers an EARLIER stage-1 event, which makes a stage-2
  * event an earlier batch already saw newly eligible — and shows (a)
  * the naive per-stage min-fold of per-batch anchors gets it wrong,
  * (b) the candidate-log state reproduces the one-shot funnel exactly
  * under random batch splits (set union is independent of batching).
  */
class StreamFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")
  private val gap = 1000L

  private def report(ev: DataFrame): Map[String, Long] =
    graft.operators.Funnel.report(ev, "u", "t", "us", stages, gap)
      .select("stage", "n_users").as[(String, Long)].collect().toMap

  test("anchors are not additive: a late earlier view re-qualifies an old click") {
    // user 1: click@5 then view@10 land in batch 1; batch 2 delivers
    // view@1. True funnel: t1=1, the click@5 is >= t1 and in gap →
    // stage 2 converts. Per-batch anchors: batch 1 has t1=10 (click@5
    // precedes it → no stage 2), batch 2 has no click — so ANY fold of
    // the per-batch anchor frames reports stage 2 empty.
    val b1 = Seq((1L, "click", 5L), (1L, "view", 10L)).toDF("u", "t", "us")
    val b2 = Seq((1L, "view", 1L)).toDF("u", "t", "us")
    val oneShot = report(b1.unionByName(b2))
    assert(oneShot("2_click") == 1L, s"true funnel converts stage 2: $oneShot")
    // the naive fold: per-stage MIN over each batch's anchor frames
    val naive = Seq(b1, b2).map(b =>
      graft.operators.Funnel.anchors(b, "u", "t", "us", stages, gap)
        .map(_.select(col("u"), col("t").as("anchor_t"))))
    val naiveStage2 = naive.map(_(1)).reduce(_ unionByName _)
      .groupBy("u").agg(min("anchor_t")).count()
    assert(naiveStage2 == 0L,
      "the per-batch anchor fold MUST miss the re-qualified click — " +
        "if this starts passing, the counter-example no longer bites")
    // the candidate log (what q210 maintains) is the union itself
    assert(report(b2.unionByName(b1)) == oneShot,
      "candidate-log state is batching-order-independent")
  }

  test("pruneCandidates: drops dead rows, never a live one — even under later appends") {
    // gap = 50. Wave 1, user 1: view@100 makes the current t1 = 100,
    // so the stage-2 bound is 150 and the stage-3 bound is 200. The
    // click@151 and purchase@249 are DEAD under any future append (t1
    // only decreases); click@30 and purchase@60 are below the current
    // t1 but must survive — wave 2's view@5 re-qualifies them. User 2
    // has no view yet, so nothing of theirs may be dropped.
    val w1 = Seq(
      (1L, "view", 100L), (1L, "click", 30L), (1L, "click", 149L),
      (1L, "click", 151L), (1L, "purchase", 60L), (1L, "purchase", 249L),
      (2L, "click", 999L)).toDF("u", "t", "us")
    val w2 = Seq((1L, "view", 5L), (2L, "view", 998L)).toDF("u", "t", "us")
    val pruned = graft.operators.Funnel.pruneCandidates(
      w1, "u", "t", "us", stages, maxGapUs = 50L)
    val keptRows = pruned.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(!keptRows.contains((1L, "click", 151L)) &&
      !keptRows.contains((1L, "purchase", 249L)),
      s"dead rows past t1 + (k-1)*gap must drop: $keptRows")
    assert(keptRows.contains((1L, "click", 30L)) &&
      keptRows.contains((1L, "purchase", 60L)),
      "rows before the current t1 must survive — a later view re-qualifies them")
    assert(keptRows.contains((2L, "click", 999L)),
      "users without a stage-1 anchor keep everything")
    // prune-then-append == one-shot over the full input
    def rep(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Funnel.report(df, "u", "t", "us", stages, 50L)
        .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(rep(pruned.unionByName(w2)) == rep(w1.unionByName(w2)))
    // user 1 converts all three stages post-append (5 -> 30 -> 60)
    assert(rep(w1.unionByName(w2))("3_purchase") == 1L)
    // idempotence: pruning the pruned+appended state changes nothing
    val again = graft.operators.Funnel.pruneCandidates(
      pruned.unionByName(w2), "u", "t", "us", stages, 50L)
    assert(rep(again) == rep(w1.unionByName(w2)))
  }

  test("in-loop prune folds: state stays bounded under the unpruned log, report == one-shot") {
    // The q210 deployment shape: EVERY micro-batch folds
    // prune(state ∪ batch) — not one prune at report time. Legal
    // because pruned rows are dead under every future append, so
    // pruning pruned state loses nothing. Asserted per batch: the
    // folded state never exceeds the unpruned accumulated log, ends
    // strictly smaller (the compaction actually compacts), and the
    // final report equals the one-shot funnel.
    val rnd = new scala.util.Random(31)
    val types = Seq("view", "click", "purchase", "error")
    val ev = (1 to 600).map { i =>
      (rnd.nextInt(15).toLong, types(rnd.nextInt(types.length)),
        rnd.nextInt(4000).toLong)
    }.toDF("u", "t", "us")
    val oneShot = report(ev)
    val bucket = pmod(col("us") * 7 + col("u"), lit(4))
    val batches = (0 until 4).map(p =>
      ev.where(bucket === p && col("t").isin(stages: _*)))
    var state = ev.limit(0).select("u", "t", "us")
    var rawCount = 0L
    batches.zipWithIndex.foreach { case (b, i) =>
      state = graft.operators.Funnel.pruneCandidates(
        state.unionByName(b.select("u", "t", "us")),
        "u", "t", "us", stages, gap).cache()
      rawCount += b.count()
      assert(state.count() <= rawCount,
        s"batch $i: folded state exceeds the unpruned log")
    }
    assert(state.count() < rawCount,
      "the in-loop prune never dropped a row — the bound is vacuous here")
    assert(report(state) == oneShot,
      "per-batch prune folds must preserve the one-shot report")
  }

  test("candidate-log state == one-shot funnel under random batch splits") {
    val rnd = new scala.util.Random(77)
    val types = Seq("view", "click", "purchase", "error")
    val ev = (1 to 400).map { i =>
      (rnd.nextInt(20).toLong, types(rnd.nextInt(types.length)),
        rnd.nextInt(5000).toLong)
    }.toDF("u", "t", "us")
    val oneShot = report(ev)
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(seed)
      val cut = r.nextInt(97) + 1
      // arbitrary (non-time-ordered!) 4-way partition — the state
      // contract is stronger than q209's append-order precondition
      val bucket = pmod(col("us") + cut, lit(4))
      val parts = (0 until 4).map(p => ev.where(bucket === p))
      val unioned = parts.reduce(_ unionByName _)
        .where(col("t").isin(stages: _*))
      assert(report(unioned) == oneShot, s"seed $seed")
    }
  }
}
