package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed Dataset facade (SURVEY.md §1.4 / §4.3): a case-class view of the
  * coin_history table for callers that want compile-time safety, plus the
  * typed-fold form of the risk classifier — the window-algebra
  * version in CryptoQueries remains the primary, golden-tested one; this
  * is the Dataset-API showcase with identical threshold semantics.
  */
object TypedSeries {

  /** One (key, ordered-time, value) observation. */
  final case class Obs(key: String, t: java.sql.Timestamp, value: Double)

  /** Risk classification of one key-month bucket: minimum compound
    * two-consecutive-negative-step change, thresholded like the
    * reference (EDA.ipynb:1192-1226). */
  final case class RiskInput(key: String, bucket: String, steps: Seq[Double])

  /** Sequential fold over the per-bucket step sequence: because the
    * classifier only needs adjacent PAIRS, the fold keeps (prevStep,
    * runningMin) — O(1) state per group instead of buffering the series.
    *
    * Deliberately NOT a Spark `Aggregator`: adjacent-pair semantics are
    * order-dependent, so the shuffle-time `merge` an Aggregator must
    * provide has no sound implementation (partial buffers from different
    * partitions lose the pair that straddles the boundary). Exposing it
    * through `.toColumn` would therefore produce silently wrong results;
    * the only sound execution is a sequential per-group fold, which is
    * exactly how [[classifyRisk]] drives it inside mapGroups. */
  class TwoDayMin {
    type Buf = (Option[Double], Option[Double]) // (prev step, min two-day)
    def zero: Buf = (None, None)
    def reduce(b: Buf, step: Double): Buf = {
      val (prev, mn) = b
      val two = prev match {
        case Some(p) if p < 0 && step < 0 =>
          Some(((1 + p / 100) * (1 + step / 100) - 1) * 100)
        case _ => None
      }
      (Some(step), (mn ++ two).reduceOption((a, b) => math.min(a, b)))
    }
    def finish(r: Buf): Option[Double] = r._2
  }

  def riskLabel(minTwoDay: Option[Double]): String = minTwoDay match {
    case Some(m) if m <= -50 => "High Risk"
    case Some(m) if m <= -20 => "Medium Risk"
    case _                   => "Low Risk"
  }

  /** Typed pipeline: per (key, month), the ordered pct-change steps fold
    * through [[TwoDayMin]] sequentially via mapGroups (order guaranteed
    * by the explicit sortBy inside the group — small per-group data). */
  def classifyRisk(spark: SparkSession, obs: Dataset[Obs]): Dataset[(String, String, String)] = {
    import spark.implicits._
    obs.groupByKey(o => (o.key, o.t.toString.substring(0, 7)))
      .mapGroups { (k: (String, String), it: Iterator[Obs]) =>
        val sorted = it.toSeq.sortBy(_.t.getTime)
        val steps = sorted.sliding(2).collect {
          case Seq(a, b) if a.value > 0 => (b.value / a.value - 1) * 100
        }
        val agg = new TwoDayMin
        val buf = steps.foldLeft(agg.zero)(agg.reduce)
        (k._1, k._2, riskLabel(agg.finish(buf)))
      }
  }
}
