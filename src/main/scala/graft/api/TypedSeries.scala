package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset facade (SURVEY.md §1.4 / §4.3): a case-class view of the
  * coin_history table for callers that want compile-time safety, plus the
  * optional Aggregator form of the risk classifier — the window-algebra
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

  /** Aggregator over the per-bucket step sequence: buffers the ordered
    * pct-change steps... except it doesn't buffer at all — because the
    * classifier only needs adjacent PAIRS, the reduce keeps (prevStep,
    * runningMin), O(1) state per group. This is the point of the typed
    * Aggregator form: custom state shape that no built-in agg has. */
  class TwoDayMin extends Aggregator[Double, (Option[Double], Option[Double]), Option[Double]] {
    type Buf = (Option[Double], Option[Double]) // (prev step, min two-day)
    override def zero: Buf = (None, None)
    override def reduce(b: Buf, step: Double): Buf = {
      val (prev, mn) = b
      val two = prev match {
        case Some(p) if p < 0 && step < 0 =>
          Some(((1 + p / 100) * (1 + step / 100) - 1) * 100)
        case _ => None
      }
      (Some(step), (mn ++ two).reduceOption((a, b) => math.min(a, b)))
    }
    // Merge is only sound for sequential per-group folds (mapGroups
    // path); the pairwise semantics are order-dependent by definition.
    override def merge(a: Buf, b: Buf): Buf =
      (b._1.orElse(a._1), (a._2 ++ b._2).reduceOption((x, y) => math.min(x, y)))
    override def finish(r: Buf): Option[Double] = r._2
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Option[Double]] =
      Encoders.product[Tuple1[Option[Double]]].asInstanceOf[Encoder[Option[Double]]]
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
