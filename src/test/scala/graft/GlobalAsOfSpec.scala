package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KEYLESS (global) as-of — pandas `merge_asof` with no `by`. One
  * global right timeline, broadcast-only by design (a constant-key
  * sort-merge would collapse the left into one partition). Pins:
  *   - value parity vs a brute-force oracle across the direction ×
  *     tolerance × allowExactMatches matrix;
  *   - the plan shape: NO shuffle and NO sort of the left side — the
  *     whole point of the keyless broadcast form.
  */
class GlobalAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leftDf(rows: Seq[(Option[Int], Int)]): DataFrame =
    rows.toDF("t", "left_id")
  private def rightDf(rows: Seq[(Option[Int], Int)]): DataFrame =
    rows.toDF("rt", "p")

  private def run(direction: String, tol: Option[Long], exact: Boolean)
                 (l: DataFrame, r: DataFrame): Seq[(Option[Int], Int, Option[Int])] =
    AsOfJoin.asofGlobal(l, r, "t", "rt", Seq("p"),
      direction = direction, tolerance = tol, allowExactMatches = exact)
      .select(col("t"), col("left_id"), col("p"))
      .as[(Option[Int], Int, Option[Int])]
      .collect().sortBy(_._2).toSeq

  private def brute(direction: String, tol: Option[Long], exact: Boolean,
                    l: Seq[(Option[Int], Int)], r: Seq[(Option[Int], Int)])
      : Seq[(Option[Int], Int, Option[Int])] =
    l.map { case (t, id) =>
      val m = t match {
        case None =>
          // null left time (rights all non-null here): backward has
          // nothing at-or-before null; forward/nearest match the
          // earliest right — unless a tolerance bound is set, which a
          // null time can never satisfy
          if (tol.isDefined || direction == "backward") None
          else r.filter(_._1.isDefined).sortBy(_._1.get).headOption.map(_._2)
        case Some(lt) =>
        def inTol(d: Long) = tol.forall(d <= _)
        val back = r.filter(_._1.exists(rt =>
          (rt < lt || (exact && rt == lt)) && inTol(lt.toLong - rt)))
          .sortBy(_._1.get).lastOption
        val fwd = r.filter(_._1.exists(rt =>
          (rt > lt || (exact && rt == lt)) && inTol(rt.toLong - lt)))
          .sortBy(_._1.get).headOption
        direction match {
          case "backward" => back.map(_._2)
          case "forward" => fwd.map(_._2)
          case "nearest" => (back, fwd) match {
            case (Some(b), Some(f)) =>
              if (lt.toLong - b._1.get <= f._1.get.toLong - lt) Some(b._2)
              else Some(f._2)
            case (b, f) => b.orElse(f).map(_._2)
          }
        }
      }
      (t, id, m)
    }.sortBy(_._2)

  test("global as-of: direction x tolerance x allowExactMatches vs brute force") {
    for (seed <- 641 to 643) {
      val rnd = new scala.util.Random(seed)
      val l = Seq.tabulate(40)(i =>
        (if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(20)), i))
      val r = Seq.tabulate(12)(i =>
        (if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(20)), i))
        .groupBy(_._1).map(_._2.head).toSeq // dedup by time (global key)
      for (direction <- Seq("backward", "forward", "nearest");
           tol <- Seq(None, Some(3L));
           exact <- Seq(true, false)) {
        // the brute oracle above models non-null times only; null-time
        // corners are pinned per-formulation in Strict/ToleranceAsOfSpec
        val rNn = r.filter(_._1.isDefined)
        assert(run(direction, tol, exact)(leftDf(l), rightDf(rNn))
          == brute(direction, tol, exact, l, rNn),
          s"seed=$seed $direction tol=$tol exact=$exact")
      }
    }
  }

  test("global as-of plan: broadcast right, NO shuffle and NO sort of the left") {
    val l = leftDf(Seq.tabulate(10)(i => (Some(i), i)))
    val r = rightDf(Seq((Some(3), 30), (Some(7), 70)))
    val plan = AsOfJoin.asofGlobal(l, r, "t", "rt", Seq("p"))
      .queryExecution.executedPlan
    val txt = plan.toString
    assert(txt.contains("BroadcastAsOfJoin"), txt)
    assert(txt.contains("BroadcastExchange"), txt)
    // the only exchange is the broadcast one; the left is a pure map
    assert(!txt.contains("ShuffleExchange"), txt)
    assert(!txt.toLowerCase.contains("sortexec"), txt)
  }
}
