package graft

import org.apache.spark.sql.catalyst.expressions.{Abs, Length, LessThanOrEqual, Subtract}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LevenshteinLengthGuard optimizer rule: a levenshtein(a,b) <= k join
  * predicate gains the implied abs(length(a)-length(b)) <= k guard ahead
  * of it — exactly once (the rule must be idempotent inside the fixpoint
  * batch) — and results are unchanged. */
class LevenshteinGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fuzzyJoin = {
    val df = Seq("alpha", "alphb", "alphaa", "beta", "betamax").toDF("name")
    df.as("a").join(df.as("b"),
      col("a.name") < col("b.name") &&
        levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.name").as("x"), col("b.name").as("y"))
  }

  test("guard is injected into the optimized join condition exactly once") {
    val optimized = fuzzyJoin.queryExecution.optimizedPlan
    val guards = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.toSeq.flatMap(_.collect {
          case LessThanOrEqual(Abs(Subtract(Length(_), Length(_), _), _), _) => 1
        }).sum
    }.sum
    assert(guards == 1, s"expected exactly one length guard, found $guards in\n$optimized")
  }

  test("guarded join returns the same pairs as brute force") {
    val got = fuzzyJoin.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val names = Seq("alpha", "alphb", "alphaa", "beta", "betamax")
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val expect = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == expect && expect.nonEmpty)
  }
}
