package graft

import graft.plans.RewriteDotProduct
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

/** The HOF-fold -> DotProductF optimizer rule: fires on the exact float
  * pattern, leaves non-float folds alone, and preserves values bit-for-
  * bit (same sequential fold order). Inputs derive from range(id) so
  * constant folding cannot collapse the plan before the rule can act. */
class RewriteDotProductSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    if (!s.experimental.extraOptimizations.contains(RewriteDotProduct))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RewriteDotProduct
    s
  }

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0.0 as double), (acc, v) -> acc + v)"

  private def floatDf = spark.range(1).select(
    expr("array(cast(1.0 as float), cast(2.0 as float), cast(id as float))").as("a"),
    expr("array(cast(4.0 as float), cast(5.0 as float), cast(6.0 as float))").as("b"))

  test("float-vector HOF fold is rewritten to dot_product_f") {
    val df = floatDf.selectExpr(s"$hof AS dot")
    assert(df.queryExecution.optimizedPlan.toString.contains("dot_product_f"),
      s"rule did not fire:\n${df.queryExecution.optimizedPlan}")
    assert(df.head.getDouble(0) == 14.0) // 1*4 + 2*5 + 0*6
  }

  test("non-float arrays are left on the interpreted path") {
    val df = spark.range(1).select(
      expr("array(1, 2, cast(id as int))").as("a"),
      expr("array(3, 4, 5)").as("b"))
      .selectExpr(s"$hof AS dot")
    assert(!df.queryExecution.optimizedPlan.toString.contains("dot_product_f"))
    assert(df.head.getDouble(0) == 11.0)
  }

  test("rewrite matches the codegen'd result bit-for-bit on awkward values") {
    // catastrophic-cancellation values make any fold-order difference
    // visible in the result bits
    val arrays =
      ("array(cast(0.1 as float), cast(1e30 as float), cast(-1e30 as float), cast(id + 3.3 as float))",
        "array(cast(7.7 as float), cast(1.0 as float), cast(1.0 as float), cast(-0.3 as float))")
    def base = spark.range(1).select(
      expr(arrays._1).as("a"), expr(arrays._2).as("b"))
    val viaRule = base.selectExpr(s"$hof AS dot").head.getDouble(0)
    val direct = base.select(graft.functions.DotProductF.dot(
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b")).as("dot")).head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(viaRule) ==
      java.lang.Double.doubleToLongBits(direct))
  }
}
