package graft

import graft.functions.DotProductF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd dot product must be BIT-identical to the sequential
  * higher-order-function fold it replaces (the DuckDB oracle evaluates
  * that fold), including on adversarial magnitudes where fold order
  * changes the low bits. */
class DotProductFSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0.0 as double), (acc, v) -> acc + v)"

  test("matches the sequential HOF fold bit-for-bit") {
    val rows = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.75f)),
      (Array(1e30f, 1.0f, -1e30f), Array(1.0f, 1.0f, 1.0f)), // order-sensitive
      (Array.tabulate(64)(i => (math.sin(i * 12.9898) * 10).toFloat),
        Array.tabulate(64)(i => (math.cos(i * 78.233) * 10).toFloat)),
      (Array.empty[Float], Array.empty[Float]))
    val df = rows.toDF("a", "b")
    val got = df.select(
      DotProductF.dot(col("a"), col("b")).as("fast"),
      expr(hof).as("ref"))
    got.collect().foreach { r =>
      val (fast, ref) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToRawLongBits(fast) ==
        java.lang.Double.doubleToRawLongBits(ref), s"$fast != $ref")
    }
  }

  test("null array yields null") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(DotProductF.dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("length mismatch yields null, matching zip_with null-padding") {
    // A malformed (short) vector must null out the same way the HOF
    // fold does — zip_with pads the shorter side with null, the null
    // poisons the product, then the running sum — so results cannot
    // depend on whether RewriteDotProduct replaced the expression.
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)),
      (Array.empty[Float], Array(1.0f))).toDF("a", "b")
    val got = df.select(
      DotProductF.dot(col("a"), col("b")).as("fast"), expr(hof).as("ref"))
    got.collect().foreach { r =>
      assert(r.isNullAt(0), "DotProductF must be null on length mismatch")
      assert(r.isNullAt(1), "HOF reference must be null on length mismatch")
    }
  }
}
