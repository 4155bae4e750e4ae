package graft

import graft.api.TypedSeries
import graft.api.TypedSeries.Obs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** API-surface coverage: SQL extension registration, CSV source/sink
  * round-trip (SURVEY.md O11), typed Dataset risk classifier. */
class ApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("GraftExtensions registers dot_product_f for SQL users") {
    // injection wiring is exercised against a fresh extensions container
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // register on the live session through the same injection the
    // extension performs (extensions bind at session build time)
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product_f")
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.DotProductF].getName, "dot_product_f"),
        GraftExtensions.buildDotProduct _)
    }
    val got = spark.sql(
      "SELECT dot_product_f(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float)))").head.getDouble(0)
    assert(got == 11.0)
  }

  test("bloom_might_contain_f is SQL-callable with a hex sketch literal") {
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_might_contain_f")
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.BloomMightContainF].getName, "bloom_might_contain_f"),
        GraftExtensions.buildBloomMightContain _)
    }
    val bloom = Seq("alpha", "beta").toDF("s").stat.bloomFilter("s", 64L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val hex = bos.toByteArray.map(b => f"$b%02X").mkString
    val row = spark.sql(
      s"SELECT bloom_might_contain_f('alpha', X'$hex')," +
        s" bloom_might_contain_f('zeta_not_inserted', X'$hex')").head
    assert(row.getBoolean(0), "inserted member must probe true via SQL")
    // not asserted false: a Bloom may false-positive, but usually won't
  }

  test("bloom_might_contain_f rejects a non-foldable sketch at analysis time") {
    // a column reference as the sketch would NPE at task runtime
    // (right.eval(null) on an attribute) — the builder must refuse it
    // up front with an actionable message
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "b", org.apache.spark.sql.types.BinaryType)()
    val lit = org.apache.spark.sql.catalyst.expressions.Literal("alpha")
    val ex = intercept[IllegalArgumentException] {
      GraftExtensions.buildBloomMightContain(Seq(lit, attr))
    }
    assert(ex.getMessage.contains("foldable"))
    // sanity: a genuinely foldable non-Literal (concat of literals) passes
    val folded = org.apache.spark.sql.catalyst.expressions.Concat(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(Array[Byte](1)),
      org.apache.spark.sql.catalyst.expressions.Literal(Array[Byte](2))))
    assert(GraftExtensions.buildBloomMightContain(Seq(lit, folded)) != null)
  }

  test("CSV sink/source round-trip with header and declared schema") {
    val dir = Files.createTempDirectory("graft_csv_").toString + "/out"
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "name", "x")
    df.write.option("header", true).csv(dir)
    val back = spark.read
      .schema("id LONG, name STRING, x DOUBLE")
      .option("header", true).csv(dir)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 1.5), (2L, "b", -2.25)))
  }

  test("typed Dataset risk classifier matches the reference thresholds") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // -30% then -30% compound = -51% -> High; -15% twice = -27.75 -> Medium
    val obs = Seq(
      Obs("hi", ts("2024-01-01"), 100), Obs("hi", ts("2024-01-02"), 70),
      Obs("hi", ts("2024-01-03"), 49),
      Obs("med", ts("2024-01-01"), 100), Obs("med", ts("2024-01-02"), 85),
      Obs("med", ts("2024-01-03"), 72.25),
      Obs("low", ts("2024-01-01"), 100), Obs("low", ts("2024-01-02"), 101),
      Obs("low", ts("2024-01-03"), 99)).toDS()
    val got = TypedSeries.classifyRisk(spark, obs)
      .collect().map(r => r._1 -> r._3).toMap
    assert(got == Map("hi" -> "High Risk", "med" -> "Medium Risk", "low" -> "Low Risk"))
  }
}
