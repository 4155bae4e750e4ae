package graft

import graft.functions.CountMinGteF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CountMinGteF: overcount-only guarantee (no heavy item rejected),
  * codegen/interpreted parity, null dropping. */
class CountMinGteFSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 5 heavy tokens x 100, 1000 singleton tokens
  private lazy val data =
    (0 until 5).flatMap(h => Seq.fill(100)(s"heavy_$h")) ++
      (0 until 1000).map(i => s"rare_$i")
  private lazy val df = data.toDF("tok")
  private lazy val cms = df.stat.countMinSketch("tok", 0.001, 0.99, 42)

  test("no truly-heavy token is rejected (overcount-only)") {
    val passed = df.distinct()
      .where(CountMinGteF.probe(col("tok"), cms, 100L))
      .collect().map(_.getString(0)).toSet
    assert((0 until 5).map(h => s"heavy_$h").toSet.subsetOf(passed),
      "Count-Min must never undercount a heavy item")
  }

  test("codegen and interpreted paths agree; nulls drop") {
    val withNull = (data.take(50).map(Option(_)) :+ Option.empty[String]).toDF("tok")
    val codegen = withNull.where(CountMinGteF.probe(col("tok"), cms, 100L)).count()
    // isolated SQLConf (same context) — mutating the SHARED session's
    // codegen flag races concurrently-running suites' plan assertions
    val interpSession = spark.newSession()
    interpSession.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = interpSession
      .createDataFrame(withNull.collectAsList(), withNull.schema)
      .where(CountMinGteF.probe(col("tok"), cms, 100L)).count()
    assert(codegen == interp)
  }

  test("prefilter + exact residual equals the plain exact computation") {
    val exact = df.groupBy("tok").count().where(col("count") >= 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val pruned = df.where(CountMinGteF.probe(col("tok"), cms, 100L))
      .groupBy("tok").count().where(col("count") >= 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(pruned == exact)
  }
}
