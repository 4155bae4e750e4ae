package graft

import graft.functions.BloomMightContainF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BloomMightContainF: hash-path agreement with df.stat.bloomFilter
  * (no false negatives), plausible FP rate, codegen/interpreted parity,
  * null safety, and the no-UDF plan claim q86 relies on. */
class BloomMightContainFSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val members = (0 until 1000).map(i => s"member_$i")
  private lazy val bloom = members.toDF("s").stat.bloomFilter("s", 1000L, 0.01)

  test("no false negatives against df.stat.bloomFilter insertion") {
    val hits = members.toDF("s")
      .where(BloomMightContainF.probe(col("s"), bloom))
      .count()
    assert(hits == 1000L, "every inserted member must probe true")
  }

  test("false positive rate is near the configured 1%") {
    val nonMembers = (0 until 10000).map(i => s"stranger_$i").toDF("s")
    val fp = nonMembers.where(BloomMightContainF.probe(col("s"), bloom)).count()
    assert(fp < 500L, s"fp rate ${fp / 10000.0} far above configured 0.01")
  }

  test("codegen and interpreted paths agree; nulls drop like the closure did") {
    val data = (members.take(50) ++ (0 until 50).map(i => s"x_$i"))
      .map(Option(_)) :+ Option.empty[String]
    val df = data.toDF("s")
    val codegen = df.where(BloomMightContainF.probe(col("s"), bloom))
      .collect().map(_.getString(0)).toSet
    // isolated SQLConf (same context) — mutating the SHARED session's
    // codegen flag races concurrently-running suites' plan assertions
    val interpSession = spark.newSession()
    interpSession.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = interpSession.createDataFrame(df.collectAsList(), df.schema)
      .where(BloomMightContainF.probe(col("s"), bloom))
      .collect().map(_.getString(0)).toSet
    assert(codegen == interp, "codegen vs interpreted mismatch")
    assert(members.take(50).toSet.subsetOf(codegen))
    assert(!codegen.contains(null))
  }

  test("probe plans inside WholeStageCodegen with no UDF node") {
    // a parquet-backed scan: ConvertToLocalRelation folds the probe away
    // on an in-memory LocalRelation before any physical planning
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_").toString + "/t"
    members.toDF("s").write.parquet(dir)
    val df = spark.read.parquet(dir).where(BloomMightContainF.probe(col("s"), bloom))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen marker in the simple plan string
    assert(plan.contains("*(1) Filter bloom_might_contain_f"),
      s"expected the probe filter inside a codegen span:\n${plan.take(300)}")
    assert(!plan.contains("UDF"), s"probe must not plan as a UDF:\n${plan.take(300)}")
  }
}
