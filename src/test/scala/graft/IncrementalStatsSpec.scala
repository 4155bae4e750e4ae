package graft

import graft.operators.{DeltaStore, IncrementalStats}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** IncrementalStats: mergeable per-batch column profiles on DeltaStore
  * — maintenance ≡ one-shot recompute, across compaction and on both
  * commit protocols. */
class IncrementalStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("col_name")
      .as[(String, Double, Double, Long, Long)].collect().toSeq

  private val data = Seq[(Int, Option[Double])](
    (5, Some(2.0)), (1, None), (9, Some(-3.5)),
    (4, Some(7.0)), (2, Some(7.0)), (8, None))

  test("disjoint batch partials fold to the one-shot profile, through compact, both protocols") {
    val full = data.toDF("a", "b")
    val oneShot = rows(
      IncrementalStats.profile(spark, {
        val st = DeltaStore(Files.createTempDirectory("graft_st_").toString, 4)
        IncrementalStats.appendBatch(st, full, Seq("a", "b"), 0)
        st
      }))
    assert(oneShot == Seq(("a", 1.0, 9.0, 0L, 6L), ("b", -3.5, 7.0, 2L, 6L)))
    for (manifest <- Seq(false, true)) {
      val st = DeltaStore(
        Files.createTempDirectory("graft_st_").toString, 4, manifest)
      data.grouped(2).zipWithIndex.foreach { case (chunk, b) =>
        IncrementalStats.appendBatch(st, chunk.toDF("a", "b"), Seq("a", "b"), b)
        if (b == 1) IncrementalStats.compact(spark, st)
      }
      assert(rows(IncrementalStats.profile(spark, st)) == oneShot,
        s"manifest=$manifest maintenance must equal recompute")
    }
  }
}
