package graft

import graft.operators.{DeltaStore, IncrementalView, MorTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** IncrementalView: a grouped SUM+COUNT maintained purely from the
  * preimage change feed equals a fresh recompute from the table
  * snapshot after EVERY batch — updates subtract their preimage,
  * deletes remove membership, groups netting to zero vanish and can
  * return. */
class IncrementalViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val gschema = StructType(Seq(StructField("grp", StringType)))

  test("feed-maintained view tracks the snapshot recompute across updates, deletes, and group rebirth") {
    val root = Files.createTempDirectory("graft_ivm_").toString
    val t = MorTable(DeltaStore(s"$root/t", 8), Seq("k"))
    val vstore = DeltaStore(s"$root/v", 8)
    val schema = Seq(("x", "g", 0)).toDF("k", "grp", "v").schema

    def applyBatch(b: Int): Unit =
      IncrementalView.applyFeed(vstore,
        t.changes(spark, schema, b - 1, b, preimage = true)
          .select(col("grp"), col("op"), col("v")),
        Seq("grp"), "v", b)

    def viewRows: Seq[(String, Double, Long)] =
      IncrementalView.view(spark, vstore, gschema)
        .select(col("grp"), col("vsum").cast("double"), col("cnt"))
        .as[(String, Double, Long)].collect().sortBy(_._1).toSeq

    def recompute: Seq[(String, Double, Long)] =
      t.snapshot(spark, schema)
        .groupBy("grp")
        .agg(sum(Q.dec2(col("v"))).cast("double"), count(lit(1)))
        .as[(String, Double, Long)].collect().sortBy(_._1).toSeq

    t.upsert(Seq(("a", "x", 1), ("b", "y", 2)).toDF("k", "grp", "v"), 0)
    applyBatch(0)
    assert(viewRows == Seq(("x", 1.0, 1L), ("y", 2.0, 1L)))
    assert(viewRows == recompute)

    t.upsert(Seq(("a", "x", 5)).toDF("k", "grp", "v"), 1) // update: -1 +5
    applyBatch(1)
    assert(viewRows == Seq(("x", 5.0, 1L), ("y", 2.0, 1L)))
    assert(viewRows == recompute)

    t.delete(Seq("b").toDF("k"), 2, schema) // y nets to zero -> vanishes
    applyBatch(2)
    assert(viewRows == Seq(("x", 5.0, 1L)))
    assert(viewRows == recompute)

    t.upsert(Seq(("c", "y", 4)).toDF("k", "grp", "v"), 3) // y reborn
    applyBatch(3)
    assert(viewRows == Seq(("x", 5.0, 1L), ("y", 4.0, 1L)))
    assert(viewRows == recompute)

    // compaction folds partials without changing the view
    IncrementalView.compact(spark, vstore, gschema)
    assert(viewRows == recompute)
  }

  test("an unknown feed op fails the job instead of silently mis-signing") {
    val vstore = DeltaStore(
      Files.createTempDirectory("graft_ivm_bad_").toString, 4)
    val bad = Seq(("g", "bogus", 1)).toDF("grp", "op", "v")
    val e = intercept[Exception] {
      IncrementalView.applyFeed(vstore, bad, Seq("grp"), "v", 0)
    }
    assert(e.getMessage != null)
  }
}
