package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join (SURVEY §4.2 / README scale notes): two
  * tables bucketed on the join key join WITHOUT any shuffle exchange —
  * the layout-level replacement for the reference's B-tree indexes when
  * the same key is joined repeatedly at 100 TB. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a fresh JVM starts a fresh in-memory metastore, but the warehouse
    // directory persists across runs — clear it or CREATE TABLE refuses
    val loc = new java.io.File(s"spark-warehouse/$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }

  test("join of co-bucketed tables plans no shuffle exchange") {
    dropTable("bkt_left")
    dropTable("bkt_right")
    val left = (1L to 1000L).map(i => (i % 50, s"l$i")).toDF("k", "lv")
    val right = (1L to 500L).map(i => (i % 50, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_right")
    val joined = spark.table("bkt_left")
      .hint("merge") // force SMJ so the bucket layout, not broadcast, wins
      .join(spark.table("bkt_right"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 1000L * 500L / 50L / 50L * 50L,
      "10 rows per key left x 10 per key right x 50 keys")
  }
}
