package graft

import graft.operators.{BloomIndex, IndexedScan, ZOrderLayout}
import graft.operators.IndexedScan.Box
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** IndexedScan: the intersection of what each sidecar admits is planned
  * (never more than either index alone), results stay exact against a
  * full-scan filter, and the degraded paths (no sidecar at all, an
  * empty key set) behave. Round-5 verdict item 4's original bar. */
class IndexedScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(p: String): String = p.replaceFirst("^file:/+", "/")

  // Z-ordered on (a, b) in [0,256)^2, Bloom-indexed on the scattered id
  private lazy val (dir, df) = {
    val d = Files.createTempDirectory("graft_idxscan_").toString + "/t"
    val rows = (0L until 4096L)
      .map(i => ((i * 37) % 256, (i * 91) % 256, s"k$i", i))
      .toDF("a", "b", "id", "v")
    ZOrderLayout.write(rows, "a", "b", d, nFiles = 16)
    BloomIndex.refresh(spark, d, "id", expectedPerFile = 512L, fpp = 0.01)
    (d, rows)
  }

  test("planFiles(box ∧ keys) ⊆ planFiles(box) and ⊆ planFiles(keys), " +
      "and the scan equals a full-scan filter") {
    val box = Box(0, 63, 0, 63)
    val keys = Seq("k42", "k1000", "k3000")
    val both = IndexedScan.planFiles(spark, dir, Some(box), Some(keys))
      .map(norm).toSet
    val boxOnly = IndexedScan.planFiles(spark, dir, Some(box), None)
      .map(norm).toSet
    val keysOnly = IndexedScan.planFiles(spark, dir, None, Some(keys))
      .map(norm).toSet
    val total = IndexedScan.planFiles(spark, dir).size
    assert(both.subsetOf(boxOnly), "intersection must refine the box plan")
    assert(both.subsetOf(keysOnly), "intersection must refine the key plan")
    assert(boxOnly.size < total, "the box alone must already skip files")
    assert(keysOnly.size < total, "the keys alone must already skip files")
    assert(both.size <= math.min(boxOnly.size, keysOnly.size))

    val got = IndexedScan
      .scan(spark, dir, "a", "b", "id", Some(box), Some(keys))
      .select("a", "b", "id", "v").collect().toSet
    val want = df
      .where(col("a").between(0, 63) && col("b").between(0, 63) &&
        col("id").isin(keys: _*))
      .collect().toSet
    assert(got == want, "intersection-planned scan must be exact")

    // each single-index scan is exact too
    val gotBox = IndexedScan
      .scan(spark, dir, "a", "b", "id", Some(box), None)
      .select("a", "b", "id", "v").collect().toSet
    val wantBox = df
      .where(col("a").between(0, 63) && col("b").between(0, 63))
      .collect().toSet
    assert(gotBox == wantBox)
    val gotKeys = IndexedScan
      .scan(spark, dir, "a", "b", "id", None, Some(keys))
      .select("a", "b", "id", "v").collect().toSet
    val wantKeys = df.where(col("id").isin(keys: _*)).collect().toSet
    assert(gotKeys == wantKeys)
  }

  test("no applicable sidecar falls back to every data file, exactly") {
    val plain = Files.createTempDirectory("graft_idxscan_plain_")
      .toString + "/t"
    df.repartition(8).write.mode("overwrite").parquet(plain)
    val all = IndexedScan.planFiles(spark, plain,
      Some(Box(0, 63, 0, 63)), Some(Seq("k42"))).map(norm).toSet
    val files = spark.read.parquet(plain)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(r => norm(r.getString(0))).toSet
    assert(all == files, "without sidecars every data file is planned")
    val got = IndexedScan
      .scan(spark, plain, "a", "b", "id", Some(Box(0, 63, 0, 63)),
        Some(Seq("k42")))
      .select("a", "b", "id", "v").collect().toSet
    val want = df
      .where(col("a").between(0, 63) && col("b").between(0, 63) &&
        col("id") === "k42")
      .collect().toSet
    assert(got == want, "residual predicates keep the fallback exact")
  }

  test("keys = Some(Seq.empty) plans no files and returns no rows") {
    val planned = IndexedScan.planFiles(spark, dir, None, Some(Seq.empty))
    assert(planned.isEmpty, "an empty key set can match no file")
    val got = IndexedScan.scan(spark, dir, "a", "b", "id",
      None, Some(Seq.empty))
    assert(got.count() == 0L)
  }

  test("a box disjoint from the keys' files plans their intersection " +
      "(possibly empty) and still returns the exact empty result") {
    // k42 -> (a,b) = (42*37%256, 42*91%256) = (18, 238): a box far from
    // b=238 excludes the row
    val box = Box(0, 15, 0, 15)
    val got = IndexedScan.scan(spark, dir, "a", "b", "id",
      Some(box), Some(Seq("k42")))
    assert(got.count() == 0L)
  }
}
