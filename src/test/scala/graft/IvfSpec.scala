package graft

import graft.ml.IvfIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN pinned by recall against the exact brute-force baseline
  * (k-means output has no SQL oracle). With nlist=16 over 500 clustered
  * vectors (the synthetic embeddings carry labels), same-cell search
  * must recover most of the true top-3. */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("IVF top-3 recall vs brute force >= 0.6 at nlist=16") {
    val brute = SparkEntry.queries("q37_knn_bruteforce_cosine")(spark, sfDir)
      .where(col("rank") <= 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("q49_ann_ivf")(spark, sfDir)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall (ivf=${ivf.size}, brute=${brute.size})")
  }
}
