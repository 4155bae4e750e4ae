package graft.ml

import graft.functions.DotProductF
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the vectors into nlist cells; a query probes its
  * `nprobe` nearest cells. The scale path the north star names alongside
  * hyperplane LSH (q38): cell assignment is one broadcast of nlist
  * centroids + a map, and search becomes an equi-join on cell_id instead
  * of a cross join — probing more cells trades compute for recall
  * without ever going all-pairs.
  *
  * Deterministic given the seed; results are engine-specific (k-means),
  * so correctness is pinned by recall against the exact brute-force
  * baseline (IvfSpec), not a SQL oracle.
  */
object IvfIndex {

  /** Assign each embedding row to a k-means cell; also returns the
    * centroid table (cell_id, centroid ARRAY<FLOAT>) for probing. */
  def buildIndex(spark: SparkSession, emb: DataFrame, nlist: Int,
                 seed: Long = 42L): (DataFrame, DataFrame) =
    fromModel(spark, emb, new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cell_id")
      .fit(emb.withColumn("features", array_to_vector(col("embedding")))))

  /** [[buildIndex]] with a persisted coarse quantizer: the fitted
    * KMeansModel is saved in Spark ML's writer format at `path` and
    * loaded on later calls — training happens ONCE per (corpus,
    * nlist, seed) fingerprint (the caller keys `path` by it), and the
    * serve path is the model's pure-map transform (zero shuffles for
    * assignment, identical to the just-trained model's). */
  def buildOrLoad(spark: SparkSession, emb: DataFrame, nlist: Int,
                  path: String, seed: Long = 42L): (DataFrame, DataFrame) = {
    val model =
      if (new java.io.File(path).isDirectory)
        org.apache.spark.ml.clustering.KMeansModel.load(path)
      else {
        val m = new KMeans()
          .setK(nlist).setSeed(seed).setMaxIter(20)
          .setFeaturesCol("features").setPredictionCol("cell_id")
          .fit(emb.withColumn("features", array_to_vector(col("embedding"))))
        m.write.overwrite().save(path)
        m
      }
    fromModel(spark, emb, model)
  }

  private def fromModel(spark: SparkSession, emb: DataFrame,
                        model: org.apache.spark.ml.clustering.KMeansModel)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val vecs = emb.withColumn("features", array_to_vector(col("embedding")))
    val assigned = model.transform(vecs).drop("features")
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("cell_id", "centroid")
    (assigned, centroids)
  }

  /** Top-k cosine neighbors probing the query's `nprobe` nearest cells. */
  def searchTopK(cells: DataFrame, centroids: DataFrame,
                 queryPred: org.apache.spark.sql.Column, k: Int,
                 nprobe: Int): DataFrame = {
    val withNorm = cells.withColumn(
      "n2", DotProductF.dot(col("embedding"), col("embedding")))
    // multi-probe: rank cells per query by euclidean distance to the
    // centroid (d2 = q.q - 2 q.c + c.c), keep nprobe cells
    val qs0 = withNorm.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("n2").as("qn2"))
    val d2 = col("qn2") - lit(2.0) * DotProductF.dot(col("qe"), col("centroid")) +
      DotProductF.dot(col("centroid"), col("centroid"))
    val wProbe = Window.partitionBy("query_id").orderBy(d2.asc, col("cell_id").asc)
    val qs = qs0.crossJoin(broadcast(centroids))
      .withColumn("probe_rank", row_number().over(wProbe))
      .where(col("probe_rank") <= nprobe)
      .select(col("query_id"), col("qe"), col("qn2"), col("cell_id"))

    val cs = withNorm.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), col("n2").as("cn2"), col("cell_id"))
    val cos = DotProductF.dot(col("qe"), col("ce")) /
      (sqrt(col("qn2")) * sqrt(col("cn2")))
    val simq = floor(cos * lit(1000000.0) + lit(0.5)).cast("bigint")
    val scored = broadcast(qs).join(cs, Seq("cell_id"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), simq.as("sim_q"))
      .distinct() // a candidate can appear via several probed cells
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim_q").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id").as("neighbor_id"),
        (col("sim_q").cast(DoubleType) / 1000000.0).as("cosine_sim"))
      .orderBy("query_id", "rank")
  }
}
