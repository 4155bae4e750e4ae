package graft.ml

import graft.functions.DotProductF
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learned product quantization with asymmetric-distance (ADC) scoring —
  * the FAISS-style half that registry query q98 concedes
  * (SimilarityQueries q98 uses deterministic sign-pattern codes so DuckDB
  * can replay it; this class trains real per-subspace k-means codebooks,
  * so its gate is PqSpec's recall bound against the q37 brute baseline,
  * exactly like ml/IvfIndex vs q49).
  *
  * Pipeline (all declarative; the only driver loop is over the m=8
  * constant subspaces, the same bounded-loop class as
  * PricePrediction's documented O(100)-key loop):
  *
  *  1. [[train]]: vectors are L2-normalized (so inner product = cosine
  *     and per-subspace dots ADD up to the whole-vector dot), split
  *     into m contiguous subspaces, and each subspace gets a k-means
  *     codebook (deterministic seed, the IvfIndex machinery).
  *  2. [[encode]]: each vector's subvector maps to its nearest centroid
  *     — an equi-join against the BROADCAST (m*k)-row codebook and a
  *     map-side `min(struct(d2, code))` argmin (partial aggregation;
  *     no window, no shuffle of the k-expanded rows). A vector is now
  *     m one-byte codes: the 8-bytes-per-candidate memory-bandwidth
  *     contract that makes billion-vector scans feasible.
  *  3. [[searchTopK]]: per query, an ADC lookup table
  *     (query, sub, code) -> dot(q̂_sub, centroid) is built against the
  *     same broadcast codebook and broadcast to the candidate codes;
  *     scoring touches ONLY codes + LUT (never the raw vectors), a
  *     keyed sum over m hits. The ADC top-`shortlist` then gets ONE
  *     exact cosine re-rank join against the raw vectors (FAISS's
  *     refine step) — at 100 TB the exact pass reads `shortlist` rows
  *     per query instead of the corpus.
  */
object PqIndex {

  /** Normalized subvector slices: (vec_id, sub, subvec ARRAY<DOUBLE>).
    * Normalization is by the FULL vector's L2 norm, so subspace dots
    * sum to the whole-vector cosine. */
  private def subvectors(emb: DataFrame, m: Int): DataFrame = {
    val dim = 64
    require(dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val subDim = dim / m
    emb
      .withColumn("n",
        sqrt(DotProductF.dot(col("embedding"), col("embedding"))))
      .where(col("n") > 0)
      .select(col("vec_id"), explode(expr(s"sequence(0, ${m - 1})")).as("sub"),
        expr(s"transform(slice(embedding, sub * $subDim + 1, $subDim), " +
          "x -> cast(x as double) / n)").as("subvec"))
  }

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Train per-subspace codebooks: (sub, code, centroid ARRAY<DOUBLE>).
    * m*k rows total — broadcast-sized by construction.
    *
    * The m sub-trainings are independent, and each KMeans iteration on a
    * subspace slice is a small job that leaves most of the cluster idle
    * — run sequentially, m*maxIter tiny jobs serialize into the
    * dominant cost of the whole PQ path (measured 34.5 s of q101's
    * bench time at 2k vectors). Submitting the m fits CONCURRENTLY
    * (Spark's scheduler interleaves jobs from multiple driver threads)
    * collapses wall time to roughly the slowest fit. Results are
    * unchanged: each fit is independently seeded (seed + s) and
    * deterministic given its seed and the shared cached slice, and the
    * codebook union preserves subspace order. */
  def train(spark: SparkSession, emb: DataFrame, m: Int = 8, k: Int = 32,
            seed: Long = 42L): DataFrame = {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val subs = subvectors(emb, m).cache()
    try {
      // materialize the shared slice ONCE before fanning out — per-block
      // cache locks would otherwise serialize (or duplicate) the first
      // concurrent computation
      subs.count()
      val fits = (0 until m).map { s =>
        Future {
          val model = new KMeans()
            .setK(k).setSeed(seed + s).setMaxIter(20)
            .setFeaturesCol("features").setPredictionCol("code")
            .fit(subs.where(col("sub") === s)
              .withColumn("features", array_to_vector(col("subvec"))))
          model.clusterCenters.zipWithIndex.toSeq
            .map { case (c, i) => (s, i, c.toArray) }
        }
      }
      fits.map(Await.result(_, Duration.Inf))
        .map(_.toDF("sub", "code", "centroid"))
        .reduce(_ unionByName _)
    } finally subs.unpersist(blocking = false)
  }

  /** Persist a trained codebook as a parquet sidecar — m*k tiny rows;
    * doubles round-trip parquet bit-exactly, so a loaded codebook
    * encodes and scores identically to the one just trained. */
  def save(codebook: DataFrame, path: String): Unit =
    codebook.coalesce(1).write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Train-if-absent: a real index trains ONCE and serves many queries.
    * `path` must be fingerprint-keyed by the caller (corpus count +
    * m/k/seed — the train inputs), so a stale artifact can never match;
    * the `_SUCCESS` marker gates completeness (a crashed save retrains
    * and overwrites). */
  def trainIfAbsent(spark: SparkSession, emb: DataFrame, path: String,
                    m: Int = 8, k: Int = 32, seed: Long = 42L): DataFrame =
    if (new java.io.File(path, "_SUCCESS").exists()) load(spark, path)
    else {
      val cb = train(spark, emb, m, k, seed)
      save(cb, path)
      // read back the persisted artifact so first and later invocations
      // serve from the identical (file-backed, broadcastable) relation
      load(spark, path)
    }

  /** Assign each vector's subvectors to their nearest codebook entry:
    * (vec_id, sub, code). The argmin is `min(struct(d2, code, centroid))`
    * after the broadcast codebook join — fully map-side-combinable,
    * deterministic ties (lowest code wins). */
  def encode(emb: DataFrame, codebook: DataFrame, m: Int = 8): DataFrame =
    subvectors(emb, m)
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("d2", dist2(col("subvec"), col("centroid")))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.code").as("code"))

  /** ADC top-k with exact re-rank: score every candidate from codes +
    * a broadcast per-query LUT, keep the ADC top-`shortlist`, then ONE
    * exact cosine join re-ranks the shortlist to the final top-k.
    *
    * LUT entries are QUANTIZED to integer micro-units (1e-12) before
    * the per-candidate sum: a sum of m doubles would depend on the
    * nondeterministic arrival order of the joined rows, while a sum of
    * m BIGINTs is exact and order-free — which is what lets q101 sit
    * under the DuckDB hash gate (and makes the shortlist itself
    * run-to-run stable). At 1e-12 the quantization is far below any
    * recall-relevant score gap. */
  def searchTopK(emb: DataFrame, codebook: DataFrame, codes: DataFrame,
                 queryPred: Column, k: Int, shortlist: Int = 100,
                 m: Int = 8): DataFrame = {
    // per-query ADC lookup table: (query_id, sub, code, ipq); tiny —
    // |Q| * m * |codebook per sub| rows — and broadcast
    val ip = dot(col("subvec"), col("centroid"))
    val lut = subvectors(emb.where(queryPred), m)
      .select(col("vec_id").as("query_id"), col("sub"), col("subvec"))
      .join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        (signum(ip) * floor(abs(ip) * lit(1e12) + lit(0.5)))
          .cast("long").as("ipq"))
    val wShort = Window.partitionBy("query_id")
      .orderBy(col("adc_score").desc, col("cand_id").asc)
    val short = codes.select(col("vec_id").as("cand_id"), col("sub"), col("code"))
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy("query_id", "cand_id")
      .agg(sum(col("ipq")).as("adc_score"))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("srank", row_number().over(wShort))
      .where(col("srank") <= shortlist)
      .select("query_id", "cand_id", "adc_score")

    // exact refine: one equi-join per side against the raw vectors
    val withNorm = emb.withColumn(
      "n2", DotProductF.dot(col("embedding"), col("embedding")))
    val qs = withNorm.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), col("n2").as("qn2"))
    val cs = withNorm.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), col("n2").as("cn2"))
    val cos = DotProductF.dot(col("qe"), col("ce")) /
      (sqrt(col("qn2")) * sqrt(col("cn2")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine_sim").desc, col("cand_id").asc)
    short.join(qs, Seq("query_id")).join(cs, Seq("cand_id"))
      .select(col("query_id"), col("cand_id"), cos.as("cosine_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id").as("neighbor_id"),
        col("cosine_sim"))
      .orderBy("query_id", "rank")
  }
}
