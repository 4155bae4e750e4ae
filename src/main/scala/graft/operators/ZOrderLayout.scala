package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order WRITE path: lay a table out on disk so that a predicate on
  * EITHER of two columns prunes most files before any row is read —
  * the OPTIMIZE ZORDER move of modern table formats (Delta/Iceberg),
  * built from Spark primitives:
  *
  *  1. Morton-interleave the two (8-bit-quantized) dimensions into one
  *     integer clustering key;
  *  2. `repartitionByRange` on that key — every output file owns a
  *     CONTIGUOUS Morton range, so it covers ~1/sqrt(nFiles) of EACH
  *     dimension (vs all of dimension 2 under a lexicographic sort);
  *  3. write a sidecar manifest of per-file min/max on both dimensions
  *     (the `_`-prefixed directory is invisible to plain parquet
  *     reads), the same file-level stats a lakehouse table format
  *     keeps;
  *  4. [[scan]] consults the manifest and plans ONLY intersecting
  *     files — planning-time file skipping, like LandingSource's
  *     pushed-filter pruning, with the residual predicate still
  *     applied to the surviving rows.
  *
  * At 100 TB the manifest stays tiny (one row per file) while the
  * pruning it buys is the difference between scanning ~sqrt(N) files
  * and scanning all of them for a selective 2-D predicate. The write
  * itself is one range shuffle — the same cost class as any global
  * sort-based OPTIMIZE.
  *
  * Quantization contract: `aCol`/`bCol` must already be integers in
  * [0, 256) (callers bucket or `% 256` their natural columns; a
  * production OPTIMIZE would quantile-bin instead — same layout math).
  *
  * Reference behavior: q78 audits this layout in-query
  * (ProfileQueries.scala); this operator makes it a physical table.
  */
object ZOrderLayout {

  /** Morton interleave of two 8-bit values as dialect-portable integer
    * arithmetic: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. `divOp` is "div" (Spark) or "//" (DuckDB). */
  def morton(a: String, b: String, divOp: String): String =
    (0 until 8).map { i =>
      val lo = 1L << i
      s"(($a $divOp $lo) % 2) * ${1L << (2 * i)} + (($b $divOp $lo) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  private def manifestDir(dir: String) = s"$dir/_zorder_manifest"

  /** Write `df` Z-ordered on (`aCol`, `bCol`) into ~`nFiles` files under
    * `dir`, plus the per-file min/max manifest. */
  def write(df: DataFrame, aCol: String, bCol: String, dir: String,
            nFiles: Int): Unit =
    writeClustered(df, expr(morton(aCol, bCol, "div")), aCol, bCol, dir, nFiles)

  /** Same write + manifest with an arbitrary clustering key — used by the
    * spec to build the lexicographic strawman with identical machinery. */
  def writeClustered(df: DataFrame, clusterKey: org.apache.spark.sql.Column,
                     aCol: String, bCol: String, dir: String,
                     nFiles: Int): Unit = {
    val spark = df.sparkSession
    df.withColumn("__ck", clusterKey)
      .repartitionByRange(nFiles, col("__ck"))
      .sortWithinPartitions("__ck")
      .drop("__ck")
      .write.mode("overwrite").parquet(dir)
    // one row per file: tiny by construction, exactly what a table
    // format's add-file stats carry
    spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(
        min(col(aCol)).as("min_a"), max(col(aCol)).as("max_a"),
        min(col(bCol)).as("min_b"), max(col(bCol)).as("max_b"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir(dir))
  }

  /** Deterministic-bounds variant of [[write]]: files are FIXED-WIDTH
    * Morton buckets (`bucket = morton div (65536/nFiles)`) instead of
    * range-sampled cuts. `repartitionByRange` balances file sizes but
    * draws its split points from a sample, so per-file spans depend on
    * the sampler; here every bucket's rows land in one task (hash
    * repartition on the bucket id) which writes them into the bucket's
    * own `__zb=K` directory — file contents and the manifest become a
    * pure function of the DATA, which is what lets registry query q80
    * hash-check the physical layout against a SQL oracle. Same
    * planning-time skipping properties: each file owns a contiguous
    * Morton range. */
  def writeBucketed(df: DataFrame, aCol: String, bCol: String, dir: String,
                    nFiles: Int): Unit = {
    require(nFiles > 0 && 65536 % nFiles == 0, s"nFiles must divide 65536: $nFiles")
    val width = 65536 / nFiles
    val spark = df.sparkSession
    df.withColumn("__ck", expr(morton(aCol, bCol, "div")))
      .withColumn("__zb", expr(s"__ck div $width").cast("int"))
      .repartition(nFiles, col("__zb"))
      .sortWithinPartitions("__ck")
      .drop("__ck")
      .write.partitionBy("__zb").mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
      .groupBy(col("__zb").as("file_id"),
               col("_metadata.file_path").as("file_path"))
      .agg(
        min(col(aCol)).as("min_a"), max(col(aCol)).as("max_a"),
        min(col(bCol)).as("min_b"), max(col(bCol)).as("max_b"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir(dir))
  }

  /** Read back the sidecar manifest written by [[writeClustered]] /
    * [[writeBucketed]]. */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(manifestDir(dir))

  /** Manifest rows whose [min,max] box intersects the query box. */
  def selectFiles(spark: SparkSession, dir: String,
                  aMin: Long, aMax: Long, bMin: Long, bMax: Long): Seq[String] =
    spark.read.parquet(manifestDir(dir))
      .where(col("max_a") >= aMin && col("min_a") <= aMax &&
             col("max_b") >= bMin && col("min_b") <= bMax)
      .select("file_path")
      .collect().map(_.getString(0)).toSeq.sorted

  /** Read only the manifest-surviving files, then apply the exact
    * predicate as a residual — the non-surviving files are never
    * planned, not merely filtered. */
  def scan(spark: SparkSession, dir: String, aCol: String, bCol: String,
           aMin: Long, aMax: Long, bMin: Long, bMax: Long): DataFrame = {
    val files = selectFiles(spark, dir, aMin, aMax, bMin, bMax)
    val residual = col(aCol).between(aMin, aMax) && col(bCol).between(bMin, bMax)
    if (files.isEmpty)
      spark.read.parquet(dir).where(residual).limit(0)
    else
      spark.read.parquet(files: _*).where(residual)
  }
}
