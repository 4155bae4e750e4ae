package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter sidecar index — POINT-LOOKUP file skipping on a
  * high-cardinality column, the case where [[ZOrderLayout]]'s min/max
  * stats are useless (every file's [min,max] of a scattered id column
  * spans the whole domain). This is Delta's BLOOMFILTER INDEX move,
  * rebuilt from public primitives so the planning stays visible:
  *
  *  1. the table is laid out by whatever its NATURAL clustering is
  *     (here: a hash repartition on a layout column — by-source, by-day
  *     — chosen for scan locality, NOT for the lookup key);
  *  2. ONE distributed pass groups rows by `_metadata.file_path` and
  *     folds each file's lookup-key set into a Bloom sketch via a typed
  *     [[Aggregator]] (map-side partial sketches merge with
  *     `mergeInPlace` — no driver loop, no per-file jobs);
  *  3. a point lookup consults the sidecar first and plans ONLY the
  *     files whose sketch might contain one of the probe keys; Bloom
  *     false positives cost a wasted file scan, false negatives are
  *     impossible, so results are EXACT.
  *
  * At 100 TB the sidecar is one row per file (a few KB of sketch each)
  * and a point lookup touches ~fpp x nFiles extra files instead of all
  * of them — the difference between a point read and a table scan on a
  * non-clustered column.
  */
object BloomIndex {

  private def indexDir(dir: String) = s"$dir/_bloom_index"

  /** One-pass per-group Bloom builder: input = lookup-key string,
    * buffer = the sketch itself (serializable), output = serialized
    * sketch bytes. */
  private class BloomAgg(expectedPerFile: Long, fpp: Double)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expectedPerFile, fpp)
    override def reduce(b: BloomFilter, v: String): BloomFilter = {
      if (v != null) b.putString(v)
      b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b)
      a
    }
    override def finish(b: BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      b.writeTo(bos)
      bos.toByteArray
    }
    override def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Write `df` into `nFiles` files clustered on `layoutCol` (the scan-
    * locality layout), then build the per-file Bloom sidecar over
    * `keyCol` (the point-lookup key) in one distributed pass. */
  def write(df: DataFrame, layoutCol: String, keyCol: String, dir: String,
            nFiles: Int, expectedPerFile: Long = 100000L,
            fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    df.repartition(nFiles, col(layoutCol))
      .write.mode("overwrite").parquet(dir)
    val bloomAgg = udaf(new BloomAgg(expectedPerFile, fpp))
    spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(
        bloomAgg(col(keyCol).cast("string")).as("bloom"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(indexDir(dir))
  }

  /** Sidecar contents: (file_path, bloom bytes, n_rows). */
  def index(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(indexDir(dir))

  /** Files whose sketch might contain ANY of `keys` — the planned set
    * for a point lookup. The probe runs DISTRIBUTED over the sidecar
    * (each row deserializes its own sketch in the executors) and only
    * the surviving paths reach the driver — so planning stays cheap
    * even at millions of files, where collecting every sketch first
    * would move GBs to the driver. The typed filter is cold-path
    * planning over one-row-per-file data, not a data-path UDF. */
  def selectFiles(spark: SparkSession, dir: String,
                  keys: Seq[String]): Seq[String] = {
    val probe = keys.toArray
    index(spark, dir).select("file_path", "bloom")
      .filter { r =>
        val bloom = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        probe.exists(bloom.mightContainString)
      }
      .select("file_path")
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Exact point lookup: plan only sketch-surviving files, then apply
    * the exact IN predicate as a residual (kills Bloom false
    * positives). */
  def lookup(spark: SparkSession, dir: String, keyCol: String,
             keys: Seq[String]): DataFrame = {
    val files = selectFiles(spark, dir, keys)
    val residual = col(keyCol).cast("string").isin(keys: _*)
    if (files.isEmpty)
      spark.read.parquet(dir).where(residual).limit(0)
    else
      spark.read.parquet(files: _*).where(residual)
  }
}
