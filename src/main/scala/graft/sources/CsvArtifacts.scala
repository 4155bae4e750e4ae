package graft.sources

import graft.queries.CryptoQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CSV artifact sink — the reference's committed data exports (SURVEY
  * O11's sink half): `processed_crypto_data.csv` (10 columns, reference
  * EDA.ipynb:1739) and one `<coin>_prediction_data.csv` per coin (33
  * columns, transform_data.ipynb cell 7), with headers identical to the
  * committed files.
  *
  * Single-file promotion is a driver-side rename of the lone part file —
  * appropriate because artifact exports are small, human-facing tables
  * (hundreds of rows); anything 100 TB-sized stays partitioned parquet
  * and never goes through coalesce(1).
  */
object CsvArtifacts {

  /** Write `df` as ONE headered CSV file at `path` (not a directory). */
  def writeSingleCsv(df: DataFrame, path: String): Unit = {
    val tmp = new java.io.File(path + ".dir")
    df.coalesce(1).write.mode("overwrite").option("header", true).csv(tmp.getPath)
    val part = tmp.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .getOrElse(throw new java.io.IOException(s"no part file under $tmp"))
    val target = new java.io.File(path)
    if (target.exists() && !target.delete())
      throw new java.io.IOException(s"cannot replace $target")
    if (!part.renameTo(target))
      throw new java.io.IOException(s"cannot promote $part to $target")
    tmp.listFiles().foreach(_.delete())
    tmp.delete()
  }

  /** Emit every reference CSV artifact into `outDir`; returns the file
    * names written. */
  def writeAll(history: DataFrame, outDir: String): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    writeSingleCsv(
      CryptoQueries.processedArtifact(history), s"$outDir/processed_crypto_data.csv")
    val pf = CryptoQueries.predictionFrame(history).cache()
    val coins = pf.select("coin_id").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    coins.foreach(c => writeSingleCsv(
      pf.where(col("coin_id") === c).orderBy("fetch_date"),
      s"$outDir/${c}_prediction_data.csv"))
    pf.unpersist()
    "processed_crypto_data.csv" +: coins.map(c => s"${c}_prediction_data.csv")
  }
}
