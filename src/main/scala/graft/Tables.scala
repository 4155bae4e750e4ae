package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All reads go through
  * [[Tables.df]] so scans stay declarative: Catalyst prunes columns and
  * pushes filters into the parquet reader (verify with
  * `.explain("formatted")` → `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = df(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = df(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = df(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = df(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = df(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = df(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = df(s, d, "lineitem")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. With spark.sql.legacy.parquet.nanosAsLong
    * (set in [[Sessions.builder]]) the column arrives as LongType nanos;
    * every value in the driver's data is microsecond-aligned, so the
    * truncation to TIMESTAMP_NTZ micros is lossless and matches what the
    * DuckDB oracle sees. */
  def events(s: SparkSession, d: String): DataFrame =
    df(s, d, "events").withColumn(
      "ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  def documents(s: SparkSession, d: String): DataFrame = df(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = df(s, d, "embeddings")

  /** Register all tables as temp views for `spark.sql` access. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => df(spark, sfDir, n).createOrReplaceTempView(n))
}
