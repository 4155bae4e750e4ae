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
  /** `ts` normalization, adaptive to how the corpus was generated: early
    * driver data stored ts as INT64 TIMESTAMP(NANOS) — rejected by the
    * vectorized reader, surfaced as LongType nanos under
    * spark.sql.legacy.parquet.nanosAsLong (set in [[Sessions.builder]])
    * and truncated here to micros (lossless: the values are
    * microsecond-aligned) — while round-8+ data stores TIMESTAMP(MICROS)
    * directly, which arrives as TIMESTAMP_NTZ and needs only the type
    * pin. Both paths land on TIMESTAMP_NTZ micros, matching what the
    * DuckDB oracle reads from the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    val base = df(s, d, "events")
    val norm =
      if (eventsTsIsNanosLong(s, d))
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
      else col("ts").cast("timestamp_ntz")
    base.withColumn("ts", norm)
  }

  /** Memoized `ts`-is-LongType-nanos detection per dir. The detection is
    * a parquet footer/schema read — driver-side metadata work that
    * [[events]] and [[eventsTsMicrosSql]] would otherwise repeat on
    * EVERY query construction (the same table-stats-caching rationale as
    * SimilarityQueries.embCount). Keyed on dir alone: a file's schema is
    * a property of the files, not the session, and a Boolean pins
    * nothing — no session-hygiene machinery needed. Assumes dir contents
    * are immutable within a JVM (true: testdata and ScaleGen corpora are
    * written once, before any query runs). The probe runs outside the
    * map lock (get-then-putIfAbsent): a rare duplicate footer read
    * beats holding a bin lock through I/O. */
  private val eventsTsKind =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def eventsTsIsNanosLong(s: SparkSession, d: String): Boolean = {
    val cached = eventsTsKind.get(d)
    if (cached != null) cached.booleanValue()
    else {
      val v: java.lang.Boolean =
        df(s, d, "events").schema("ts").dataType ==
          org.apache.spark.sql.types.LongType
      val prev = eventsTsKind.putIfAbsent(d, v)
      (if (prev != null) prev else v).booleanValue()
    }
  }

  /** SQL expression for epoch MICROS from the RAW events `ts` column,
    * across both generator schemas (see [[events]]): LongType nanos →
    * integer truncation; TIMESTAMP(MICROS) → unix_micros (session tz is
    * UTC, so the ntz→timestamp cast is instant-preserving). Matches the
    * oracles' `epoch_us(CAST(ts AS TIMESTAMP))`. */
  def eventsTsMicrosSql(s: SparkSession, d: String): String =
    if (eventsTsIsNanosLong(s, d)) "ts div 1000"
    else "unix_micros(cast(ts as timestamp))"

  def documents(s: SparkSession, d: String): DataFrame = df(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = df(s, d, "embeddings")

  /** Register all tables as temp views for `spark.sql` access. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => df(spark, sfDir, n).createOrReplaceTempView(n))
}
