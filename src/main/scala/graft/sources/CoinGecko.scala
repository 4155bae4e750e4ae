package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CoinGecko landing-zone source (reference: crypto_app/load_data.py
  * :104-146 — glob data/<coin>/<coin>_YYYY-MM-DD.json, derive coin_id and
  * fetch_date from the PATH, extract price from the nested doc).
  *
  * The schema is declared, never inferred: the currency dictionaries are
  * modeled as MAP<STRING,DOUBLE> (SURVEY.md §1.3) so 63 currencies stay
  * one column and a new API currency cannot break the schema. Only the
  * fields the pipeline reads are typed as structs; everything else rides
  * inside the maps/structs untouched.
  *
  * Scale notes: one JSON doc per file with multiLine=true means one
  * task per file at minimum — fine for a landing zone; the first thing
  * the pipeline does is compact into coin-partitioned Parquet
  * ([[coinHistory]] writer), after which all queries scan columnar.
  */
object CoinGecko {

  val currencyMap: MapType = MapType(StringType, DoubleType)

  val docSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("symbol", StringType),
    StructField("name", StringType),
    StructField("localization", MapType(StringType, StringType)),
    StructField("image", StructType(Seq(
      StructField("thumb", StringType),
      StructField("small", StringType)))),
    StructField("market_data", StructType(Seq(
      StructField("current_price", currencyMap),
      StructField("market_cap", currencyMap),
      StructField("total_volume", currencyMap))))))
  // community_data / developer_data / public_interest_stats are omitted
  // deliberately: they are mostly-null and developer_data nests an object
  // (code_additions_deletions_4_weeks) whose type drift could poison
  // whole-record parsing in PERMISSIVE mode. Spark ignores JSON fields
  // absent from the schema; nothing downstream reads them.

  /** Read a landing directory into the `coin_history` shape:
    * (coin_id, fetch_date, price_usd DECIMAL(24,8), response_data).
    * price_usd's decimal cast reproduces the reference's NUMERIC(24,8)
    * column (sql/create_tables.sql:7): Postgres rounds half-up on insert
    * and every downstream golden number depends on that quantization. */
  def coinHistory(spark: SparkSession, landingDir: String): DataFrame = {
    val raw = spark.read
      .schema(docSchema)
      .option("multiLine", true)
      .json(s"$landingDir/*/*.json")
      .withColumn("__file", input_file_name())
    raw.select(
      regexp_extract(col("__file"), "([a-z0-9-]+)_(\\d{4}-\\d{2}-\\d{2})\\.json$", 1)
        .as("coin_id"),
      to_date(regexp_extract(col("__file"), "_(\\d{4}-\\d{2}-\\d{2})\\.json$", 1))
        .as("fetch_date"),
      element_at(col("market_data.current_price"), "usd")
        .cast(DecimalType(24, 8)).as("price_usd"),
      struct(col("market_data")).as("response_data"))
  }

  /** Compact the landing zone into coin-partitioned, date-sorted Parquet —
    * the engine-side equivalent of the reference's indexed heap table
    * (create_tables.sql:15-16): partition pruning replaces the coin_id
    * index, row-group min/max on the sort replaces the date index. */
  def writeCoinHistory(df: DataFrame, tableDir: String): Unit =
    df.repartition(col("coin_id"))
      .sortWithinPartitions("coin_id", "fetch_date")
      .write.mode("overwrite")
      .partitionBy("coin_id")
      .parquet(tableDir)
}
