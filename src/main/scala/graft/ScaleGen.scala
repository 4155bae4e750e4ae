package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus generator for the SCALE-GROWTH audit
  * (SCALING.md): the same generator emits a 1x corpus (sized like
  * /root/testdata/sf0.1 per TESTDATA.md) and a 10x corpus, so measured
  * time ratios between the two isolate PLAN growth from data-shape
  * drift. `runMain graft.ScaleGen <outDir> <mult>`.
  *
  * Design constraints that make the ratios meaningful:
  *
  *  - **Pure column arithmetic.** Every value is a function of
  *    `xxhash64(id, tag)` over `spark.range` — no RNG state, no driver
  *    loops, codegen end to end; generating the 10x corpus is itself a
  *    distributed job (~7 M rows in seconds).
  *  - **Duplicate clusters of BOUNDED size.** Near/exact-dup documents
  *    come in clusters of <= 3 (one parent at id%17==0, a perturbed
  *    near-dup at +3, an exact dup at +9); embedding near-dups in pairs
  *    (+5 of every id%23==5). Pair counts therefore grow LINEARLY with
  *    the corpus — the property that lets a time ratio be read as plan
  *    behavior rather than quadratic pair blow-up in the data itself.
  *  - **Vocabulary grows with cube-root of scale.** Shingle-family
  *    queries key on word TRIGRAMS, so holding the vocabulary fixed
  *    while scaling docs 10x would inflate every trigram's document
  *    frequency 10x and flip the df<=20 rare-shingle cap from "keeps
  *    most" to "drops most" — the two scales would run different
  *    effective queries. V ~ 64 * cbrt(mult) keeps instances/V^3 (the
  *    expected per-trigram df) constant across scales.
  *  - **Fixed time ranges, scaled entity counts.** events keeps its
  *    30-day span and scales users 10x (per-user density constant, so
  *    per-session row counts don't drift); orders keeps the 1995-2001
  *    date span and scales customers 10x (per-customer order count and
  *    touched rollup groups stay constant).
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <outDir> <mult>")
    val outDir = args(0)
    val mult = args(1).toInt
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, outDir, mult)
    spark.stop()
  }

  def generate(spark: SparkSession, outDir: String, mult: Int): Unit = {
    val vocabSize = math.round(64 * math.cbrt(mult.toDouble)).toInt
    val nCust = 15000L * mult
    val nSupp = 1000L * mult
    val nPart = 20000L * mult
    val nOrders = 150000L * mult
    val nLineitem = 600000L * mult
    val nEvents = 100000L * mult
    val nDocs = 5000L * mult
    val nEmb = 2000L * mult
    val nUsers = 1500L * mult

    def save(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    save(spark.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      concat(lit("region_"), col("id")).as("r_name")), "region")

    save(spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("nation_"), col("id")).as("n_name"),
      pmod(col("id"), lit(5)).cast("int").as("n_regionkey")), "nation")

    save(spark.range(nCust).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), col("id")).as("c_name"),
      pmod(xxhash64(col("id"), lit(29)), lit(25)).cast("int").as("c_nationkey"),
      round((pmod(xxhash64(col("id"), lit(31)), lit(1100000)) - 100000) / 100.0, 2)
        .as("c_acctbal"),
      element_at(
        array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
          lit("MACHINERY"), lit("HOUSEHOLD")),
        (pmod(xxhash64(col("id"), lit(33)), lit(5)) + 1).cast("int"))
        .as("c_mktsegment")), "customer")

    save(spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), col("id")).as("s_name"),
      pmod(xxhash64(col("id"), lit(59)), lit(25)).cast("int").as("s_nationkey"),
      round((pmod(xxhash64(col("id"), lit(61)), lit(1100000)) - 100000) / 100.0, 2)
        .as("s_acctbal")), "supplier")

    save(spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(lit("part w"), pmod(xxhash64(col("id"), lit(67)), lit(vocabSize)),
        lit(" w"), pmod(xxhash64(col("id"), lit(71)), lit(vocabSize))).as("p_name"),
      concat(lit("Brand#"),
        pmod(xxhash64(col("id"), lit(73)), lit(5)) + 1,
        pmod(xxhash64(col("id"), lit(79)), lit(5)) + 1).as("p_brand"),
      element_at(
        array(lit("STANDARD"), lit("SMALL"), lit("MEDIUM"), lit("LARGE"),
          lit("ECONOMY"), lit("PROMO")),
        (pmod(xxhash64(col("id"), lit(83)), lit(6)) + 1).cast("int")).as("p_type"),
      (pmod(xxhash64(col("id"), lit(89)), lit(50)) + 1).cast("int").as("p_size"),
      round((pmod(xxhash64(col("id"), lit(97)), lit(190000)) + 10000) / 100.0, 2)
        .as("p_retailprice")), "part")

    save(spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(col("id"), lit(101)), lit(nCust)).as("o_custkey"),
      element_at(array(lit("O"), lit("F"), lit("P")),
        (pmod(xxhash64(col("id"), lit(103)), lit(3)) + 1).cast("int"))
        .as("o_orderstatus"),
      round((pmod(xxhash64(col("id"), lit(107)), lit(45000000)) + 100000) / 100.0, 2)
        .as("o_totalprice"),
      expr("cast(date_add(date'1995-01-01', " +
        "cast(pmod(xxhash64(id, 109), 2405) as int)) as timestamp)")
        .as("o_orderdate"),
      element_at(
        array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
          lit("4-NOT SPECIFIED"), lit("5-LOW")),
        (pmod(xxhash64(col("id"), lit(113)), lit(5)) + 1).cast("int"))
        .as("o_orderpriority")), "orders")

    save(spark.range(nLineitem).select(
      (col("id") / 4).cast("bigint").as("l_orderkey"),
      pmod(xxhash64(col("id"), lit(127)), lit(nPart)).as("l_partkey"),
      pmod(xxhash64(col("id"), lit(131)), lit(nSupp)).as("l_suppkey"),
      (pmod(col("id"), lit(4)) + 1).cast("int").as("l_linenumber"),
      (pmod(xxhash64(col("id"), lit(137)), lit(50)) + 1).cast("double")
        .as("l_quantity"),
      round((pmod(xxhash64(col("id"), lit(139)), lit(9000000)) + 100000) / 100.0, 2)
        .as("l_extendedprice"),
      (pmod(xxhash64(col("id"), lit(149)), lit(11)).cast("double") / 100.0)
        .as("l_discount"),
      (pmod(xxhash64(col("id"), lit(151)), lit(9)).cast("double") / 100.0)
        .as("l_tax"),
      element_at(array(lit("A"), lit("N"), lit("R")),
        (pmod(xxhash64(col("id"), lit(157)), lit(3)) + 1).cast("int"))
        .as("l_returnflag"),
      element_at(array(lit("O"), lit("F")),
        (pmod(xxhash64(col("id"), lit(163)), lit(2)) + 1).cast("int"))
        .as("l_linestatus"),
      expr("cast(date_add(date'1995-01-01', " +
        "cast(pmod(xxhash64(id, 167), 2405) as int)) as timestamp)")
        .as("l_shipdate")), "lineitem")

    // ts is INT64 NANOS to match the driver's events layout (read via
    // Tables.events' `ts div 1000` + timestamp_micros path); values are
    // microsecond-aligned so that truncation stays lossless.
    val nsPerEvent = (2592000.0e6 / nEvents).toLong * 1000L
    save(spark.range(nEvents).select(
      col("id").as("event_id"),
      (lit(1704067200000000000L) + col("id") * nsPerEvent +
        pmod(xxhash64(col("id"), lit(173)), lit(1000000L)) * 1000L).as("ts"),
      pmod(xxhash64(col("id"), lit(179)), lit(nUsers)).as("user_id"),
      element_at(
        array(lit("click"), lit("view"), lit("purchase"), lit("signup"),
          lit("error")),
        (pmod(xxhash64(col("id"), lit(181)), lit(5)) + 1).cast("int"))
        .as("event_type"),
      round(pmod(xxhash64(col("id"), lit(191)), lit(50000)) / 100.0, 2)
        .as("value"),
      concat(lit("{\"k\": "), pmod(xxhash64(col("id"), lit(193)), lit(100)),
        lit("}")).as("props")), "events")

    // documents: Zipf-ish word draw (quadratic bias toward low vocab
    // indices gives q99's heavy hitters something to find), dup clusters
    // of <= 3 every 17 ids, vocabulary V ~ 64 * cbrt(mult).
    val docs = spark.range(nDocs)
      .withColumn("base_id",
        when(pmod(col("id"), lit(17)).isin(3L, 9L),
          col("id") - pmod(col("id"), lit(17))).otherwise(col("id")))
      .withColumn("n_words",
        (pmod(xxhash64(col("base_id"), lit(197)), lit(79)) + 12).cast("int"))
      .withColumn("body", expr(
        s"""array_join(transform(sequence(1, n_words), i -> concat('w',
            cast(pow(pmod(xxhash64(base_id, i, 199), 1000000) / 1000000.0, 2.0)
                 * $vocabSize as int))), ' ')"""))
      // id%17==3 -> near-dup (two extra words); id%17==9 -> exact dup
      .withColumn("text",
        when(pmod(col("id"), lit(17)) === 3,
          concat(col("body"),
            lit(" w"), pmod(xxhash64(col("id"), lit(211)), lit(vocabSize)),
            lit(" w"), pmod(xxhash64(col("id"), lit(223)), lit(vocabSize))))
          .otherwise(col("body")))
      .select(
        col("id").as("doc_id"),
        col("text"),
        element_at(
          array(lit("en"), lit("en"), lit("zh"), lit("es"), lit("fr"), lit("de")),
          (pmod(xxhash64(col("id"), lit(227)), lit(6)) + 1).cast("int")).as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        length(col("text")).as("n_chars"))
    save(docs, "documents")

    // embeddings: 64-dim floats in [-1, 1]; near-dup PAIRS (id%23==5
    // copies id-5 plus a ~1% perturbation) so threshold queries find
    // linearly many pairs.
    val emb = spark.range(nEmb)
      .withColumn("base_id",
        when(pmod(col("id"), lit(23)) === 5, col("id") - 5).otherwise(col("id")))
      .withColumn("is_dup", pmod(col("id"), lit(23)) === 5)
      .select(
        col("id").as("vec_id"),
        expr("""transform(sequence(1, 64), d -> cast(
            (pmod(xxhash64(base_id, d, 229), 2000001) - 1000000) / 1000000.0
            + (case when is_dup then
                 (pmod(xxhash64(vec_id, d, 233), 2001) - 1000) / 1000000.0 * 20.0
               else 0.0 end) as float))""").as("embedding"),
        pmod(xxhash64(col("id"), lit(239)), lit(10)).cast("int").as("label"))
    save(emb, "embeddings")
  }
}
