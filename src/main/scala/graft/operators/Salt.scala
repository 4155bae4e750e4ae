package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation via salting: the two-phase aggregate and the
  * replicated broadcast join for hot keys.
  *
  * At 100 TB a handful of hot keys (one coin with 100x the rows, one
  * viral document shingle) turns a single shuffle partition into the
  * job's critical path. Salting splits each hot key into `buckets`
  * sub-keys: aggregates run partial-per-salt then merge (associative aggs
  * only); joins replicate the small side per salt so every sub-key still
  * finds its match. AQE's skew-join handles the sort-merge case at
  * runtime; salting is the declarative fallback that also covers
  * aggregations, which AQE does not rebalance.
  */
object Salt {

  /** Deterministic salt in [0, buckets) derived from stable row content —
    * not rand(), so retries/recomputations of a task salt identically
    * (a lost-executor retry with rand() would double-count rows in a
    * two-phase aggregate). */
  def saltCol(stableCol: Column, buckets: Int): Column =
    pmod(xxhash64(stableCol), lit(buckets))

  /** Two-phase salted aggregation: sum-like (associative, mergeable)
    * measures per (key, salt), then merged per key. `partials` maps each
    * output column name to its (phase1, phase2) aggregate builders. */
  def saltedSum(df: DataFrame, keys: Seq[String], stableCol: Column,
                buckets: Int, sums: Map[String, Column]): DataFrame = {
    val phase1 = df
      .withColumn("__salt", saltCol(stableCol, buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        sums.head._2.as(sums.head._1),
        sums.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col(sums.head._1)).as(sums.head._1),
        sums.tail.keys.map(n => sum(col(n)).as(n)).toSeq: _*)
  }

  /** Salted broadcast-style join for a skewed LEFT side: the right
    * (small) side is replicated `buckets` times with an explicit salt
    * column so the join key becomes (key, salt) and hot keys spread over
    * `buckets` partitions. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 stableCol: Column, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(stableCol, buckets))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
