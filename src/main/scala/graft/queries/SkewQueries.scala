package graft.queries

import graft.{Q, Tables}
import graft.operators.Salt
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-handling suite: salted two-phase aggregation and salted join.
  * Salting is semantics-preserving, so both queries oracle-check against
  * the plain (unsalted) SQL — the point demonstrated is that the salted
  * plans spread each hot key over N partitions while producing identical
  * results.
  */
object SkewQueries {
  import graft.Q._

  val defs: Vector[Q] = Vector(
    // ----------------------------------------------------------------
    // q39: two-phase salted aggregation over a 5-hot-key distribution
    // (100k events / 5 event types — exactly the shape where one reducer
    // becomes the critical path at 100 TB). Phase 1 aggregates per
    // (key, salt) map-side-combinable; phase 2 merges 16 partials per key.
    Q(
      "q39_salted_agg_event_totals",
      (s, dir) => {
        Salt.saltedSum(
          Tables.events(s, dir),
          keys = Seq("event_type"),
          stableCol = col("event_id"),
          buckets = 16,
          sums = Map(
            "total_value" -> sum(dec2(col("value"))),
            "n" -> count(lit(1))))
          .select(
            col("event_type"),
            col("total_value").cast(DoubleType).as("total_value"),
            col("n"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
      """)),

    // ----------------------------------------------------------------
    // q40: salted join — lineitem's 10 supplier keys are pathologically
    // hot (60k rows/key at sf0.1); replicating the tiny supplier dim per
    // salt turns 10 mega-partitions into 10x16 balanced ones.
    Q(
      "q40_salted_join_supplier_volume",
      (s, dir) => {
        val joined = Salt.saltedJoin(
          Tables.lineitem(s, dir).select(col("l_suppkey").as("s_suppkey"),
            col("l_orderkey"), col("l_quantity")),
          Tables.supplier(s, dir),
          key = "s_suppkey",
          stableCol = col("l_orderkey"),
          buckets = 16)
        joined.groupBy(col("s_name").as("supplier"))
          .agg(
            sumExact(col("l_quantity")).as("total_qty"),
            count(lit(1)).as("n_items"))
          .orderBy("supplier")
      },
      Some("""
        SELECT s_name AS supplier,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
               COUNT(*) AS n_items
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1 ORDER BY 1
      """))
  )
}
