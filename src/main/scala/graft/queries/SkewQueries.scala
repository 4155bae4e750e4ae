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
      """)),

    // ----------------------------------------------------------------
    // q185: AUTO-ROUTED skew handling for the custom as-of exec — the
    // router (AsOfJoin.asofAutoSkew / SkewRoute) measures the left
    // key's max share from a bounded sample and picks the SALTED
    // sort-merge itself; no user hint names the hot key. The corpus is
    // INJECTED skew: events re-key to sk = (user_id when %10==0 else
    // 0), putting ~90% of rows on one key — the per-coin PARTITION BY
    // shape of the reference (sql/analysis_queries.sql:28, 3 keys)
    // taken to its hot-key extreme. Broadcast is disabled for the
    // routing decision (restored immediately) to reproduce the 100 TB
    // regime where the right side does NOT fit an executor — exactly
    // the regime where AQE cannot split the custom exec's exchange and
    // salting is the only non-straggling plan. The oracle is q41's
    // correlated-max SQL re-keyed to sk: whatever route the stats
    // pick, the rows must hash-match the plain as-of semantics.
    Q(
      "q185_asof_join_auto_skew",
      (s, dir) => {
        import graft.operators.AsOfJoin
        val ev = Tables.events(s, dir)
          .select(col("event_id"),
            when(col("user_id") % 10 === 0, col("user_id"))
              .otherwise(lit(0)).cast("bigint").as("sk"),
            col("ts"))
        val winner = org.apache.spark.sql.expressions.Window
          .partitionBy("sk", "o_orderdate")
          .orderBy(col("o_orderkey").desc)
        val orders = Tables.orders(s, dir)
          .withColumn("sk",
            when(col("o_custkey") % 10 === 0, col("o_custkey"))
              .otherwise(lit(0)).cast("bigint"))
          .withColumn("__rn", row_number().over(winner))
          .where(col("__rn") === 1)
          .select(col("sk"), col("o_orderdate"),
            col("o_orderkey").as("asof_orderkey"),
            col("o_totalprice").as("asof_totalprice"))
        // routing happens EAGERLY inside asofAutoSkew; both confs are
        // restored before the (lazy) result plan ever executes, and the
        // salted route pins broadcast=Some(false) explicitly so no
        // later planning re-reads the threshold
        val prevB = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
        val prevM = scala.util.Try(
          s.conf.get("spark.graft.skew.minRows")).toOption
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.graft.skew.minRows", "500")
        try
          AsOfJoin.asofAutoSkew(
            ev, orders, "sk", "sk", "ts", "o_orderdate",
            payload = Seq("asof_orderkey", "asof_totalprice"),
            hotShare = Some(0.5), buckets = Some(8))
            .select("event_id", "sk", "ts", "asof_orderkey",
              "asof_totalprice")
            .orderBy("event_id")
        finally {
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
          prevM match {
            case Some(v) => s.conf.set("spark.graft.skew.minRows", v)
            case None => s.conf.unset("spark.graft.skew.minRows")
          }
        }
      },
      Some("""
        WITH e AS (
          SELECT event_id,
                 CAST(CASE WHEN user_id % 10 = 0 THEN user_id ELSE 0 END
                      AS BIGINT) AS sk,
                 ts
          FROM events),
        o AS (
          SELECT CAST(CASE WHEN o_custkey % 10 = 0 THEN o_custkey ELSE 0 END
                      AS BIGINT) AS sk,
                 o_orderdate, o_orderkey, o_totalprice
          FROM orders),
        ded AS (
          SELECT sk, o_orderdate, MAX(o_orderkey) AS asof_orderkey
          FROM o GROUP BY 1, 2),
        winner AS (
          SELECT d.sk, d.o_orderdate, d.asof_orderkey,
                 o2.o_totalprice AS asof_totalprice
          FROM ded d JOIN orders o2 ON o2.o_orderkey = d.asof_orderkey)
        SELECT e.event_id, e.sk, e.ts, w.asof_orderkey, w.asof_totalprice
        FROM e
        LEFT JOIN winner w ON w.sk = e.sk AND w.o_orderdate = (
          SELECT MAX(o3.o_orderdate) FROM o o3
          WHERE o3.sk = e.sk AND o3.o_orderdate <= e.ts)
        ORDER BY e.event_id
      """))
  )
}
