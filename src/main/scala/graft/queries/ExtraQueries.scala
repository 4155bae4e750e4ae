package graft.queries

import graft.{Q, Tables}
import graft.operators.{AsOfJoin, Rolling}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Coverage extensions beyond the reference surface: as-of join, CUBE
  * grouping sets, global top-k, and approximate sketches (SURVEY.md §2.E
  * gaps the engine fills as a "complete" library).
  */
object ExtraQueries {
  import graft.Q._

  val defs: Vector[Q] = Vector(
    // ----------------------------------------------------------------
    // q41: backward as-of join — each event picks up the latest order of
    // the same customer at or before the event time, via the scalable
    // union+window formulation (one shuffle+sort per key, no theta join).
    // Right side pre-deduplicated per (key, time) with max(o_orderkey) so
    // tie behavior is deterministic; the oracle mirrors that rule with a
    // correlated max.
    Q(
      "q41_asof_join_latest_order",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
        val winner = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey", "o_orderdate")
          .orderBy(col("o_orderkey").desc)
        val orders = Tables.orders(s, dir)
          .withColumn("__rn", row_number().over(winner))
          .where(col("__rn") === 1)
          .select(col("o_custkey"), col("o_orderdate"),
            col("o_orderkey").as("asof_orderkey"),
            col("o_totalprice").as("asof_totalprice"))
        AsOfJoin.asofBackward(
          ev, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("asof_orderkey", "asof_totalprice"))
          .orderBy("event_id")
      },
      Some("""
        WITH ded AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS asof_orderkey
          FROM orders GROUP BY 1, 2
        ), winner AS (
          SELECT d.o_custkey, d.o_orderdate, d.asof_orderkey,
                 o.o_totalprice AS asof_totalprice
          FROM ded d JOIN orders o ON o.o_orderkey = d.asof_orderkey
        )
        SELECT e.event_id, e.user_id, e.ts, w.asof_orderkey, w.asof_totalprice
        FROM events e
        LEFT JOIN winner w ON w.o_custkey = e.user_id AND w.o_orderdate = (
          SELECT MAX(o2.o_orderdate) FROM orders o2
          WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)
        ORDER BY e.event_id
      """)),

    // ----------------------------------------------------------------
    // q122: the SAME as-of semantics through the engine's native
    // physical operator (AsOfJoinPlan → GraftStrategies → AsOfJoinExec:
    // one co-partitioned sort-merge pass, no union row inflation, no
    // window buffer) — gated by q41's oracle VERBATIM, so the custom
    // SparkPlan is held to the identical hash-exact bar as the
    // DataFrame formulation it replaces.
    Q(
      "q122_asof_join_native",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
        val winner = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey", "o_orderdate")
          .orderBy(col("o_orderkey").desc)
        val orders = Tables.orders(s, dir)
          .withColumn("__rn", row_number().over(winner))
          .where(col("__rn") === 1)
          .select(col("o_custkey"), col("o_orderdate"),
            col("o_orderkey").as("asof_orderkey"),
            col("o_totalprice").as("asof_totalprice"))
        AsOfJoin.asofBackwardNative(
          ev, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("asof_orderkey", "asof_totalprice"))
          .orderBy("event_id")
      },
      Some("""
        WITH ded AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS asof_orderkey
          FROM orders GROUP BY 1, 2
        ), winner AS (
          SELECT d.o_custkey, d.o_orderdate, d.asof_orderkey,
                 o.o_totalprice AS asof_totalprice
          FROM ded d JOIN orders o ON o.o_orderkey = d.asof_orderkey
        )
        SELECT e.event_id, e.user_id, e.ts, w.asof_orderkey, w.asof_totalprice
        FROM events e
        LEFT JOIN winner w ON w.o_custkey = e.user_id AND w.o_orderdate = (
          SELECT MAX(o2.o_orderdate) FROM orders o2
          WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)
        ORDER BY e.event_id
      """)),

    // ----------------------------------------------------------------
    // q123: the SAME as-of semantics through the BROADCAST physical
    // operator (BroadcastAsOfJoinExec: right side broadcast as a
    // per-key sorted index, fact side a pure map — no shuffle, no
    // sort of the left) — gated by q41's oracle VERBATIM, the third
    // formulation held to the identical hash-exact bar.
    Q(
      "q123_asof_join_broadcast",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
        val winner = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey", "o_orderdate")
          .orderBy(col("o_orderkey").desc)
        val orders = Tables.orders(s, dir)
          .withColumn("__rn", row_number().over(winner))
          .where(col("__rn") === 1)
          .select(col("o_custkey"), col("o_orderdate"),
            col("o_orderkey").as("asof_orderkey"),
            col("o_totalprice").as("asof_totalprice"))
        AsOfJoin.asofBackwardBroadcast(
          ev, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("asof_orderkey", "asof_totalprice"))
          .orderBy("event_id")
      },
      Some("""
        WITH ded AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS asof_orderkey
          FROM orders GROUP BY 1, 2
        ), winner AS (
          SELECT d.o_custkey, d.o_orderdate, d.asof_orderkey,
                 o.o_totalprice AS asof_totalprice
          FROM ded d JOIN orders o ON o.o_orderkey = d.asof_orderkey
        )
        SELECT e.event_id, e.user_id, e.ts, w.asof_orderkey, w.asof_totalprice
        FROM events e
        LEFT JOIN winner w ON w.o_custkey = e.user_id AND w.o_orderdate = (
          SELECT MAX(o2.o_orderdate) FROM orders o2
          WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)
        ORDER BY e.event_id
      """)),

    // ----------------------------------------------------------------
    // q124: FORWARD as-of through the native operator — for every
    // event, the EARLIEST order at-or-after it (the "next purchase
    // after a click" attribution shape). Oracle mirrors q41's
    // correlated-extreme SQL with MIN/>= — the direction flag is held
    // to the same hash-exact bar as the backward paths.
    Q(
      "q124_asof_join_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
        val winner = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey", "o_orderdate")
          .orderBy(col("o_orderkey").desc)
        val orders = Tables.orders(s, dir)
          .withColumn("__rn", row_number().over(winner))
          .where(col("__rn") === 1)
          .select(col("o_custkey"), col("o_orderdate"),
            col("o_orderkey").as("next_orderkey"),
            col("o_totalprice").as("next_totalprice"))
        AsOfJoin.asofForwardNative(
          ev, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("next_orderkey", "next_totalprice"))
          .orderBy("event_id")
      },
      Some("""
        WITH ded AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS next_orderkey
          FROM orders GROUP BY 1, 2
        ), winner AS (
          SELECT d.o_custkey, d.o_orderdate, d.next_orderkey,
                 o.o_totalprice AS next_totalprice
          FROM ded d JOIN orders o ON o.o_orderkey = d.next_orderkey
        )
        SELECT e.event_id, e.user_id, e.ts, w.next_orderkey, w.next_totalprice
        FROM events e
        LEFT JOIN winner w ON w.o_custkey = e.user_id AND w.o_orderdate = (
          SELECT MIN(o2.o_orderdate) FROM orders o2
          WHERE o2.o_custkey = e.user_id AND o2.o_orderdate >= e.ts)
        ORDER BY e.event_id
      """)),

    // ----------------------------------------------------------------
    // q125: NEAREST as-of — the closer of the backward/forward matches
    // per event (tie → backward, pandas merge_asof rule), composed from
    // the two native operators. Oracle picks the same winner with a
    // correlated ORDER BY distance LIMIT 1 — an INDEPENDENT algorithm,
    // so the composition's choose-nearer projection is value-checked,
    // not mirrored.
    Q(
      "q125_asof_join_nearest",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
        val winner = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey", "o_orderdate")
          .orderBy(col("o_orderkey").desc)
        val orders = Tables.orders(s, dir)
          .withColumn("__rn", row_number().over(winner))
          .where(col("__rn") === 1)
          .select(col("o_custkey"), col("o_orderdate"),
            col("o_orderkey").as("near_orderkey"),
            col("o_totalprice").as("near_totalprice"))
        AsOfJoin.asofNearestNative(
          ev, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("near_orderkey", "near_totalprice"))
          .orderBy("event_id")
      },
      Some("""
        WITH ded AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS near_orderkey
          FROM orders GROUP BY 1, 2
        ), winner AS (
          SELECT d.o_custkey, d.o_orderdate, d.near_orderkey,
                 o.o_totalprice AS near_totalprice
          FROM ded d JOIN orders o ON o.o_orderkey = d.near_orderkey
        )
        SELECT e.event_id, e.user_id, e.ts, w.near_orderkey, w.near_totalprice
        FROM events e
        LEFT JOIN winner w ON w.o_custkey = e.user_id AND w.o_orderdate = (
          SELECT o2.o_orderdate FROM orders o2
          WHERE o2.o_custkey = e.user_id
          ORDER BY (CASE WHEN CAST(o2.o_orderdate AS TIMESTAMP) <= e.ts
                         THEN e.ts - CAST(o2.o_orderdate AS TIMESTAMP)
                         ELSE CAST(o2.o_orderdate AS TIMESTAMP) - e.ts END) ASC,
                   (CAST(o2.o_orderdate AS TIMESTAMP) <= e.ts) DESC
          LIMIT 1)
        ORDER BY e.event_id
      """)),

    // ----------------------------------------------------------------
    // q121: STREAM-STATIC as-of enrichment — the broadcast as-of
    // operator deployed as a continuous pipeline: the event stream is
    // micro-batched (several files, maxFilesPerTrigger) through
    // foreachBatch, each batch enriched against the STATIC deduped
    // order dimension by asofBackwardBroadcast (dim broadcast once per
    // batch; the event stream is never shuffled or sorted — per-row
    // cost is a hash probe + binary search). As-of enrichment is
    // row-wise against a fixed right side, so the union of all batches
    // must equal the one-shot batch join — which is why this entry is
    // gated by q41's oracle VERBATIM, the same hash-exact bar as the
    // three batch formulations. (StreamAsOfSpec additionally pins the
    // checkpoint-resume path.) Fills the registry numbering hole the
    // round-11 audit flagged.
    Q(
      "q121_stream_asof_enrich",
      (s, dir) => {
        val out = Q.scratch(s, "q121_streamasof", dir)
        def rm(f: java.io.File): Unit = graft.Q.rmrf(f)
        rm(new java.io.File(out))
        val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
        ev.repartition(4).write.parquet(s"$out/in")
        val winner = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey", "o_orderdate")
          .orderBy(col("o_orderkey").desc)
        val orders = Tables.orders(s, dir)
          .withColumn("__rn", row_number().over(winner))
          .where(col("__rn") === 1)
          .select(col("o_custkey"), col("o_orderdate"),
            col("o_orderkey").as("asof_orderkey"),
            col("o_totalprice").as("asof_totalprice"))
        val q = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "2").parquet(s"$out/in")
          .writeStream
          .option("checkpointLocation", s"$out/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            AsOfJoin.asofBackwardBroadcast(b, orders,
                "user_id", "o_custkey", "ts", "o_orderdate",
                Seq("asof_orderkey", "asof_totalprice"))
              .write.mode("append").parquet(s"$out/enriched")
          }
          .start()
        if (!q.awaitTermination(300000)) {
          q.stop()
          throw new IllegalStateException("q121 drain did not finish in 300 s")
        }
        s.read.parquet(s"$out/enriched")
          .select("event_id", "user_id", "ts", "asof_orderkey", "asof_totalprice")
          .orderBy("event_id")
      },
      Some("""
        WITH ded AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS asof_orderkey
          FROM orders GROUP BY 1, 2
        ), winner AS (
          SELECT d.o_custkey, d.o_orderdate, d.asof_orderkey,
                 o.o_totalprice AS asof_totalprice
          FROM ded d JOIN orders o ON o.o_orderkey = d.asof_orderkey
        )
        SELECT e.event_id, e.user_id, e.ts, w.asof_orderkey, w.asof_totalprice
        FROM events e
        LEFT JOIN winner w ON w.o_custkey = e.user_id AND w.o_orderdate = (
          SELECT MAX(o2.o_orderdate) FROM orders o2
          WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)
        ORDER BY e.event_id
      """)),

    // ----------------------------------------------------------------
    // q137: UNHINTED as-of join — the native operator with the
    // physical strategy left to the planner (GraftStrategies mirrors
    // JoinSelection: broadcast iff the right side's size estimate fits
    // spark.sql.autoBroadcastJoinThreshold, else co-partitioned
    // sort-merge). Gated by q41's oracle VERBATIM: whichever exec the
    // stats pick must produce the identical hash-exact rows — which is
    // precisely the property that makes the cost-based choice safe to
    // leave to the engine at 100 TB, where the dim side's size varies
    // by deployment and a hard-coded hint rots.
    Q(
      "q137_asof_join_auto",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
        val winner = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey", "o_orderdate")
          .orderBy(col("o_orderkey").desc)
        val orders = Tables.orders(s, dir)
          .withColumn("__rn", row_number().over(winner))
          .where(col("__rn") === 1)
          .select(col("o_custkey"), col("o_orderdate"),
            col("o_orderkey").as("asof_orderkey"),
            col("o_totalprice").as("asof_totalprice"))
        AsOfJoin.asofBackwardAuto(
          ev, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("asof_orderkey", "asof_totalprice"))
          .orderBy("event_id")
      },
      Some("""
        WITH ded AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS asof_orderkey
          FROM orders GROUP BY 1, 2
        ), winner AS (
          SELECT d.o_custkey, d.o_orderdate, d.asof_orderkey,
                 o.o_totalprice AS asof_totalprice
          FROM ded d JOIN orders o ON o.o_orderkey = d.asof_orderkey
        )
        SELECT e.event_id, e.user_id, e.ts, w.asof_orderkey, w.asof_totalprice
        FROM events e
        LEFT JOIN winner w ON w.o_custkey = e.user_id AND w.o_orderdate = (
          SELECT MAX(o2.o_orderdate) FROM orders o2
          WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)
        ORDER BY e.event_id
      """)),

    // ----------------------------------------------------------------
    // q187: STREAMING SALTED as-of — the one as-of deployment the
    // registry had not exercised: the fact side arrives as a
    // micro-batched stream and each batch runs the SALTED sort-merge
    // (asofSalted, 8 buckets) against the static deduped orders —
    // the deployment for a hot-keyed fact stream whose right side is
    // too big to broadcast, where AQE cannot split the custom exec's
    // exchange (q185's regime, streamed). q152's two-wave resume
    // protocol: input lands in TWO waves, the stream STARTS TWICE on
    // one checkpoint, the second start must process only wave 2.
    // Backward as-of against a static right is row-local per left
    // row, so the union of per-batch outputs equals the one-shot
    // batch join — held to q41's oracle VERBATIM (the sixth
    // formulation under that one gate).
    Q(
      "q187_stream_asof_salted",
      (s, dir) => {
        val out = graft.Q.scratch(s, "q187_streamasof", dir)
        def rm(f: java.io.File): Unit = graft.Q.rmrf(f)
        rm(new java.io.File(out))
        val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
        val winner = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey", "o_orderdate")
          .orderBy(col("o_orderkey").desc)
        val orders = Tables.orders(s, dir)
          .withColumn("__rn", row_number().over(winner))
          .where(col("__rn") === 1)
          .select(col("o_custkey"), col("o_orderdate"),
            col("o_orderkey").as("asof_orderkey"),
            col("o_totalprice").as("asof_totalprice"))
        def drain(): Unit = {
          val q = s.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$out/in")
            .writeStream
            .option("checkpointLocation", s"$out/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              AsOfJoin.asofSalted(b, orders,
                  "user_id", "o_custkey", "ts", "o_orderdate",
                  payload = Seq("asof_orderkey", "asof_totalprice"),
                  buckets = 8)
                .write.mode("append").parquet(s"$out/joined")
            }
            .start()
          if (!q.awaitTermination(300000)) {
            q.stop()
            throw new IllegalStateException("q187 drain did not finish in 300 s")
          }
        }
        ev.where(col("event_id") % 2 === 0).repartition(2)
          .write.parquet(s"$out/in")
        drain()
        ev.where(col("event_id") % 2 === 1).repartition(2)
          .write.mode("append").parquet(s"$out/in")
        drain()
        s.read.parquet(s"$out/joined")
          .select("event_id", "user_id", "ts", "asof_orderkey",
            "asof_totalprice")
          .orderBy("event_id")
      },
      Some("""
        WITH ded AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS asof_orderkey
          FROM orders GROUP BY 1, 2
        ), winner AS (
          SELECT d.o_custkey, d.o_orderdate, d.asof_orderkey,
                 o.o_totalprice AS asof_totalprice
          FROM ded d JOIN orders o ON o.o_orderkey = d.asof_orderkey
        )
        SELECT e.event_id, e.user_id, e.ts, w.asof_orderkey, w.asof_totalprice
        FROM events e
        LEFT JOIN winner w ON w.o_custkey = e.user_id AND w.o_orderdate = (
          SELECT MAX(o2.o_orderdate) FROM orders o2
          WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)
        ORDER BY e.event_id
      """)),

    // ----------------------------------------------------------------
    // q126: per-key daily gap fill + linear interpolation (the pandas
    // reindex().ffill() / interpolate() pair over the events series) —
    // per-key spine from its own bounds (never a global calendar cross
    // join), one keyed join, one window partition for both directions.
    // MAX per day (order-independent), never SUM-of-doubles, keeps the
    // daily value engine-deterministic; the interpolation formula's
    // operation order matches the oracle's exactly for bit-equal
    // doubles.
    Q(
      "q126_gap_fill_interpolate",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
          .groupBy("user_id", "d").agg(max("value").as("v"))
        graft.operators.GapFill.fillDaily(daily, "user_id", "d", "v")
          .select("user_id", "d", "v", "v_locf", "v_interp")
          .orderBy("user_id", "d")
      },
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d, MAX(value) AS v
          FROM events GROUP BY 1, 2
        ), bounds AS (
          SELECT user_id, MIN(d) AS dmin, MAX(d) AS dmax FROM daily GROUP BY 1
        ), spine AS (
          SELECT b.user_id, CAST(gs.g AS DATE) AS d
          FROM bounds b, UNNEST(generate_series(b.dmin, b.dmax, INTERVAL 1 DAY)) AS gs(g)
        ), j AS (
          SELECT s.user_id, s.d, daily.v
          FROM spine s LEFT JOIN daily ON daily.user_id = s.user_id AND daily.d = s.d
        ), win AS (
          SELECT user_id, d, v,
            last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
            first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY d
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
          FROM j
        )
        SELECT user_id, d, v, pv AS v_locf,
          CASE WHEN v IS NOT NULL THEN v
               WHEN pv IS NULL THEN NULL
               WHEN nv IS NULL THEN pv
               ELSE pv + (nv - pv) * (CAST(d - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
          END AS v_interp
        FROM win ORDER BY user_id, d
      """)),

    // ----------------------------------------------------------------
    // q127: daily OHLC resample — the classic market-data downsample
    // (pandas resample('D').ohlc()) as ONE hash aggregate: open/close
    // come from min/max over struct(ts, event_id, value) (lexicographic
    // struct extremes: earliest/latest event's value, event_id breaking
    // ts ties deterministically), so the plan is partial+final agg
    // around a single keyed exchange — no sort, no window. The oracle
    // derives open/close with an INDEPENDENT row_number formulation.
    Q(
      "q127_ohlc_resample",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"),
            col("ts"), col("event_id"), col("value"))
        ev.groupBy("user_id", "d").agg(
            min(struct(col("ts"), col("event_id"), col("value")))
              .getField("value").as("px_open"),
            max(col("value")).as("px_high"),
            min(col("value")).as("px_low"),
            max(struct(col("ts"), col("event_id"), col("value")))
              .getField("value").as("px_close"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id", "d")
      },
      Some("""
        WITH ranked AS (
          SELECT user_id, CAST(ts AS DATE) AS d, value,
            row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
              ORDER BY ts, event_id) AS rn_a,
            row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
              ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events
        )
        SELECT user_id, d,
          MAX(CASE WHEN rn_a = 1 THEN value END) AS px_open,
          MAX(value) AS px_high,
          MIN(value) AS px_low,
          MAX(CASE WHEN rn_d = 1 THEN value END) AS px_close,
          COUNT(*) AS n_events
        FROM ranked GROUP BY 1, 2
        ORDER BY user_id, d
      """)),

    // ----------------------------------------------------------------
    // q128: per-key EWMA (pandas ewm(0.5, adjust=False).mean()) over
    // the daily series — a RECURSIVE feature no window frame can
    // express, folded per key after one exchange (the Sessionize
    // shape). α=0.5 makes both fold coefficients exact binary doubles,
    // so the oracle's recursive CTE replays the identical rounding
    // sequence and the DOUBLES hash-match bit-exactly.
    Q(
      "q128_ewma_daily",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
          .groupBy("user_id", "d").agg(max("value").as("v"))
          .select(col("user_id"),
            datediff(col("d"), lit("1970-01-01").cast("date")).as("t"),
            col("v"))
        graft.operators.Ewma.ewmaByKey(daily, "user_id", "t", "v", alpha = 0.5)
          .orderBy("user_id", "t")
      },
      Some("""
        WITH RECURSIVE daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d, MAX(value) AS v
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT user_id, (d - DATE '1970-01-01') AS t, v,
            row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
          FROM daily
        ), rec AS (
          SELECT user_id, t, v, rn, v AS ewma FROM ranked WHERE rn = 1
          UNION ALL
          SELECT r.user_id, r.t, r.v, r.rn,
                 (1 - 0.5) * p.ewma + 0.5 * r.v
          FROM ranked r JOIN rec p
            ON p.user_id = r.user_id AND r.rn = p.rn + 1
        )
        SELECT user_id, t, v, ewma FROM rec ORDER BY user_id, t
      """)),

    // ----------------------------------------------------------------
    // q129: running peak + drawdown per key (the max-drawdown feature
    // every price pipeline computes): one window partition, running max
    // frame; drawdown = (v - peak) / peak in a fixed operation order
    // (subtract, then divide — both correctly rounded from exact
    // inputs) so the doubles hash-match. MAX over a growing frame is
    // order-insensitive, so no float-sum caveats apply.
    Q(
      "q129_running_drawdown",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("d")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
          .groupBy("user_id", "d").agg(max("value").as("v"))
          .withColumn("peak", max(col("v")).over(w))
          .withColumn("drawdown", (col("v") - col("peak")) / col("peak"))
          .orderBy("user_id", "d")
      },
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d, MAX(value) AS v
          FROM events GROUP BY 1, 2
        )
        SELECT user_id, d, v,
          MAX(v) OVER (PARTITION BY user_id ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
          (v - MAX(v) OVER (PARTITION BY user_id ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           / MAX(v) OVER (PARTITION BY user_id ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS drawdown
        FROM daily ORDER BY user_id, d
      """)),

    // ----------------------------------------------------------------
    // q130: INCREMENTALLY MAINTAINED EWMA — the q128 feature replayed
    // as four chronological ingest batches through ewmaAppendBatch,
    // carrying only each key's last (t, ewma) between batches (EWMA is
    // a left fold: O(batch + touched keys) per append, never a history
    // re-read). Gated by q128's oracle VERBATIM: the maintained rows
    // must hash-equal the one-shot fold bit-for-bit.
    Q(
      "q130_incremental_ewma",
      (s, dir) => {
        import graft.operators.Ewma
        val daily = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
          .groupBy("user_id", "d").agg(max("value").as("v"))
          .select(col("user_id"),
            datediff(col("d"), lit("1970-01-01").cast("date")).as("t"),
            col("v"))
        val cuts = Seq("2024-01-08", "2024-01-15", "2024-01-22")
          .map(d => java.time.LocalDate.parse(d).toEpochDay)
        val ranges = (Long.MinValue +: cuts).zip(cuts :+ Long.MaxValue)
        import s.implicits._
        var state = Seq.empty[(Long, Long, Double)].toDF("user_id", "t", "ewma")
        val outs = ranges.map { case (lo, hi) =>
          val batch = daily.where(col("t") >= lo && col("t") < hi)
          // pin each batch's fold result: the next state reads it, and
          // the final union reads it again — without the checkpoint the
          // lazy chain re-folds every prior batch per consumer
          val out = Ewma.ewmaAppendBatch(batch, state,
            "user_id", "t", "v", alpha = 0.5).localCheckpoint(true)
          state = Ewma.mergeState(state, out, "user_id", "t")
          out
        }
        outs.reduce(_.unionByName(_))
          .select("user_id", "t", "v", "ewma")
          .orderBy("user_id", "t")
      },
      Some("""
        WITH RECURSIVE daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d, MAX(value) AS v
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT user_id, (d - DATE '1970-01-01') AS t, v,
            row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
          FROM daily
        ), rec AS (
          SELECT user_id, t, v, rn, v AS ewma FROM ranked WHERE rn = 1
          UNION ALL
          SELECT r.user_id, r.t, r.v, r.rn,
                 (1 - 0.5) * p.ewma + 0.5 * r.v
          FROM ranked r JOIN rec p
            ON p.user_id = r.user_id AND r.rn = p.rn + 1
        )
        SELECT user_id, t, v, ewma FROM rec ORDER BY user_id, t
      """)),

    // ----------------------------------------------------------------
    // q131: weekly OHLC from the daily bars — the struct-extreme
    // resample COMPOSES: weekly open/close are the first/last day's
    // open/close via min/max over struct(d, px), so the second level
    // is again one aggregate pass (two stacked agg pairs, both keyed
    // by user — the (user,day) partials re-key to (user,week) with one
    // exchange). Oracle re-derives both levels with the independent
    // row_number formulation.
    Q(
      "q131_ohlc_weekly",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"),
            col("ts"), col("event_id"), col("value"))
        val bars = ev.groupBy("user_id", "d").agg(
          min(struct(col("ts"), col("event_id"), col("value")))
            .getField("value").as("px_open"),
          max(col("value")).as("px_high"),
          min(col("value")).as("px_low"),
          max(struct(col("ts"), col("event_id"), col("value")))
            .getField("value").as("px_close"),
          count(lit(1)).as("n_events"))
        bars
          .withColumn("w", date_trunc("week", col("d")).cast("date"))
          .groupBy("user_id", "w").agg(
            min(struct(col("d"), col("px_open")))
              .getField("px_open").as("px_open"),
            max(col("px_high")).as("px_high"),
            min(col("px_low")).as("px_low"),
            max(struct(col("d"), col("px_close")))
              .getField("px_close").as("px_close"),
            sum(col("n_events")).as("n_events"))
          .orderBy("user_id", "w")
      },
      Some("""
        WITH ranked AS (
          SELECT user_id, CAST(ts AS DATE) AS d, value,
            row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
              ORDER BY ts, event_id) AS rn_a,
            row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
              ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events
        ), bars AS (
          SELECT user_id, d,
            MAX(CASE WHEN rn_a = 1 THEN value END) AS px_open,
            MAX(value) AS px_high,
            MIN(value) AS px_low,
            MAX(CASE WHEN rn_d = 1 THEN value END) AS px_close,
            COUNT(*) AS n_events
          FROM ranked GROUP BY 1, 2
        ), wk AS (
          SELECT user_id, CAST(date_trunc('week', d) AS DATE) AS w,
            d, px_open, px_high, px_low, px_close, n_events,
            row_number() OVER (PARTITION BY user_id, date_trunc('week', d)
              ORDER BY d) AS r_a,
            row_number() OVER (PARTITION BY user_id, date_trunc('week', d)
              ORDER BY d DESC) AS r_d
          FROM bars
        )
        SELECT user_id, w,
          MAX(CASE WHEN r_a = 1 THEN px_open END) AS px_open,
          MAX(px_high) AS px_high,
          MIN(px_low) AS px_low,
          MAX(CASE WHEN r_d = 1 THEN px_close END) AS px_close,
          CAST(SUM(n_events) AS BIGINT) AS n_events
        FROM wk GROUP BY 1, 2
        ORDER BY user_id, w
      """)),

    // ----------------------------------------------------------------
    // q186: MONTHLY OHLC resample (pandas resample('ME').ohlc(), the
    // month-keyed analyses of EDA.ipynb cell 15) — the generalized
    // calendar resampler (operators/Resample.scala): whatever the
    // frequency, the bars are ONE hash aggregate straight from ticks
    // (struct extremes for open/close), so a month costs exactly what
    // a day costs — map-side combine collapses ticks to bars before
    // the single keyed exchange. Buckets label by period START
    // (date_trunc convention; pandas 'ME' = same bars, end label).
    // ResampleSpec additionally pins ticks-direct == daily-bars-
    // rebucketed. Oracle: q127's independent row_number formulation on
    // the month bucket.
    Q(
      "q186_ohlc_monthly",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        graft.operators.Resample
          .ohlc(ev, Seq("user_id"), "ts", "event_id", "value",
            freq = "month", bucketName = "m")
          .orderBy("user_id", "m")
      },
      Some("""
        WITH ranked AS (
          SELECT user_id,
            CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE) AS m,
            value,
            row_number() OVER (
              PARTITION BY user_id, date_trunc('month', CAST(ts AS TIMESTAMP))
              ORDER BY ts, event_id) AS rn_a,
            row_number() OVER (
              PARTITION BY user_id, date_trunc('month', CAST(ts AS TIMESTAMP))
              ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events
        )
        SELECT user_id, m,
          MAX(CASE WHEN rn_a = 1 THEN value END) AS px_open,
          MAX(value) AS px_high,
          MIN(value) AS px_low,
          MAX(CASE WHEN rn_d = 1 THEN value END) AS px_close,
          COUNT(*) AS n_events
        FROM ranked GROUP BY 1, 2
        ORDER BY user_id, m
      """)),

    // ----------------------------------------------------------------
    // q132: MACD(12,26,9) — three composed EWMA folds (fast, slow,
    // then the signal line over their difference) plus the histogram.
    // The α constants are written as the same division expression on
    // both engines (2.0/13.0 …), so every fold coefficient is the
    // identical IEEE double and the recursive arithmetic hash-matches
    // bit-exactly, dyadic or not — determinism comes from operation
    // ORDER, exactness of the coefficients only sharpens it.
    Q(
      "q132_macd",
      (s, dir) => {
        import graft.operators.Ewma
        val daily = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
          .groupBy("user_id", "d").agg(max("value").as("v"))
          .select(col("user_id"),
            datediff(col("d"), lit("1970-01-01").cast("date")).as("t"),
            col("v"))
        // fast + slow lines in ONE keyed pass (two accumulators, two
        // doubles of state) — not two folds plus a (user_id,t) rejoin
        val macd = Ewma.ewmaMulti(daily, "user_id", "t",
            Seq(Ewma.Spec("v", 2.0 / 13.0, "e12"),
                Ewma.Spec("v", 2.0 / 27.0, "e26")))
          .withColumn("macd", col("e12") - col("e26"))
        Ewma.ewmaByKey(macd.select("user_id", "t", "macd"),
            "user_id", "t", "macd", 2.0 / 10.0)
          .select(col("user_id"), col("t"), col("macd"),
            col("ewma").as("sig_v"))
          .withColumn("hist", col("macd") - col("sig_v"))
          .orderBy("user_id", "t")
      },
      Some("""
        WITH RECURSIVE daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d, MAX(value) AS v
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT user_id, (d - DATE '1970-01-01') AS t, v,
            row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
          FROM daily
        ), rec AS (
          SELECT user_id, t, v, rn, v AS e12, v AS e26 FROM ranked WHERE rn = 1
          UNION ALL
          SELECT r.user_id, r.t, r.v, r.rn,
                 (1 - 2.0/13.0) * p.e12 + (2.0/13.0) * r.v,
                 (1 - 2.0/27.0) * p.e26 + (2.0/27.0) * r.v
          FROM ranked r JOIN rec p
            ON p.user_id = r.user_id AND r.rn = p.rn + 1
        ), macd_t AS (
          SELECT user_id, t, rn, e12 - e26 AS macd FROM rec
        ), sig AS (
          SELECT user_id, t, rn, macd, macd AS sig_v FROM macd_t WHERE rn = 1
          UNION ALL
          SELECT m.user_id, m.t, m.rn, m.macd,
                 (1 - 2.0/10.0) * p.sig_v + (2.0/10.0) * m.macd
          FROM macd_t m JOIN sig p
            ON p.user_id = m.user_id AND m.rn = p.rn + 1
        )
        SELECT user_id, t, macd, sig_v, macd - sig_v AS hist
        FROM sig ORDER BY user_id, t
      """)),

    // ----------------------------------------------------------------
    // q133: RSI(14) — day-over-day gains/losses (LAG + GREATEST, both
    // exact), Wilder smoothing = the EWMA fold at α=1/14 over each
    // stream, then RSI with an explicit zero-loss guard (CASE → 100)
    // because x/0.0 is NULL in Spark but inf in DuckDB — the guard
    // keeps the engines on the same branch. All remaining arithmetic
    // shares one operation order; hash-exact.
    Q(
      "q133_rsi",
      (s, dir) => {
        import graft.operators.Ewma
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("t")
        val daily = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
          .groupBy("user_id", "d").agg(max("value").as("v"))
          .select(col("user_id"),
            datediff(col("d"), lit("1970-01-01").cast("date")).as("t"),
            col("v"))
        val diffs = daily
          .withColumn("prev", lag("v", 1).over(w))
          .where(col("prev").isNotNull)
          .withColumn("gain", greatest(col("v") - col("prev"), lit(0.0)))
          .withColumn("loss", greatest(col("prev") - col("v"), lit(0.0)))
        // gain + loss Wilder folds in ONE keyed pass (the oracle's own
        // dual-accumulator recursion) — one exchange, no rejoin
        Ewma.ewmaMulti(diffs.select("user_id", "t", "gain", "loss"),
            "user_id", "t",
            Seq(Ewma.Spec("gain", 1.0 / 14.0, "avg_gain"),
                Ewma.Spec("loss", 1.0 / 14.0, "avg_loss")))
          .withColumn("rsi",
            when(col("avg_loss") === 0.0, lit(100.0))
              .otherwise(lit(100.0) -
                lit(100.0) / (lit(1.0) + col("avg_gain") / col("avg_loss"))))
          .select("user_id", "t", "avg_gain", "avg_loss", "rsi")
          .orderBy("user_id", "t")
      },
      Some("""
        WITH RECURSIVE daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d, MAX(value) AS v
          FROM events GROUP BY 1, 2
        ), series AS (
          SELECT user_id, (d - DATE '1970-01-01') AS t, v FROM daily
        ), diffs AS (
          SELECT user_id, t,
            GREATEST(v - prev, 0.0) AS gain,
            GREATEST(prev - v, 0.0) AS loss
          FROM (
            SELECT user_id, t, v,
              lag(v) OVER (PARTITION BY user_id ORDER BY t) AS prev
            FROM series
          ) WHERE prev IS NOT NULL
        ), ranked AS (
          SELECT user_id, t, gain, loss,
            row_number() OVER (PARTITION BY user_id ORDER BY t) AS rn
          FROM diffs
        ), rec AS (
          SELECT user_id, t, rn, gain AS avg_gain, loss AS avg_loss
          FROM ranked WHERE rn = 1
          UNION ALL
          SELECT r.user_id, r.t, r.rn,
                 (1 - 1.0/14.0) * p.avg_gain + (1.0/14.0) * r.gain,
                 (1 - 1.0/14.0) * p.avg_loss + (1.0/14.0) * r.loss
          FROM ranked r JOIN rec p
            ON p.user_id = r.user_id AND r.rn = p.rn + 1
        )
        SELECT user_id, t, avg_gain, avg_loss,
          CASE WHEN avg_loss = 0.0 THEN 100.0
               ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END AS rsi
        FROM rec ORDER BY user_id, t
      """)),

    // ----------------------------------------------------------------
    // q134: Bollinger bands (rolling mean ± 2σ over the trailing
    // 8-value frame) on q19's audited machinery: exact DECIMAL power
    // sums materialized ONCE as columns (the skew lesson — inlining
    // window sums into the band formula would re-evaluate each
    // occurrence as its own window aggregate), then one fixed-order
    // per-row expression; sqrt is IEEE correctly-rounded, so the bands
    // hash-match like every other engineered-determinism double.
    Q(
      "q134_bollinger_bands",
      (s, dir) => {
        val w8 = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts").rowsBetween(-7, 0)
        val base = Tables.events(s, dir).select(
          col("event_id"), col("user_id"), col("ts"), col("value"),
          Rolling.s1(col("value"), w8).as("__s1"),
          Rolling.s2(col("value"), w8).as("__s2"),
          Rolling.n(col("value"), w8).as("__n"))
        val m = when(col("__n") === 8, col("__s1") / col("__n"))
        val v = when(col("__n") === 8,
          (col("__s2") - col("__s1") * col("__s1") / col("__n")) / col("__n"))
        base.select(
          col("event_id"), col("user_id"), col("ts"), col("value"),
          m.as("mid"),
          (m + lit(2.0) * sqrt(v)).as("upper"),
          (m - lit(2.0) * sqrt(v)).as("lower"))
      },
      Some {
        val frame = "PARTITION BY user_id ORDER BY ts " +
          "ROWS BETWEEN 7 PRECEDING AND CURRENT ROW"
        s"""
        WITH base AS (
          SELECT event_id, user_id, ts, value,
            ${Rolling.Sql.s1("value", frame)} AS s1x,
            ${Rolling.Sql.s2("value", frame)} AS s2x,
            ${Rolling.Sql.n("value", frame)} AS nx
          FROM events
        )
        SELECT event_id, user_id, ts, value,
          CASE WHEN nx = 8 THEN s1x / nx END AS mid,
          (CASE WHEN nx = 8 THEN s1x / nx END) + 2.0 * sqrt(
            CASE WHEN nx = 8 THEN (s2x - s1x * s1x / nx) / nx END) AS upper,
          (CASE WHEN nx = 8 THEN s1x / nx END) - 2.0 * sqrt(
            CASE WHEN nx = 8 THEN (s2x - s1x * s1x / nx) / nx END) AS lower
        FROM base
      """
      }),

    // ----------------------------------------------------------------
    // q135: pandas-DEFAULT EWMA — `ewm(alpha).mean()` with
    // adjust=True, the finite-window normalized form a notebook user
    // hits before q128's adjust=False recursion. Same spill-safe keyed
    // fold (Ewma.Spec(adjust = true)): O(1) state per key is now TWO
    // doubles (numerator and denominator recursions) and the emitted
    // value is their single correctly-rounded division. α = 0.5 keeps
    // both fold coefficients dyadic, and the oracle's recursive CTE
    // replays the identical num/den operation sequence — hash-exact
    // doubles, no tolerance.
    Q(
      "q135_ewma_adjusted",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
          .groupBy("user_id", "d").agg(max("value").as("v"))
          .select(col("user_id"),
            datediff(col("d"), lit("1970-01-01").cast("date")).as("t"),
            col("v"))
        graft.operators.Ewma.ewmaMulti(daily, "user_id", "t",
            Seq(graft.operators.Ewma.Spec("v", 0.5, "ewma", adjust = true)))
          .orderBy("user_id", "t")
      },
      Some("""
        WITH RECURSIVE daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d, MAX(value) AS v
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT user_id, (d - DATE '1970-01-01') AS t, v,
            row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
          FROM daily
        ), rec AS (
          SELECT user_id, t, v, rn,
                 v AS num, CAST(1.0 AS DOUBLE) AS den
          FROM ranked WHERE rn = 1
          UNION ALL
          SELECT r.user_id, r.t, r.v, r.rn,
                 (1 - 0.5) * p.num + r.v,
                 (1 - 0.5) * p.den + 1.0
          FROM ranked r JOIN rec p
            ON p.user_id = r.user_id AND r.rn = p.rn + 1
        )
        SELECT user_id, t, v, num / den AS ewma
        FROM rec ORDER BY user_id, t
      """)),

    // ----------------------------------------------------------------
    // q136: TIME-WEIGHTED interpolation over IRREGULAR timestamps —
    // pandas interpolate(method='time') (q126 interpolates over a
    // daily spine; here the gaps are the raw event stream's own uneven
    // microsecond timestamps). Missing values (every 7th event, a
    // deterministic mask) take the prev/next observed values weighted
    // by actual elapsed time; trailing gaps carry the last observation
    // (pandas' forward fill-out), leading gaps stay NULL. Two window
    // frames on ONE keyed sort (last/first ignoreNulls), then a single
    // fixed-order arithmetic expression on epoch-micros deltas — the
    // doubles hash-match the oracle, and a same-timestamp observation
    // pair short-circuits to the previous value instead of Spark's
    // NULL-on-/0 vs DuckDB's Inf divergence.
    Q(
      "q136_time_interpolate",
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val wP = W.partitionBy("user_id").orderBy("t", "event_id")
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        val wN = W.partitionBy("user_id").orderBy("t", "event_id")
          .rowsBetween(W.currentRow, W.unboundedFollowing)
        val base = Tables.events(s, dir).select(
          col("event_id"), col("user_id"), col("ts"),
          // ts is TIMESTAMP_NTZ; the session tz is pinned UTC, so the
          // NTZ→LTZ cast keeps the wall-clock == DuckDB's EPOCH_US
          unix_micros(col("ts").cast("timestamp")).as("t"),
          when(col("event_id") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("value").cast("double")).as("v"))
        val obsT = when(col("v").isNotNull, col("t"))
        val bounds = base
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(wP))
          .withColumn("pt", last(obsT, ignoreNulls = true).over(wP))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(wN))
          .withColumn("nt", first(obsT, ignoreNulls = true).over(wN))
        val frac = (col("t") - col("pt")).cast("double") /
          (col("nt") - col("pt")).cast("double")
        bounds.select(
          col("event_id"), col("user_id"), col("ts"), col("v"),
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, lit(null).cast("double"))
            .when(col("nv").isNull, col("pv"))
            .when(col("nt") === col("pt"), col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) * frac)
            .as("filled"))
          .orderBy("event_id")
      },
      Some(timeInterpOracleSql)),

    // ----------------------------------------------------------------
    // q42: CUBE grouping sets — all four aggregation levels in one Expand
    // + hash-agg pass (the reference has no grouping sets, §2.E).
    Q(
      "q42_cube_pricing",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .cube(col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
          .agg(sumExact(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
          .orderBy(col("returnflag").asc_nulls_first, col("linestatus").asc_nulls_first)
      },
      Some("""
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
      """)),

    // ----------------------------------------------------------------
    // q43: global top-k — orderBy+limit plans as TakeOrderedAndProject
    // (per-partition heap + single merge, never a full global sort).
    Q(
      "q43_global_topk_orders",
      (s, dir) => {
        Tables.orders(s, dir)
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select(col("o_orderkey").as("orderkey"),
            col("o_totalprice").as("totalprice"))
      },
      Some("""
        SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
      """)),

    // ----------------------------------------------------------------
    // q44: approximate sketches, FULLY GATED — three sketch families
    // whose construction uses only deterministic, SQL-expressible
    // integer/IEEE arithmetic, so the DuckDB oracle rebuilds the exact
    // same sketches (unlike HLL++/percentile_approx, whose internals
    // are engine-private; SketchSpec pins those against exact counts
    // separately):
    //  - CMS_ROWS: a depth-3 width-64 count-min sketch of per-type row
    //    counts. Items hash via affine maps mod p=2^31−1 over an
    //    ascii-derived integer key of the type string; the estimate is
    //    the min over depths of the bucket counts (overestimates on
    //    collision — CMS semantics).
    //  - KMV_USERS: k-minimum-values distinct-user estimate, k=16:
    //    user ids map injectively through (a·u+b) mod p, the k-th
    //    smallest hash hk gives est = (k−1)·p/hk (exact count when the
    //    type has < k distinct hashes).
    //  - MED/P99_EST: ε-grid quantile sketch — values land in fixed
    //    0.5-wide buckets (floor(value·2)), the estimate is the
    //    smallest bucket whose cumulative count reaches ⌈q·n⌉.
    // Scale shape: one groupBy(event_type) pass for CMS (the CMS table
    // itself is dim-sized), one distinct+partitioned-window pass for
    // KMV, one groupBy(type, bucket) + partitioned window for the
    // grid — no un-partitioned windows, no collects. Float parity: all
    // hash/bucket math is integer; the only IEEE ops are one division
    // ((k−1)·p/hk, both operands exactly representable) and one
    // multiply (bucket·0.5), identical single correctly-rounded steps
    // in both engines.
    Q(
      "q44_approx_sketches",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val p = 2147483647L // 2^31 - 1
        val w = 64L         // CMS width
        val k = 16          // KMV k
        val ev = Tables.events(s, dir)
        val etk = (ascii(substring(col("event_type"), 1, 1)) * 961 +
          ascii(substring(col("event_type"), 2, 1)) * 31 +
          length(col("event_type"))).cast(LongType)
        val base = ev.select(col("event_type"), etk.as("etk"),
          col("user_id"), col("value"))

        // CMS: per-type counts + the type's bucket per depth; depth
        // tables are re-aggregations of the dim-sized per-type frame
        val seeds = Seq((1000003L, 12345L), (999983L, 54321L), (1000033L, 98765L))
        val perType = base.groupBy("event_type")
          .agg(min(col("etk")).as("etk"), count(lit(1)).as("n_rows"))
        val buckets = perType.select(
          Seq(col("event_type"), col("n_rows")) ++
            seeds.zipWithIndex.map { case ((a, b), i) =>
              pmod(pmod(lit(a) * col("etk") + lit(b), lit(p)), lit(w))
                .as(s"b$i")
            }: _*)
        val cmsTables = seeds.indices.map { i =>
          buckets.groupBy(s"b$i").agg(sum(col("n_rows")).as(s"c$i"))
        }
        val cms = cmsTables.zipWithIndex
          .foldLeft(buckets) { case (df, (t, i)) => df.join(t, s"b$i") }
          .select(col("event_type"),
            least(col("c0"), col("c1"), col("c2")).as("cms_rows"))

        // KMV: injective hash of user_id, k-th smallest per type
        val hashes = base
          .select(col("event_type"),
            pmod(lit(950706376L) * col("user_id") + lit(12345L), lit(p)).as("h"))
          .distinct()
        val wk = Window.partitionBy("event_type").orderBy("h")
        val kmv = hashes.withColumn("rn", row_number().over(wk))
          .groupBy("event_type")
          .agg(max(when(col("rn") === k, col("h"))).as("hk"),
            count(lit(1)).as("nd"))
          .select(col("event_type"),
            when(col("nd") < k, col("nd").cast(DoubleType))
              .otherwise(lit(((k - 1).toLong * p).toDouble) / col("hk"))
              .as("kmv_users"))

        // ε-grid quantiles: cumulative bucket counts per type
        val grid = base
          .groupBy(col("event_type"),
            floor(col("value") * lit(2.0)).cast(LongType).as("g"))
          .agg(count(lit(1)).as("c"))
        val wcum = Window.partitionBy("event_type").orderBy("g")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wall = Window.partitionBy("event_type")
        val quant = grid
          .withColumn("cum", sum(col("c")).over(wcum))
          .withColumn("ntot", sum(col("c")).over(wall))
          .groupBy("event_type")
          .agg(
            min(when(col("cum") >=
              floor((col("ntot") + lit(1)) / lit(2.0)).cast(LongType),
              col("g"))).as("gmed"),
            min(when(col("cum") >=
              floor((lit(99) * col("ntot") + lit(99)) / lit(100.0))
                .cast(LongType),
              col("g"))).as("g99"))
          .select(col("event_type"),
            (col("gmed") * lit(0.5)).as("med_est"),
            (col("g99") * lit(0.5)).as("p99_est"))

        cms.join(kmv, "event_type").join(quant, "event_type")
          .orderBy("event_type")
      },
      Some(sketchOracleSql)),

    // ----------------------------------------------------------------
    // q45: scalar JSON path extraction + cast over the events props
    // column (reference JSONB -> ->> '::numeric' access, SURVEY Q2h/O5)
    // plus string-function family coverage (concat/upper/substring).
    Q(
      "q45_json_props_extract",
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k").cast(IntegerType)
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), k.as("k"))
          .where(col("k").isNotNull && col("k") >= 50)
          .select(
            col("event_id"), col("k"),
            concat(upper(substring(col("event_type"), 1, 2)), lit(":"),
              col("k").cast(StringType)).as("tag"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, k,
               CONCAT(UPPER(SUBSTRING(event_type, 1, 2)), ':', CAST(k AS VARCHAR)) AS tag
        FROM (
          SELECT event_id, event_type,
                 CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k
          FROM events
        ) WHERE k IS NOT NULL AND k >= 50
        ORDER BY 1
      """)),

    // ----------------------------------------------------------------
    // q46: batch tumbling window aggregation — the same window() operator
    // the streaming path uses (SURVEY §2.F), here as a daily rollup with
    // exact decimal sums.
    Q(
      "q46_tumbling_daily_totals",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 day").as("w"))
          .agg(
            sumExact(col("value")).as("total_value"),
            count(lit(1)).as("n"))
          .select(col("w.start").as("day_start"), col("total_value"), col("n"))
          .orderBy("day_start")
      },
      Some("""
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day_start,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
      """)),

    // ----------------------------------------------------------------
    // q47: FULL OUTER join — per-user click vs purchase counts, keeping
    // users present on either side only (§2.E: reference has no full
    // joins; the engine completes the join family).
    Q(
      "q47_full_outer_click_purchase",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        def per(t: String, out: String) =
          ev.where(col("event_type") === t)
            .groupBy(col("user_id")).agg(count(lit(1)).as(out))
        val c = per("click", "n_clicks")
        val p = per("purchase", "n_purchases")
        c.withColumnRenamed("user_id", "cu")
          .join(p.withColumnRenamed("user_id", "pu"),
            col("cu") === col("pu"), "full_outer")
          .select(
            coalesce(col("cu"), col("pu")).as("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
          .orderBy("user_id")
      },
      Some("""
        WITH c AS (SELECT user_id, COUNT(*) AS n_clicks FROM events
                   WHERE event_type = 'click' GROUP BY 1),
             p AS (SELECT user_id, COUNT(*) AS n_purchases FROM events
                   WHERE event_type = 'purchase' GROUP BY 1)
        SELECT COALESCE(c.user_id, p.user_id) AS user_id,
               COALESCE(n_clicks, 0) AS n_clicks,
               COALESCE(n_purchases, 0) AS n_purchases
        FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
        ORDER BY 1
      """)),

    // ----------------------------------------------------------------
    // q48: deterministic collect aggregation — distinct user set per
    // event type, sorted then joined to a string (collect_set order is
    // nondeterministic; the sort makes it comparable and reproducible).
    Q(
      "q48_collect_sorted_users",
      (s, dir) => {
        Tables.events(s, dir)
          .where(col("user_id") < 30)
          .groupBy(col("event_type"))
          .agg(concat_ws(",",
            sort_array(collect_set(col("user_id")))).as("users"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type,
               ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT user_id)), ',') AS users
        FROM events WHERE user_id < 30
        GROUP BY 1 ORDER BY 1
      """)),

    // ----------------------------------------------------------------
    // q49: IVF approximate nearest neighbor with a DETERMINISTIC coarse
    // quantizer — c ADAPTIVE integer hyperplanes (smallest c in [4, 20]
    // with 64·2^c >= n; decorrelated planeWeights family — see
    // [[SimilarityQueries.adaptiveWidthExpr]]) give a 2^c-cell sign key
    // playing the role of k-means' nlist; multi-probe = the query's own
    // cell plus every Hamming-1 and Hamming-2 neighbor (the cells a
    // borderline vector is most likely to land in). Search is
    // an equi-join of the broadcast exploded (query, probe) side
    // against cell-keyed candidates: identical scale shape to learned
    // IVF (nprobe·occupancy bounded work per query, never all-pairs),
    // but every step is int/md5-free arithmetic DuckDB replays
    // bit-exactly — unlike the k-means path (ml/IvfIndex, kept as the
    // learned/library quantizer, gated by IvfSpec's recall bound).
    // Because 2^c grows with n, expected cell occupancy stays ~64 at
    // ANY corpus size, so per-query work is ~(c+1)·64 — logarithmic
    // growth where the round-6 fixed-16-cell version was linear per
    // query (quadratic overall; the q55 audit lesson, verdict item 7).
    // Cells partition the space and probe cells are distinct, so each
    // candidate appears through at most one probe — no dedup needed.
    Q(
      "q49_ann_ivf",
      (s, dir) => {
        import graft.functions.DotProductF
        val cLit = SimilarityQueries.adaptiveWidthLit(
          SimilarityQueries.embCount(s, dir), 64)
        val emb = Tables.embeddings(s, dir)
          .withColumn("n2", DotProductF.dot(col("embedding"), col("embedding")))
          .withColumn("cell",
            expr(SimilarityQueries.signKeyLowExpr(cLit.toString)))
        ivfProbeSearch(emb, cLit)
      },
      Some(ivfOracleSql)),

    // ----------------------------------------------------------------
    // q114: INCREMENTAL IVF list maintenance — q109's move (maintained
    // PQ codes gated by q98's oracle) applied to q49's inverted file.
    // Four ingest batches (vec_id % 4) append (vec_id, cell)
    // assignments to a graft.operators.CellIndex DeltaStore at the
    // quantizer width FROZEN at index creation (provisioned from the
    // corpus count, as q104 freezes its band width — the oracle's
    // adaptive width resolves the same integer for the same corpus),
    // with a mid-replay compact; the q49 probe search then serves from
    // the MAINTAINED lists (embeddings joined to the store on vec_id —
    // co-located by bucket at scale) instead of assigning inline.
    // Gate: q49's DuckDB oracle VERBATIM — the maintained inverted
    // file must reproduce the one-shot assignment bit-for-bit, per-
    // batch O(batch) appends notwithstanding.
    Q(
      "q114_incremental_ivf_lists",
      (s, dir) => {
        import graft.functions.DotProductF
        val out = Q.scratch(s, "q114_ivflists", dir)
        def rm(f: java.io.File): Unit = graft.Q.rmrf(f)
        rm(new java.io.File(out))
        val cLit = SimilarityQueries.adaptiveWidthLit(
          SimilarityQueries.embCount(s, dir), 64)
        // derived ONCE (the q221 move): four batch filters + the final
        // serve join consume the embeddings scan
        val emb = Tables.embeddings(s, dir).localCheckpoint()
        (0 to 3).foreach { k =>
          graft.operators.CellIndex.appendBatch(
            s, emb.where(pmod(col("vec_id"), lit(4)) === k),
            s"$out/index", batchId = k, widthLit = cLit)
          if (k == 2) graft.operators.CellIndex.compact(s, s"$out/index")
        }
        val maintained = graft.operators.CellIndex.cells(s, s"$out/index")
        val withCell = emb
          .withColumn("n2", DotProductF.dot(col("embedding"), col("embedding")))
          .join(maintained, Seq("vec_id"))
        ivfProbeSearch(withCell, cLit)
      },
      Some(ivfOracleSql))
  ) ++ defsTail

  /** q49/q114's shared probe search over a (vec_id, embedding, n2,
    * cell) frame: multi-probe = own cell + every Hamming-1 and
    * Hamming-2 flip — 1 + c + c(c-1)/2 DISTINCT cells, so probe work
    * grows as log^2(n) while recall stays high even when the uniform
    * decorrelated cells stop accidentally co-locating neighbors (the
    * correlated lattice cells hid this by under-splitting). Cells
    * partition the space and probe cells are distinct, so each
    * candidate appears through at most one probe — no dedup needed. */
  private def ivfProbeSearch(withCell: org.apache.spark.sql.DataFrame,
                             cLit: Int): org.apache.spark.sql.DataFrame = {
    import graft.functions.DotProductF
    val probes =
      "concat(array(cell), " +
        s"transform(sequence(0, ${cLit - 1}), i -> " +
        "cell ^ shiftleft(cast(1 as bigint), i)), " +
        s"flatten(transform(sequence(0, ${cLit - 2}), i -> " +
        s"transform(sequence(i + 1, ${cLit - 1}), j2 -> " +
        "cell ^ shiftleft(cast(1 as bigint), i) ^ " +
        "shiftleft(cast(1 as bigint), j2)))))"
    val qs = withCell.where(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("n2").as("qn2"), explode(expr(probes)).as("cell"))
    val cs = withCell.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), col("n2").as("cn2"), col("cell"))
    val cos = DotProductF.dot(col("qe"), col("ce")) /
      (sqrt(col("qn2")) * sqrt(col("cn2")))
    val simq = floor(cos * lit(1000000.0) + lit(0.5)).cast("bigint")
    val scored = broadcast(qs).join(cs, Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), simq.as("sim_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim_q").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("cand_id").as("neighbor_id"),
        (col("sim_q").cast(DoubleType) / 1000000.0).as("cosine_sim"))
      .orderBy("query_id", "rank")
  }

  /** q49/q114's shared oracle: the one-shot adaptive sign-key IVF.
    * (lazy: referenced from `defs`, which initializes first). */
  private lazy val ivfOracleSql: String = {
        s"""
        WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
        e0 AS (
          SELECT vec_id, embedding,
                 ${SimilarityQueries.dotSql("embedding", "embedding")} AS n2,
                 ${SimilarityQueries.adaptiveWidthSql(64)} AS c
          FROM embeddings, nn
        ), e AS (
          SELECT vec_id, embedding, n2, c,
                 ${SimilarityQueries.signKeyLowSql("c")} AS cell
          FROM e0
        ), q AS (
          SELECT vec_id, embedding, n2,
                 UNNEST([cell]
                   || LIST_TRANSFORM(GENERATE_SERIES(0, c - 1), i ->
                        XOR(cell, CAST(POWER(2, i) AS BIGINT)))
                   || FLATTEN(LIST_TRANSFORM(GENERATE_SERIES(0, c - 2), i ->
                        LIST_TRANSFORM(GENERATE_SERIES(i + 1, c - 1), j2 ->
                          XOR(XOR(cell, CAST(POWER(2, i) AS BIGINT)),
                              CAST(POWER(2, j2) AS BIGINT)))))) AS cell
          FROM e WHERE vec_id % 100 = 0
        ), scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 CAST(FLOOR(${SimilarityQueries.dotSql("q.embedding", "c.embedding")}
                   / (SQRT(q.n2) * SQRT(c.n2)) * 1000000.0 + 0.5) AS BIGINT) AS sim_q
          FROM q JOIN e c ON q.cell = c.cell AND q.vec_id <> c.vec_id
        )
        SELECT query_id, CAST(rank AS INT) AS rank, cand_id AS neighbor_id,
               CAST(sim_q AS DOUBLE) / 1000000.0 AS cosine_sim
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim_q DESC, cand_id ASC) AS rank
          FROM scored
        ) WHERE rank <= 3 ORDER BY 1, 2
        """
  }

  private def defsTail: Vector[Q] = Vector(
    // ----------------------------------------------------------------
    // q52: catalog/metadata profile (SURVEY Q3) — the reference's
    // information_schema.tables/columns + per-table counts EDA
    // (notebooks/EDA.ipynb cell 7) through Spark's catalog API:
    // listTables enumerates, listColumns gives the column count, and one
    // union of single-row count aggregates profiles every table in a
    // single parallel job. The listing is filtered to the TESTDATA names
    // so foreign temp views in a shared session can't perturb results.
    Q(
      "q52_catalog_profile",
      (s, dir) => {
        Tables.registerAll(s, dir)
        val names = s.catalog.listTables().collect()
          .map(_.name).filter(Tables.all.contains).sorted
        names.map { n =>
            val nCols = s.catalog.listColumns(n).count()
            s.table(n).agg(count(lit(1)).as("n_rows"))
              .select(lit(n).as("table_name"), lit(nCols).as("n_cols"), col("n_rows"))
          }
          .reduce(_ unionByName _)
          .orderBy("table_name")
      },
      Some {
        val per = Tables.all.sorted.map(n =>
          s"""SELECT '$n' AS table_name,
                     (SELECT COUNT(*) FROM (DESCRIBE $n)) AS n_cols,
                     (SELECT COUNT(*) FROM $n) AS n_rows""")
        per.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
      }),

    // ----------------------------------------------------------------
    // q181: INCREMENTALLY-MAINTAINED mergeable sketches — q44's three
    // sketch families (count-min, k-minimum-values, ε-grid) maintained
    // across four event_id % 4 ingest batches through operators/
    // SketchIndex: each batch contributes O(sketch)-sized slices in
    // ONE grouped atomic commit (cms cells additive; grid cells
    // additive; kmv keeps each batch's k smallest distinct hashes —
    // the k smallest of the union of per-batch k-smallest ARE the
    // corpus k smallest), compact after batch 1 proves all three
    // survive their folds. Serving rebuilds q44's exact report from
    // the MAINTAINED state — the corpus is never re-sketched — and
    // the mergeability being LOSSLESS is what lets q44's one-shot
    // oracle gate this entry VERBATIM.
    Q(
      "q181_incremental_sketches",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.SketchIndex
        val out = Q.scratch(s, "q181_sketchidx", dir)
        def rm(f: java.io.File): Unit = graft.Q.rmrf(f)
        rm(new java.io.File(out))
        // derived ONCE (the q221 move): four batch filters consume the
        // events scan — materialize once, filter blocks
        val ev = Tables.events(s, dir).localCheckpoint()
        (0 to 3).foreach { k =>
          SketchIndex.appendBatch(s, ev.where(col("event_id") % 4 === k), out, k)
          if (k == 1) SketchIndex.compact(s, out)
        }
        serveSketchReport(s, out)
      },
      Some(sketchOracleSql)),

    // ----------------------------------------------------------------
    // q183: q181's sketch maintenance as an actual STREAM CONSUMER —
    // events land in two waves, a checkpointed AvailableNow query
    // appends each micro-batch's sketch slices through SketchIndex
    // (delta id = the STREAMING batch id, so a replayed micro-batch
    // replaces its own delta — exactly-once composition of the
    // checkpoint contract with the store's idempotent commit), and the
    // stream is STARTED TWICE on one checkpoint: a re-processed wave
    // would double the additive cells and flip the hash. Serving reads
    // the maintained state with q181's exact report — and because the
    // merge is lossless whatever the batch boundaries, q44's one-shot
    // oracle STILL gates it verbatim: the same answer from the batch
    // build, the 4-batch replay, and the streaming consumer.
    Q(
      "q183_stream_sketch_maintenance",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.SketchIndex
        val out = Q.scratch(s, "q183_streamsketch", dir)
        def rm(f: java.io.File): Unit = graft.Q.rmrf(f)
        rm(new java.io.File(out))
        val ev = Tables.events(s, dir)
        val in = ev.select("event_id", "event_type", "user_id", "value")
        def drain(): Unit = {
          val q = s.readStream.schema(in.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$out/in")
            .writeStream
            .option("checkpointLocation", s"$out/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
              SketchIndex.appendBatch(s, b, s"$out/state", bid.toInt)
            }
            .start()
          if (!q.awaitTermination(300000)) {
            q.stop()
            throw new IllegalStateException("q183 drain did not finish in 300 s")
          }
        }
        in.where(col("event_id") % 2 === 0).repartition(2)
          .write.parquet(s"$out/in")
        drain()
        in.where(col("event_id") % 2 === 1).repartition(2)
          .write.mode("append").parquet(s"$out/in")
        drain()
        serveSketchReport(s, s"$out/state")
      },
      Some(sketchOracleSql))
  )
  /** q44/q181's shared oracle: the ONE-SHOT sketch build spelled in
    * DuckDB — q181's incrementally-maintained sketches must reproduce
    * it exactly (mergeability is lossless).
    * (lazy: referenced from `defs`, which initializes first) */
  private lazy val timeInterpOracleSql = """
        WITH base AS (
          SELECT event_id, user_id, ts, EPOCH_US(ts) AS t,
                 CASE WHEN event_id % 7 = 0 THEN NULL
                      ELSE CAST(value AS DOUBLE) END AS v
          FROM events
        ), bounds AS (
          SELECT *,
            LAST_VALUE(v IGNORE NULLS) OVER w1 AS pv,
            LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
              OVER w1 AS pt,
            FIRST_VALUE(v IGNORE NULLS) OVER w2 AS nv,
            FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
              OVER w2 AS nt
          FROM base
          WINDOW w1 AS (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 w2 AS (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_id, user_id, ts, v,
          CASE WHEN v IS NOT NULL THEN v
               WHEN pv IS NULL THEN NULL
               WHEN nv IS NULL THEN pv
               WHEN nt = pt THEN pv
               ELSE pv + (nv - pv) *
                    (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
          END AS filled
        FROM bounds ORDER BY event_id
      """

  /** q44/q181's shared oracle: the ONE-SHOT sketch build spelled in
    * DuckDB — q181's incrementally-maintained sketches must reproduce
    * it exactly (mergeability is lossless). */
  private lazy val sketchOracleSql = """
        WITH base AS (
          SELECT event_type,
                 CAST(ascii(substring(event_type,1,1))*961
                      + ascii(substring(event_type,2,1))*31
                      + length(event_type) AS BIGINT) AS etk,
                 user_id, value
          FROM events
        ), per_type AS (
          SELECT event_type, MIN(etk) AS etk, COUNT(*) AS n_rows
          FROM base GROUP BY 1
        ), buckets AS (
          SELECT event_type, n_rows,
                 ((1000003*etk + 12345) % 2147483647) % 64 AS b0,
                 ((999983*etk + 54321) % 2147483647) % 64 AS b1,
                 ((1000033*etk + 98765) % 2147483647) % 64 AS b2
          FROM per_type
        ), cms0 AS (SELECT b0, CAST(SUM(n_rows) AS BIGINT) AS c0 FROM buckets GROUP BY 1),
           cms1 AS (SELECT b1, CAST(SUM(n_rows) AS BIGINT) AS c1 FROM buckets GROUP BY 1),
           cms2 AS (SELECT b2, CAST(SUM(n_rows) AS BIGINT) AS c2 FROM buckets GROUP BY 1),
           cms AS (
          SELECT event_type, LEAST(c0, c1, c2) AS cms_rows
          FROM buckets JOIN cms0 USING (b0) JOIN cms1 USING (b1) JOIN cms2 USING (b2)
        ), hashes AS (
          SELECT DISTINCT event_type,
                 (950706376*user_id + 12345) % 2147483647 AS h
          FROM base
        ), ranked AS (
          SELECT event_type, h,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM hashes
        ), kmv AS (
          SELECT event_type,
                 CASE WHEN COUNT(*) < 16 THEN CAST(COUNT(*) AS DOUBLE)
                      ELSE CAST(15*CAST(2147483647 AS BIGINT) AS DOUBLE)
                           / MAX(CASE WHEN rn = 16 THEN h END)
                 END AS kmv_users
          FROM ranked GROUP BY 1
        ), grid AS (
          SELECT event_type, CAST(FLOOR(value * 2.0) AS BIGINT) AS g,
                 COUNT(*) AS c
          FROM base GROUP BY 1, 2
        ), cumg AS (
          SELECT event_type, g,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY g) AS cum,
                 SUM(c) OVER (PARTITION BY event_type) AS ntot
          FROM grid
        ), quant AS (
          SELECT event_type,
                 MIN(CASE WHEN cum >= CAST(FLOOR((ntot+1)/2.0) AS BIGINT)
                     THEN g END) * 0.5 AS med_est,
                 MIN(CASE WHEN cum >= CAST(FLOOR((99*ntot+99)/100.0) AS BIGINT)
                     THEN g END) * 0.5 AS p99_est
          FROM cumg GROUP BY 1
        )
        SELECT event_type, cms_rows, kmv_users, med_est, p99_est
        FROM cms JOIN kmv USING (event_type) JOIN quant USING (event_type)
        ORDER BY event_type
      """

  /** q181/q183's serve path: rebuild q44's exact report from a
    * maintained [[graft.operators.SketchIndex]] store — the type
    * universe and per-depth buckets re-derive from the type STRING
    * (etk is a pure function; no extra state needed), KMV takes the
    * k-th order statistic of the maintained distinct pool, and the
    * ε-grid quantiles run q44's cumulative windows over the summed
    * cells. */
  private def serveSketchReport(s: org.apache.spark.sql.SparkSession,
                                root: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.SketchIndex
    val p = SketchIndex.P
    val w = SketchIndex.W
    val kk = SketchIndex.K
    val types = SketchIndex.grid(s, root).select("event_type").distinct()
      .withColumn("etk", SketchIndex.etkCol)
    val buckets = types.select(
      Seq(col("event_type")) ++
        SketchIndex.seeds.zipWithIndex.map { case ((a, b0), i) =>
          pmod(pmod(lit(a) * col("etk") + lit(b0), lit(p)), lit(w))
            .as(s"b$i")
        }: _*)
    val cells = SketchIndex.cms(s, root)
    val cmsDf = SketchIndex.seeds.indices
      .foldLeft(buckets) { case (df, i) =>
        df.join(cells.where(col("d") === i)
          .select(col("b").as(s"b$i"), col("c").as(s"c$i")), s"b$i")
      }
      .select(col("event_type"),
        least(col("c0"), col("c1"), col("c2")).as("cms_rows"))
    val wk = Window.partitionBy("event_type").orderBy("h")
    val kmvDf = SketchIndex.kmv(s, root)
      .withColumn("rn", row_number().over(wk))
      .groupBy("event_type")
      .agg(max(when(col("rn") === kk, col("h"))).as("hk"),
        count(lit(1)).as("nd"))
      .select(col("event_type"),
        when(col("nd") < kk, col("nd").cast(DoubleType))
          .otherwise(lit(((kk - 1).toLong * p).toDouble) / col("hk"))
          .as("kmv_users"))
    val wcum = Window.partitionBy("event_type").orderBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy("event_type")
    val quant = SketchIndex.grid(s, root)
      .withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("ntot", sum(col("c")).over(wall))
      .groupBy("event_type")
      .agg(
        min(when(col("cum") >=
          floor((col("ntot") + lit(1)) / lit(2.0)).cast(LongType),
          col("g"))).as("gmed"),
        min(when(col("cum") >=
          floor((lit(99) * col("ntot") + lit(99)) / lit(100.0))
            .cast(LongType),
          col("g"))).as("g99"))
      .select(col("event_type"),
        (col("gmed") * lit(0.5)).as("med_est"),
        (col("g99") * lit(0.5)).as("p99_est"))
    cmsDf.join(kmvDf, "event_type").join(quant, "event_type")
      .orderBy("event_type")
  }

}
