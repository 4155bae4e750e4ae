package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key exponentially weighted moving average — pandas
  * `ewm(alpha, adjust=False).mean()`: `y_0 = x_0`,
  * `y_t = (1-α)·y_{t-1} + α·x_t`, folded in ascending time order.
  *
  * EWMA is inherently recursive (not a frame-expressible window
  * aggregate), so the scalable formulation is the Sessionize shape:
  * ONE keyed exchange, then each key's history sorts and folds inside
  * the executor. Per-key state is a single double, but the fold needs
  * the key's rows together — per-key history must fit an executor
  * task, the same contract as any sessionization; for unbounded
  * streams the same fold runs incrementally per micro-batch.
  *
  * Determinism: with a DYADIC α (0.5, 0.25, 0.75, …) both fold
  * coefficients are exact binary doubles, so every multiply is
  * correctly rounded from exact inputs and the result sequence is
  * fully determined by the (pinned, ascending) fold order — the
  * DuckDB oracle replays the identical recursion with a recursive CTE
  * and hash-matches bit-exactly. A non-dyadic α still works but the
  * cross-engine bit-equality guarantee weakens to same-order IEEE
  * arithmetic (still deterministic per engine).
  */
object Ewma {

  /** @param df    input with the three columns below
    * @param key   LONG-castable series key
    * @param order LONG-castable sort column (epoch days/micros, seq no)
    * @param value DOUBLE-castable observation
    * @return (key, order, value, ewma) — one row per input row */
  def ewmaByKey(df: DataFrame, key: String, order: String, value: String,
                alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(key).cast("long"), col(order).cast("long"),
        col(value).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k: Long, it: Iterator[(Long, Long, Double)]) =>
        val rows = it.toSeq.sortBy(_._2)
        var prev = 0.0
        var first = true
        rows.iterator.map { case (_, t, x) =>
          val y = if (first) { first = false; x }
                  else (1.0 - alpha) * prev + alpha * x
          prev = y
          (k, t, x, y)
        }
      }
      .toDF(key, order, value, "ewma")
  }

  /** Continue the per-key fold over a NEW batch of strictly-later rows
    * — the incremental-maintenance form: because EWMA is a left fold,
    * the ONLY state a batch append needs is each key's last (order,
    * ewma) pair, so per-batch cost is O(batch + touched keys), never a
    * history re-read. Replaying batches through this function is
    * bit-identical to [[ewmaByKey]] over the concatenated input (the
    * recursion simply continues from the carried double — same
    * operation sequence), which is what lets q130 gate the maintained
    * path with q128's oracle VERBATIM.
    *
    * @param state (key, order, ewma) — last row per key from prior
    *              batches (empty on the first); every batch row's
    *              `order` must exceed its key's state `order`
    * @return the batch rows with their ewma column (same shape as
    *         [[ewmaByKey]]'s output, new rows only) */
  def ewmaAppendBatch(batch: DataFrame, state: DataFrame,
                      key: String, order: String, value: String,
                      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val spark = batch.sparkSession
    import spark.implicits._
    val b = batch.select(col(key).cast("long"), col(order).cast("long"),
      col(value).cast("double"), lit(false).as("__init"), lit(0.0).as("__prev"))
    // state rows sort first naturally: their order predates every batch row
    val s = state.select(col(key).cast("long"), col(order).cast("long"),
      lit(0.0).as(value), lit(true).as("__init"),
      col("ewma").cast("double").as("__prev"))
    s.unionByName(b).as[(Long, Long, Double, Boolean, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k: Long, it: Iterator[(Long, Long, Double, Boolean, Double)]) =>
        val rows = it.toSeq.sortBy(_._2)
        var prev = 0.0
        var first = true
        rows.iterator.flatMap { case (_, t, x, isInit, p) =>
          if (isInit) { prev = p; first = false; None }
          else {
            val y = if (first) { first = false; x }
                    else (1.0 - alpha) * prev + alpha * x
            prev = y
            Some((k, t, x, y))
          }
        }
      }
      .toDF(key, order, value, "ewma")
  }

  /** Fold a batch's output into the carried state: per key, the later
    * of the existing state row and the batch's last row. */
  def mergeState(state: DataFrame, batchOut: DataFrame,
                 key: String, order: String): DataFrame = {
    val last = batchOut.groupBy(col(key))
      .agg(max(struct(col(order), col("ewma"))).as("__s"))
      .select(col(key), col(s"__s.$order"), col("__s.ewma"))
    state.select(col(key), col(order), col("ewma")).unionByName(last)
      .groupBy(col(key))
      .agg(max(struct(col(order), col("ewma"))).as("__s"))
      .select(col(key), col(s"__s.$order"), col("__s.ewma"))
  }
}
