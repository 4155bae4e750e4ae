package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-key exponentially weighted moving average — pandas
  * `ewm(alpha, adjust=False).mean()`: `y_0 = x_0`,
  * `y_t = (1-α)·y_{t-1} + α·x_t`, folded in ascending time order.
  *
  * EWMA is inherently recursive (not a frame-expressible window
  * aggregate), so the scalable formulation is: ONE keyed exchange
  * (`repartition(key)`), a partition-local sort on (key, order) —
  * which spills through Spark's UnsafeExternalSorter, never the task
  * heap — and then a STREAMING per-key fold in `mapPartitions` whose
  * state is one double per accumulator. Nothing buffers a key's
  * history anywhere: a hot key with a billion rows costs disk-backed
  * sort spill, not executor memory. (Earlier rounds used
  * `groupByKey.flatMapGroups(it.toSeq.sortBy)`, which materialized
  * each key on the heap — same fold order, worse memory contract.)
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

  /** One EWMA accumulator: fold `value` at `alpha`, emit as `out`.
    *
    * `adjust = false` is the plain recursion `y_t = (1-α)y_{t-1} + αx_t`
    * (pandas `ewm(alpha, adjust=False)`); `adjust = true` is pandas'
    * DEFAULT `ewm(alpha)` — the finite-window normalized form
    * `y_t = Σ(1-α)^i x_{t-i} / Σ(1-α)^i`, maintained as TWO recursions
    * (`num_t = (1-α)num_{t-1} + x_t`, `den_t = (1-α)den_{t-1} + 1`)
    * with `y_t = num_t/den_t` — still O(1) state, and the division is
    * a single correctly-rounded op on deterministic operands. */
  final case class Spec(value: String, alpha: Double, out: String,
                        adjust: Boolean = false)

  /** @param df    input with the three columns below
    * @param key   LONG-castable series key
    * @param order LONG-castable sort column (epoch days/micros, seq no)
    * @param value DOUBLE-castable observation
    * @return (key, order, value, ewma) — one row per input row */
  def ewmaByKey(df: DataFrame, key: String, order: String, value: String,
                alpha: Double): DataFrame =
    ewmaMulti(df, key, order, Seq(Spec(value, alpha, "ewma")))

  /** Fold SEVERAL EWMAs over the same keyed, ordered frame in ONE
    * pass — one exchange, one sort, one scan, N doubles of state —
    * instead of one exchange per accumulator plus a rejoin. This is
    * the shape q133 (gain+loss at the same α) and q132 (e12+e26 at
    * different α over the same series) want: each accumulator's
    * arithmetic sequence is independent, so per-accumulator results
    * are bit-identical to running [[ewmaByKey]] separately.
    *
    * @param specs value column → α → output column, all folded in the
    *              shared ascending-(order) order
    * @return (key, order, distinct value cols…, spec outputs…) */
  def ewmaMulti(df: DataFrame, key: String, order: String,
                specs: Seq[Spec]): DataFrame = {
    require(specs.nonEmpty, "need at least one accumulator")
    specs.foreach(sp => require(sp.alpha > 0 && sp.alpha <= 1,
      s"alpha must be in (0, 1], got ${sp.alpha}"))
    val valCols = specs.map(_.value).distinct
    require((Seq(key, order) ++ valCols ++ specs.map(_.out)).distinct.size ==
      2 + valCols.size + specs.size, s"column-name collision in $specs")
    val prepared = df
      .select(col(key).cast("long") :: col(order).cast("long") ::
        valCols.toList.map(c => col(c).cast("double")): _*)
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(order))
    val valIdx = specs.map(sp => 2 + valCols.indexOf(sp.value)).toArray
    val alphas = specs.map(_.alpha).toArray
    val n = specs.length
    val outSchema = StructType(
      StructField(key, LongType, nullable = false) ::
      StructField(order, LongType, nullable = false) ::
      valCols.toList.map(StructField(_, DoubleType, nullable = false)) :::
      specs.toList.map(sp => StructField(sp.out, DoubleType, nullable = false)))
    val adjust = specs.map(_.adjust).toArray
    prepared.mapPartitions { it =>
      var curKey = 0L
      var anyKey = false
      val num = new Array[Double](n) // adjust=false: the previous y
      val den = new Array[Double](n) // adjust=true only
      it.map { r =>
        var c = 0
        while (c < 2 + valCols.length) {
          if (r.isNullAt(c)) throw new NullPointerException(
            s"null in EWMA input column ${outSchema(c).name}")
          c += 1
        }
        val k = r.getLong(0)
        val first = !anyKey || k != curKey
        if (first) { curKey = k; anyKey = true }
        val out = new Array[Any](2 + valCols.length + n)
        out(0) = k
        out(1) = r.getLong(1)
        var i = 0
        while (i < valCols.length) { out(2 + i) = r.getDouble(2 + i); i += 1 }
        var j = 0
        while (j < n) {
          val x = r.getDouble(valIdx(j))
          val y = if (adjust(j)) {
            if (first) { num(j) = x; den(j) = 1.0 }
            else {
              num(j) = (1.0 - alphas(j)) * num(j) + x
              den(j) = (1.0 - alphas(j)) * den(j) + 1.0
            }
            num(j) / den(j)
          } else {
            val v = if (first) x else (1.0 - alphas(j)) * num(j) + alphas(j) * x
            num(j) = v
            v
          }
          out(2 + valCols.length + j) = y
          j += 1
        }
        Row.fromSeq(out.toIndexedSeq)
      }
    }(Encoders.row(outSchema))
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
    * Same spill-safe shape as [[ewmaMulti]]; the sort breaks (key,
    * order) ties with state-first, and a batch row at-or-before its
    * key's state order — a violated precondition that would silently
    * corrupt the recursion — FAILS LOUDLY instead.
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
    val s = state.select(col(key).cast("long"), col(order).cast("long"),
      lit(0.0).as(value), lit(true).as("__init"),
      col("ewma").cast("double").as("__prev"))
    s.unionByName(b)
      .repartition(col(key))
      // state first on an order tie (desc: true before false) so the
      // violation check below sees it and fails loudly
      .sortWithinPartitions(col(key), col(order), col("__init").desc)
      .as[(Long, Long, Double, Boolean, Double)]
      .mapPartitions { it =>
        var curKey = 0L
        var anyKey = false
        var prev = 0.0
        var first = true
        var stateT = Long.MinValue
        var hasState = false
        it.flatMap { case (k, t, x, isInit, p) =>
          if (!anyKey || k != curKey) {
            curKey = k; anyKey = true
            first = true; hasState = false; stateT = Long.MinValue
          }
          if (isInit) {
            if (hasState) throw new IllegalStateException(
              s"duplicate state row for key $k at order $t")
            if (!first) throw new IllegalStateException(
              s"batch rows for key $k precede the state order $t — " +
                "ewmaAppendBatch requires strictly-later rows")
            prev = p; first = false; hasState = true; stateT = t
            None
          } else {
            if (hasState && t <= stateT) throw new IllegalStateException(
              s"batch row (key $k, order $t) does not follow its state " +
                s"order $stateT — ewmaAppendBatch requires strictly-later rows")
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
