package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained ADDITIVE CELL TABLES — the state behind
  * the distribution-statistics tier (chi-square contingency cells,
  * Kendall/Spearman (x, y) value-pair cells, KS/Mann-Whitney value
  * counts). Those statistics all reduce to a BOUNDED-DOMAIN table of
  * per-cell counts (the q211/q213/q215/q218/q223 recipe: quantize to a
  * small value domain, count per cell, compute the statistic from the
  * dim-sized cell table — never row pairs), and cell counts are
  * PURELY ADDITIVE across batches:
  *
  *   cells(A ∪ B) = cells(A) ⊎ cells(B)   (sum by key)
  *
  * — the cheapest maintenance fold in the engine (the [[SketchIndex]]
  * shape, without even a merge rule to prove: sum-by-key IS the
  * definition). Maintained cells therefore equal one-shot cells
  * EXACTLY, which is what lets the incremental and streaming
  * deployments (q226–q229) reuse the one-shot queries' DuckDB oracles
  * VERBATIM — the statistic's arithmetic runs unchanged on the folded
  * table.
  *
  * Per batch: ONE map-combined grouped count to O(cells) rows (cells
  * are dim-sized by construction — the batch never lands raw), ONE
  * atomic [[DeltaStore]] delta. The read side sums live deltas by
  * key; [[compact]] bakes the same fold into a base. appendBatch
  * performs NO reads of stored state, so a checkpoint replay rewrites
  * its delta from the batch alone — bit-identical, and safe to drive
  * from foreachBatch with batch id as the delta id (the q221/q225
  * streaming contract).
  *
  * The schema names the cell KEY columns plus one LONG count column
  * `c`; key columns must be non-null (quantized keys are — a nullable
  * dimension needs an explicit sentinel before indexing, or its rows
  * silently form a null cell).
  */
object StatCellIndex {

  private def keyCols(schema: StructType): Seq[String] =
    schema.fieldNames.toSeq.filter(_ != "c")

  /** Count one batch's rows into cells (key columns of `schema`) and
    * append as the delta for `batchId` — one grouped aggregate, one
    * atomic commit, no reads of stored state. */
  def appendBatch(spark: SparkSession, batch: DataFrame, root: String,
                  batchId: Int, schema: StructType,
                  buckets: Int = 16): Unit = {
    val keys = keyCols(schema)
    val store = DeltaStore(root, buckets)
    store.heal()
    val cells = batch
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(LongType).as("c"))
      .withColumn("gbucket", store.gb(struct(keys.map(col): _*)))
    store.append(cells, batchId, within = keys.map(col))
  }

  /** The maintained cell table: (keys..., c) summed over live state —
    * identical to the one-shot grouped count of everything appended. */
  def cells(spark: SparkSession, root: String, schema: StructType,
            buckets: Int = 16): DataFrame = {
    val keys = keyCols(schema)
    DeltaStore(root, buckets).read(spark, schema, None)
      .groupBy(keys.map(col): _*)
      .agg(sum("c").as("c"))
  }

  /** Fold live deltas into one base with the same sum-by-key. */
  def compact(spark: SparkSession, root: String, schema: StructType,
              buckets: Int = 16, upTo: Option[Int] = None): Unit = {
    val keys = keyCols(schema)
    DeltaStore(root, buckets).compact(spark, schema,
      struct(keys.map(col): _*),
      df => df.groupBy(keys.map(col): _*).agg(sum("c").as("c")),
      upTo)
  }

  /** Compaction policy: fold iff more than `maxDeltas` live deltas sit
    * at or below `upTo`. The cell fold is ADDITIVE — folding a crashed
    * batch's own uncommitted delta would double-count it on replay —
    * so streaming deployments call this at the START of batch k with
    * `upTo = Some(k - 1)`, the durably-committed tail. Returns whether
    * it fired. */
  def maybeCompact(spark: SparkSession, root: String, schema: StructType,
                   maxDeltas: Int, upTo: Option[Int] = None,
                   buckets: Int = 16): Boolean = {
    val fire = DeltaStore(root, buckets).deltaCount(upTo) > maxDeltas
    if (fire) compact(spark, root, schema, buckets, upTo)
    fire
  }

  // ------------------------------------------------------------------
  // ADDITIVE MOMENT variant: the same per-batch one-grouped-aggregate /
  // one-atomic-delta / no-stored-state-reads protocol, but the state's
  // non-key columns (`valueCols`) are exact additive SUMS (LONG counts
  // or cents, DECIMAL moment sums) rather than the single count `c`.
  // Sums of sums equal the one-shot sums exactly, so the maintained
  // table feeds the one-shot statistic tails unchanged — the recipe
  // behind the decision statistics whose sufficient state is sums:
  // revenue concentration's per-customer cents, the correlation
  // matrix's moment row, the A/B readout's per-arm tallies. Each value
  // column's batch sum is cast back to its DECLARED schema type, so
  // the fold's width discipline is the schema's (document the ceiling
  // where the query does).

  private def sumTo(schema: StructType, valueCols: Seq[String]) =
    valueCols.map(v => sum(col(v)).cast(schema(v).dataType).as(v))

  /** Sum one batch's rows into per-key moment sums and append as the
    * delta for `batchId` — one grouped aggregate, one atomic commit,
    * no reads of stored state. `batch` carries the key columns plus
    * row-grain addends for each value column (`lit(1L)` for a count). */
  def appendAgg(spark: SparkSession, batch: DataFrame, root: String,
                batchId: Int, schema: StructType, valueCols: Seq[String],
                buckets: Int = 16): Unit = {
    val keys = schema.fieldNames.toSeq.filterNot(valueCols.contains)
    val store = DeltaStore(root, buckets)
    store.heal()
    val folded = batch
      .groupBy(keys.map(col): _*)
      .agg(sumTo(schema, valueCols).head, sumTo(schema, valueCols).tail: _*)
      .withColumn("gbucket", store.gb(struct(keys.map(col): _*)))
    store.append(folded, batchId, within = keys.map(col))
  }

  /** The maintained moment table: keys plus each value column summed
    * over live state — identical to the one-shot grouped sums. */
  def table(spark: SparkSession, root: String, schema: StructType,
            valueCols: Seq[String], buckets: Int = 16): DataFrame = {
    val keys = schema.fieldNames.toSeq.filterNot(valueCols.contains)
    DeltaStore(root, buckets).read(spark, schema, None)
      .groupBy(keys.map(col): _*)
      .agg(sumTo(schema, valueCols).head, sumTo(schema, valueCols).tail: _*)
  }

  /** Fold live deltas into one base with the same per-key sums. */
  def compactAgg(spark: SparkSession, root: String, schema: StructType,
                 valueCols: Seq[String], buckets: Int = 16,
                 upTo: Option[Int] = None): Unit = {
    val keys = schema.fieldNames.toSeq.filterNot(valueCols.contains)
    DeltaStore(root, buckets).compact(spark, schema,
      struct(keys.map(col): _*),
      df => df.groupBy(keys.map(col): _*)
        .agg(sumTo(schema, valueCols).head, sumTo(schema, valueCols).tail: _*),
      upTo)
  }

  /** [[maybeCompact]] for the moment variant — same durability-horizon
    * contract (`upTo` = the durably-committed tail). */
  def maybeCompactAgg(spark: SparkSession, root: String, schema: StructType,
                      valueCols: Seq[String], maxDeltas: Int,
                      upTo: Option[Int] = None,
                      buckets: Int = 16): Boolean = {
    val fire = DeltaStore(root, buckets).deltaCount(upTo) > maxDeltas
    if (fire) compactAgg(spark, root, schema, valueCols, buckets, upTo)
    fire
  }
}
