package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental connected-components LABEL STATE — the
  * [[ConnectedComponents.maintain]] fold given a state protocol whose
  * per-wave WRITE is as incremental as its compute.
  *
  * `maintain` condenses a wave's new edges through the stored labels
  * and relabels in O(batch + touched components) — but a naive
  * deployment then rewrites the ENTIRE node-grain label table per wave
  * (O(all nodes) state IO, which at corpus scale drowns everything the
  * fold saved: the dedup-group refresh of a 100 TB pipeline would
  * rewrite billions of node labels to absorb a million-edge batch).
  * This index keeps labels in a [[DeltaStore]] and commits per wave
  * ONLY the rows the wave actually moved:
  *
  *   - nodes of old components whose label CHANGED (their component
  *     merged into a smaller-id one) — bounded by the touched
  *     components' sizes;
  *   - brand-new nodes — bounded by the batch.
  *
  * The read side resolves LATEST-WINS per node (each delta carries its
  * wave id; a node's current label is its row from the highest wave) —
  * an associative, idempotent fold that doubles as the [[compact]]
  * fold, exactly the [[Scd2Index]] stitch discipline. Soundness is
  * [[ConnectedComponents.maintain]]'s: merging is monotone under edge
  * appends and order-independent, so any batching folds to the
  * one-shot labels (q219 is gated by q62's recursive-closure oracle
  * VERBATIM; CcIndexSpec additionally pins the per-wave commit bound
  * and replay idempotence).
  *
  * Replay contract: [[appendWave]] reads prior state EXCLUDING its own
  * wave's delta, so a checkpoint replay of an already-committed wave
  * recomputes bit-identical rows and replaces its delta — which also
  * makes the index safe to drive from a Structured Streaming
  * foreachBatch with wave id = the streaming batch id (q221).
  *
  * Node ids are STRINGS here (the dedup-grouping shape: document/part
  * names); `comp` = MIN reachable id in STRING order, matching
  * [[ConnectedComponents]] over string columns. Numeric-id graphs
  * format fixed-width before indexing (min semantics follow the id
  * type's ordering).
  */
object CcIndex {

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("comp", StringType),
    StructField("wave", IntegerType)))

  /** Latest-wins per node — the resolve/compact fold: a node's current
    * label is its highest-wave row. Associative (max-wave row of a
    * union = max-wave row of per-part winners) and idempotent. */
  private def resolve(rows: DataFrame): DataFrame =
    rows
      .withColumn("__rn", row_number().over(
        Window.partitionBy("id").orderBy(col("wave").desc)))
      .where(col("__rn") === 1)
      .select("id", "comp", "wave")

  /** Fold one wave of new undirected edges (two string columns) into
    * the stored labels, committing ONLY changed + brand-new node rows
    * (one atomic delta). Wave 0 against an empty store degenerates to
    * the one-shot build — no special casing. */
  def appendWave(spark: SparkSession, newPairs: DataFrame, root: String,
                 waveId: Int, buckets: Int = 16, maxIter: Int = 20): Unit = {
    val store = DeltaStore(root, buckets)
    store.heal()
    val prior = resolve(store.read(spark, schema, None,
      excludeDelta = Some(waveId)))
    val labels = prior.select("id", "comp")
    val e = newPairs.toDF("a", "b")
    // condense endpoints through stored labels (unseen endpoints keep
    // themselves) — the maintain() move; the condensed graph is
    // batch-sized + touched components
    val condensed = e
      .join(labels.select(col("id").as("a"), col("comp").as("ca")),
        Seq("a"), "left")
      .join(labels.select(col("id").as("b"), col("comp").as("cb")),
        Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"),
        coalesce(col("cb"), col("b")).as("b"))
    // THROWS on non-convergence — a truncated fold must never commit
    val cond = ConnectedComponents.components(condensed, maxIter)
    // old components whose label moved: every member node remaps —
    // bounded by the touched components' sizes (cond is tiny and keyed
    // on the old component label, so this join broadcasts it against
    // one scan of the state)
    val changed = labels
      .join(cond.select(col("id").as("comp"), col("comp").as("newc")),
        Seq("comp"))
      .where(col("newc") =!= col("comp"))
      .select(col("id"), col("newc").as("comp"))
    // condensed nodes absent from the old labels are brand-new ids —
    // bounded by the batch
    val fresh = cond.join(labels.select("id"), Seq("id"), "left_anti")
      .select("id", "comp")
    val delta = changed.unionByName(fresh)
      .withColumn("wave", lit(waveId))
      .withColumn("gbucket", store.gb(col("id")))
    store.append(delta, waveId, within = Seq(col("id")))
  }

  /** The maintained node-grain labels: (id, comp) for every node seen
    * so far — latest-wins over the live deltas. */
  def labels(spark: SparkSession, root: String,
             buckets: Int = 16): DataFrame =
    resolve(DeltaStore(root, buckets).read(spark, schema, None))
      .select("id", "comp")

  /** Fold the per-wave deltas into one resolved base (atomic commit);
    * the read path is unchanged — latest-wins is idempotent. */
  def compact(spark: SparkSession, root: String, buckets: Int = 16): Unit =
    DeltaStore(root, buckets).compact(spark, schema, col("id"), resolve)
}
