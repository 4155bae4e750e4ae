package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.SimilarityQueries

/** Incremental MinHash-LSH dedup index — dedup a NEW ingest batch
  * against the already-indexed corpus in O(batch) WRITE work, without
  * recomputing shingles, minhashes, or band buckets for anything
  * previously ingested. This is the maintenance story of the
  * q33–q35/q84 batch dedup family (the reference runs one-shot corpus
  * jobs; a production training-data pipeline re-dedups every crawl
  * increment, which at 100 TB must not be a corpus recompute).
  *
  * State is ONE grouped [[DeltaStore]] at `root` holding three logical
  * tables as `tbl=` slices of each delta (`delta=K/tbl=<t>/gbucket=B`),
  * so a batch's whole state advance is ONE write job and ONE atomic
  * commit — all three tables move to batch K together or not at all
  * (three separate stores could crash between commits and leave the
  * df counts a batch ahead of the sets; they also cost three shuffles
  * and three commit cycles per batch, measured as ~20% of the sf0.1
  * bench in fixed orchestration):
  *
  *   - `tbl=df`    (tri, cnt)      bucketed on the shingle — PER-BATCH
  *     count deltas; the corpus-global document frequency behind the
  *     hot-shingle cap is their running sum, merged at read for just
  *     the probing batch's shingles;
  *   - `tbl=sets`  (doc_id, ts)    bucketed on the doc — each doc's
  *     capped shingle set FROZEN at its insert batch (index entries
  *     are immutable: later batches may push a shingle past the df
  *     cap, but an already-written set is not revisited — the
  *     standard incremental-index trade, mirrored exactly by the q103
  *     oracle's cumulative-df-at-insert-batch semantics);
  *   - `tbl=bands` (doc_id, batch, band, bkey, rk) bucketed on the
  *     band key — only rows that won a bucket slot (rk <= bucketCap,
  *     arrival order = (batch, doc_id)) are stored, so the occupancy
  *     cap the batch pipeline applies with one window is enforced
  *     here by construction of the persisted state.
  *
  * Prior-state reads exclude the batch's own delta id
  * ([[DeltaStore.read]]'s `excludeDelta`), so a checkpoint REPLAY of
  * an already-committed batch recomputes bit-identical state and
  * emissions. They are NOT gbucket-pruned: an ingest batch's shingle
  * vocabulary, band keys, and candidate ids hash into essentially
  * every bucket (measured: zero pruning at sf0.1 for the price of one
  * extra distinct+collect job per read — bucket pruning is the POINT-
  * probe path, [[MorTable.lookup]]); the reads stay bounded because
  * each is immediately joined against batch-derived keys.
  *
  * Per-batch compute: shingle + minhash work is O(batch docs) only.
  * Candidate-pair emission is bounded by bucketCap² per band bucket
  * exactly as in the batch pipeline, and candidates come from ONE
  * keyed equi-join of the batch's kept bands against the stored bands
  * — never an all-pairs scan of the corpus.
  */
object LshIndex {

  private val debug = sys.env.contains("GRAFT_LSH_DEBUG")
  private def timed[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (debug) println(f"[lsh] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  /** State-table schemas (data columns only — the `gbucket` dir key is
    * a deterministic row function, recomputed when writing). */
  private val dfSchema = StructType(Seq(
    StructField("tri", StringType), StructField("cnt", LongType)))
  private val setsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", ArrayType(StringType))))
  private val bandsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("batch", IntegerType),
    StructField("band", IntegerType), StructField("bkey", StringType),
    StructField("rk", IntegerType)))

  /** Drop dead staging dirs of the grouped state store. */
  def heal(root: String, buckets: Int = 16, manifest: Boolean = false): Unit =
    DeltaStore(root, buckets, manifest).heal()

  /** Ingest one batch of documents (`doc_id` long, `text` string) into
    * the index at `root`, returning the batch's emitted near-dup
    * candidate pairs verified with exact capped-set Jaccard:
    * (doc_a, doc_b, emit_batch, shingle_jaccard), doc_a < doc_b.
    * A pair is emitted exactly once, at the LATER member's batch.
    * The returned frame is materialized (eager localCheckpoint) before
    * this call returns, so it stays valid after later upserts rewrite
    * the state it was derived from. Emission precedes the state
    * commit: a crash between them replays the batch against unchanged
    * prior state and re-derives identical pairs.
    *
    * CONTRACT: a batch id names a COMPLETE ingest unit — a replay
    * REPLACES the batch's whole delta, so calling this twice with the
    * same id and different doc subsets keeps only the second subset's
    * state. A streaming caller must therefore not let one logical drop
    * split across micro-batches (close the drop before ingesting it,
    * or gate on a manifest), exactly as with any replace-by-batch-id
    * sink.
    */
  def upsertBatch(spark: SparkSession, docs: DataFrame, root: String,
                  batchId: Int, dfCap: Int, bucketCap: Int,
                  buckets: Int = 16, manifest: Boolean = false): DataFrame = {
    val store = DeltaStore(root, buckets, manifest)
    store.heal()
    // -- batch shingles: same tokenizer/trigram family as q33-q35,
    //    distinct per doc, computed for the BATCH only. Persisted: the
    //    explode+regex pipeline is the dominant per-batch compute and
    //    feeds both the df counts and the capped-sets join below —
    //    uncached it re-executed once per consumer (measured 21 s for
    //    the sf0.1 four-batch replay, ~11 s with the caches).
    val shingles = docs
      .withColumn("toks", expr(SimilarityQueries.toksExpr))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(expr(SimilarityQueries.trisExpr)).as("tri"))
      .persist()

    // -- cumulative df for the batch's shingles: prior delta sum +
    //    this batch's counts. The running total is never materialized
    //    as a table; the lookup stays bounded because the read is
    //    immediately semi-joined against the batch's tris and
    //    aggregated.
    val batchCnt = shingles.groupBy("tri").agg(count(lit(1)).as("bcnt"))
      .persist()
    val priorDf = store.read(spark, dfSchema, None,
        table = Some("df"), excludeDelta = Some(batchId))
      .join(batchCnt.select("tri"), Seq("tri"), "left_semi")
      .groupBy("tri").agg(sum("cnt").as("cnt"))
    val merged = priorDf.join(batchCnt, Seq("tri"), "full_outer")
      .select(col("tri"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("bcnt"), lit(0L))).as("cnt"),
        col("bcnt"))
      .persist()
    try {
      // -- capped batch sets, frozen at this batch's cumulative df.
      val setsB = shingles
        .join(merged.where(col("cnt") <= dfCap).select("tri"), Seq("tri"))
        .groupBy("doc_id").agg(collect_list(col("tri")).as("ts"))
        .persist()
      try {
        // -- batch band keys: the 12 minhash permutations as aggregate
        //    columns of ONE groupBy (the r9 q34 form), 3 bands of 4.
        val mhCols = (0 to 11).map(i =>
          min(expr(SimilarityQueries.affineAtExpr(i))).as(s"mh$i"))
        val bandsB0 = setsB
          .select(col("doc_id"), explode(col("ts")).as("tri"))
          .withColumn("h", expr(SimilarityQueries.shingleHashExpr))
          .groupBy("doc_id")
          .agg(mhCols.head, mhCols.tail: _*)
          .select(col("doc_id"), expr(
            "stack(3, " +
              "0, md5(concat_ws(',', mh0, mh1, mh2, mh3)), " +
              "1, md5(concat_ws(',', mh4, mh5, mh6, mh7)), " +
              "2, md5(concat_ws(',', mh8, mh9, mh10, mh11))) as (band, bkey)"))
          .withColumn("batch", lit(batchId))

        // -- occupancy: arrival rank = stored bucket occupancy (max rk
        //    of the KEPT rows — identical to true arrivals wherever it
        //    matters, since both saturate at the cap) + in-batch
        //    row_number by doc_id. Only winners are stored or paired.
        val priorBands = store.read(spark, bandsSchema, None,
          table = Some("bands"), excludeDelta = Some(batchId)).persist()
        try {
          val occ = priorBands.groupBy("band", "bkey").agg(max("rk").as("base"))
          val kept = bandsB0
            .join(occ, Seq("band", "bkey"), "left")
            .withColumn("rk",
              (coalesce(col("base"), lit(0)) + row_number().over(
                Window.partitionBy("band", "bkey").orderBy("doc_id"))).cast("int"))
            .where(col("rk") <= bucketCap)
            .select(col("doc_id"), col("batch"), col("band"), col("bkey"), col("rk"))
            .persist()
          try {
            // -- pairs: ONE keyed equi-join of the batch's kept bands
            //    against (indexed ∪ batch) bands — batch-vs-indexed and
            //    batch-internal candidates in the same stage (the old
            //    side is capped by construction of the stored state;
            //    batch-internal pairs appear twice, once per
            //    orientation, and the distinct folds them).
            val all = priorBands.select("doc_id", "band", "bkey")
              .unionByName(kept.select("doc_id", "band", "bkey"))
            val cand = kept.as("n").join(all.as("o"),
                col("n.band") === col("o.band") && col("n.bkey") === col("o.bkey") &&
                  col("n.doc_id") =!= col("o.doc_id"))
              .select(
                least(col("n.doc_id"), col("o.doc_id")).as("doc_a"),
                greatest(col("n.doc_id"), col("o.doc_id")).as("doc_b"))
              .distinct()
              .withColumn("emit_batch", lit(batchId))

            // -- exact verify against the FROZEN sets: stored sets for
            //    previously-indexed docs ∪ the in-memory batch sets
            //    (disjoint by construction — the batch is not yet
            //    committed). MATERIALIZED (eager localCheckpoint): the
            //    returned frame must stay independent of state dirs
            //    later batches extend.
            val sets = store.read(spark, setsSchema, None,
                table = Some("sets"), excludeDelta = Some(batchId))
              .unionByName(setsB)
            val inter = size(array_intersect(col("ta"), col("tb")))
            val verifyPlan = cand
              .join(sets.select(col("doc_id").as("doc_a"), col("ts").as("ta")), Seq("doc_a"))
              .join(sets.select(col("doc_id").as("doc_b"), col("ts").as("tb")), Seq("doc_b"))
              .select(col("doc_a"), col("doc_b"), col("emit_batch"),
                (inter / (size(col("ta")) + size(col("tb")) - inter))
                  .as("shingle_jaccard"))

            // -- materialize the shared cached chain ONCE (kept is its
            //    tip), so the two concurrent actions below reuse cached
            //    blocks instead of racing to compute them
            timed("chain")(kept.count())

            // -- ONE grouped commit advances all three state tables to
            //    this batch atomically: one shuffle, one write job, one
            //    promote (vs three append cycles = ~24 small serial
            //    jobs per batch before the consolidation). It OVERLAPS
            //    the verification action — safe in every interleaving:
            //    if the commit lands and verification (or the caller's
            //    write of the pairs) dies, the replay's excludeDelta
            //    prior reads recompute bit-identical state and pairs;
            //    if verification finishes and the commit dies, the
            //    staged write is healed and the replay recommits.
            val commit = scala.concurrent.Future {
              timed("state commit")(store.appendTables(
                merged.where(col("bcnt").isNotNull)
                  .select(col("tri"), col("bcnt").as("cnt"))
                  .withColumn("tbl", lit("df"))
                  .withColumn("gbucket", store.gb(col("tri")))
                  .unionByName(
                    setsB.withColumn("tbl", lit("sets"))
                      .withColumn("gbucket", store.gb(col("doc_id"))),
                    allowMissingColumns = true)
                  .unionByName(
                    kept.withColumn("tbl", lit("bands"))
                      .withColumn("gbucket", store.gb(col("bkey"))),
                    allowMissingColumns = true),
                batchId,
                within = Seq(
                  when(col("tbl") === "df", col("tri")),
                  when(col("tbl") === "sets", col("doc_id")),
                  when(col("tbl") === "bands", col("bkey")))))
            }(scala.concurrent.ExecutionContext.global)
            val verified = timed("verify+ckpt")(verifyPlan.localCheckpoint())
            scala.concurrent.Await.result(
              commit, scala.concurrent.duration.Duration.Inf)
            verified
          } finally kept.unpersist()
        } finally priorBands.unpersist()
      } finally setsB.unpersist()
    } finally {
      merged.unpersist(); batchCnt.unpersist(); shingles.unpersist()
    }
  }

  /** Fold the grouped store's deltas into one base
    * ([[DeltaStore.compactTables]] — one write job, one atomic
    * promote covering all three tables): df deltas sum-merge on the
    * shingle key; sets/bands rows are immutable and union as-is. Only
    * compact batches whose emissions are durably committed (see the
    * store's replay contract). */
  def compact(spark: SparkSession, root: String, buckets: Int = 16, manifest: Boolean = false): Unit =
    DeltaStore(root, buckets, manifest).compactTables(spark, Seq(
      ("df", dfSchema, col("tri"),
        (all: DataFrame) => all.groupBy("tri").agg(sum("cnt").as("cnt"))),
      ("sets", setsSchema, col("doc_id"), identity[DataFrame] _),
      ("bands", bandsSchema, col("bkey"), identity[DataFrame] _)))
}
