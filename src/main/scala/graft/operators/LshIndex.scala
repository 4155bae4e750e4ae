package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.SimilarityQueries

/** Incremental MinHash-LSH dedup index — dedup a NEW ingest batch
  * against the already-indexed corpus in O(batch) WRITE work and
  * bucket-pruned read work, without recomputing shingles, minhashes,
  * or band buckets for anything previously ingested. This is the
  * maintenance story of the q33–q35/q84 batch dedup family (the
  * reference runs one-shot corpus jobs; a production training-data
  * pipeline re-dedups every crawl increment, which at 100 TB must not
  * be a corpus recompute).
  *
  * State is three LSM-style APPEND-ONLY tables under `root/`, each a
  * set of per-batch delta dirs holding hash-bucketed subdirs
  * (`table/delta=K/gbucket=B/part-*.parquet`):
  *
  *   - `df/`    (tri, cnt)      bucketed on the shingle — PER-BATCH
  *     count deltas; the corpus-global document frequency behind the
  *     hot-shingle cap is their running sum, merged at read for just
  *     the probing batch's shingles;
  *   - `sets/`  (doc_id, ts)    bucketed on the doc — each doc's
  *     capped shingle set FROZEN at its insert batch (index entries
  *     are immutable: later batches may push a shingle past the df
  *     cap, but an already-written set is not revisited — the
  *     standard incremental-index trade, mirrored exactly by the q103
  *     oracle's cumulative-df-at-insert-batch semantics);
  *   - `bands/` (doc_id, batch, band, bkey, rk) bucketed on the band
  *     key — only rows that won a bucket slot (rk <= bucketCap,
  *     arrival order = (batch, doc_id)) are stored, so the occupancy
  *     cap the batch pipeline applies with one window is enforced
  *     here by construction of the persisted state.
  *
  * Why append-only instead of read-merge-rewrite buckets
  * ([[graft.streaming.BucketedSnapshot]]): a text batch's shingles
  * hash into EVERY df/band bucket, so a replace-bucket merge rewrites
  * O(index) bytes per batch — the exact write-amplification failure
  * the r9 bucketed-rollup work removed from q85/q92. Appending a
  * delta dir writes O(batch) bytes regardless of index size. The
  * read side merges deltas on the fly (df: sum of counts; sets/bands:
  * plain union — rows are immutable and keys never collide), pruned
  * to the gbuckets the probing batch's keys hash into; listing cost
  * grows with the delta count, so a long-lived deployment folds old
  * deltas together periodically (LSM compaction — same read
  * semantics, deferred merge; not needed at replay depths of a few
  * dozen batches).
  *
  * Commit protocol per batch: each table's delta is written to a
  * `.staging` dir, then ONE rename promotes `delta=K` (atomic on
  * POSIX; the object-store variant is [[graft.streaming.ManifestTable]]'s
  * pointer move). A replayed batch replaces its own delta dirs and
  * rewrites its emission parquet — idempotent, the same
  * replay-from-checkpoint contract as `mergeBatch`. [[heal]] drops
  * dead staging dirs.
  *
  * Per-batch compute: shingle + minhash work is O(batch docs) only;
  * the `.collect()`s below gather ONLY distinct bucket ids —
  * driver-side metadata bounded by `buckets`, the sanctioned class.
  * Candidate-pair emission is bounded by bucketCap² per band bucket
  * exactly as in the batch pipeline, and new-vs-old candidates come
  * from ONE keyed equi-join of the batch's bands against the pruned
  * band buckets — never a scan of the corpus.
  */
object LshIndex {

  private val debug = sys.env.contains("GRAFT_LSH_DEBUG")
  private def timed[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (debug) println(f"[lsh] $tag%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s")
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

  private def gb(c: Column, buckets: Int): Column =
    pmod(hash(c), lit(buckets)).cast("int")

  private def touchedBuckets(df: DataFrame, key: Column, buckets: Int): Seq[Int] =
    df.select(gb(key, buckets).as("g")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

  /** Drop dead staging dirs (a crash between the staging write and the
    * delta promote). Safe any time: staging is invisible to readers. */
  def heal(root: String): Unit =
    Seq("df", "sets", "bands").foreach { t =>
      val dir = new java.io.File(root, t)
      Option(dir.listFiles()).foreach(_.foreach { f =>
        if (f.getName.startsWith(".staging")) delete(f)
      })
    }

  /** Live state dirs of `table`: the newest `base=K` dir (a compaction
    * product covering every batch <= K) plus the `delta=J` dirs with
    * J > K. Deltas a base covers are IGNORED even if still on disk —
    * that is what makes [[compact]]'s promote a single atomic rename
    * with lazy cleanup. */
  private def liveDirs(root: String, table: String): Seq[java.io.File] = {
    val dir = new java.io.File(root, table)
    val all = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(_.isDirectory)
    val bases = all.filter(_.getName.startsWith("base="))
    val newest = bases.map(f => f.getName.stripPrefix("base=").toInt)
      .sorted.lastOption
    val live = newest match {
      case None => all.filter(_.getName.startsWith("delta="))
      case Some(k) =>
        bases.filter(_.getName == s"base=$k") ++
          all.filter(f => f.getName.startsWith("delta=") &&
            f.getName.stripPrefix("delta=").toInt > k)
    }
    live
  }

  /** Bucket-pruned union of `table`'s live dirs (every bucket if
    * `touched` is None); empty frame with `schema` when none exist. */
  private def readState(spark: SparkSession, root: String, table: String,
                        schema: StructType,
                        touched: Option[Seq[Int]]): DataFrame = {
    val paths = for {
      d <- liveDirs(root, table)
      sub <- Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      if sub.isDirectory && sub.getName.startsWith("gbucket=")
      if touched.forall(_.exists(k => sub.getName == s"gbucket=$k"))
    } yield sub.getPath
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths.sorted: _*)
  }

  /** Append `df` (carrying a `gbucket` column) as `table`'s delta for
    * `batchId`: staged write, then one atomic rename. Replaces an
    * existing same-batch delta — replay idempotence.
    *
    * The staging shuffle targets exactly `parts` partitions keyed on
    * the bucket, yielding ~one file per bucket per delta: deltas are
    * BATCH-sized, and letting the session's 32 shuffle partitions each
    * write into every bucket dir produced up to 32x16 tiny files per
    * delta — measured as the dominant q103 cost (file-open overhead on
    * both sides; 24 s -> single digits at sf0.1). At production batch
    * sizes `parts` scales with batch bytes over target file size. */
  private def appendDelta(root: String, table: String, df: DataFrame,
                          batchId: Int, parts: Int,
                          within: Seq[Column]): Unit = {
    val dir = new java.io.File(root, table)
    dir.mkdirs()
    val staging = new java.io.File(dir, s".staging_$batchId")
    if (staging.exists()) delete(staging)
    df.repartition(parts, col("gbucket"))
      .sortWithinPartitions((col("gbucket") +: within): _*)
      .write.partitionBy("gbucket").mode("overwrite")
      .parquet(staging.getPath)
    val target = new java.io.File(dir, s"delta=$batchId")
    if (target.exists()) delete(target)
    if (!staging.renameTo(target))
      throw new java.io.IOException(s"cannot promote $staging to $target")
  }

  /** Ingest one batch of documents (`doc_id` long, `text` string) into
    * the index at `root`, returning the batch's emitted near-dup
    * candidate pairs verified with exact capped-set Jaccard:
    * (doc_a, doc_b, emit_batch, shingle_jaccard), doc_a < doc_b.
    * A pair is emitted exactly once, at the LATER member's batch.
    * The returned frame is materialized (eager localCheckpoint) before
    * this call returns, so it stays valid after later upserts rewrite
    * the state it was derived from.
    */
  def upsertBatch(spark: SparkSession, docs: DataFrame, root: String,
                  batchId: Int, dfCap: Int, bucketCap: Int,
                  buckets: Int = 16): DataFrame = {
    heal(root)
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

    // -- cumulative df for the batch's shingles: prior delta sum
    //    (bucket-pruned) + this batch's counts. The batch's counts are
    //    appended as the next delta — an O(batch) write; the running
    //    total is never materialized as a table.
    val batchCnt = shingles.groupBy("tri").agg(count(lit(1)).as("bcnt"))
      .persist()
    // df reads are NOT bucket-pruned: a text batch's shingle vocabulary
    // hashes into essentially every bucket, so the pruning pre-pass is a
    // pure extra job (measured ~1-2 s/batch at sf0.1 for zero pruning).
    // The per-shingle df lookup stays bounded because the read is
    // immediately aggregated and semi-joined against the batch's tris.
    val priorDf = readState(spark, root, "df", dfSchema, None)
      .join(batchCnt.select("tri"), Seq("tri"), "left_semi")
      .groupBy("tri").agg(sum("cnt").as("cnt"))
    val merged = priorDf.join(batchCnt, Seq("tri"), "full_outer")
      .select(col("tri"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("bcnt"), lit(0L))).as("cnt"),
        col("bcnt"))
      .persist()
    try {
      timed("df append")(appendDelta(root, "df",
        merged.where(col("bcnt").isNotNull)
          .select(col("tri"), col("bcnt").as("cnt"),
            gb(col("tri"), buckets).as("gbucket")),
        batchId, parts = buckets, within = Seq(col("tri"))))

      // -- capped batch sets, frozen at this batch's cumulative df.
      val setsB = shingles
        .join(merged.where(col("cnt") <= dfCap).select("tri"), Seq("tri"))
        .groupBy("doc_id").agg(collect_list(col("tri")).as("ts"))
        .persist()
      try {
        timed("sets append")(appendDelta(root, "sets",
          setsB.withColumn("gbucket", gb(col("doc_id"), buckets)),
          batchId, parts = buckets, within = Seq(col("doc_id"))))

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
          .persist()

        // -- occupancy: arrival rank = stored bucket occupancy (max rk
        //    of the KEPT rows — identical to true arrivals wherever it
        //    matters, since both saturate at the cap) + in-batch
        //    row_number by doc_id. Only winners are stored or paired.
        val bTouched = timed("bTouched")(touchedBuckets(bandsB0, col("bkey"), buckets))
        val priorBands = readState(
          spark, root, "bands", bandsSchema, Some(bTouched)).persist()
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
              .persist()

            // -- exact verify against the FROZEN stored sets (pruned to
            //    the pair ids' buckets; the batch's own delta is already
            //    promoted above, so batch docs are present). MATERIALIZED
            //    (eager localCheckpoint): the returned frame must stay
            //    independent of state dirs later batches extend.
            val idBuckets = timed("idBuckets")(
              cand.select(explode(array(gb(col("doc_a"), buckets),
                gb(col("doc_b"), buckets))).as("g"))
                .distinct().collect().map(_.getInt(0)).toSeq.sorted)
            val sets = readState(spark, root, "sets", setsSchema, Some(idBuckets))
            val inter = size(array_intersect(col("ta"), col("tb")))
            val verified = timed("verify+ckpt")(cand
              .join(sets.select(col("doc_id").as("doc_a"), col("ts").as("ta")), Seq("doc_a"))
              .join(sets.select(col("doc_id").as("doc_b"), col("ts").as("tb")), Seq("doc_b"))
              .select(col("doc_a"), col("doc_b"), col("emit_batch"),
                (inter / (size(col("ta")) + size(col("tb")) - inter))
                  .as("shingle_jaccard"))
              .localCheckpoint())

            cand.unpersist()
            timed("bands append")(appendDelta(root, "bands",
              kept.withColumn("gbucket", gb(col("bkey"), buckets)),
              batchId, parts = buckets, within = Seq(col("bkey"))))
            verified
          } finally { kept.unpersist(); bandsB0.unpersist() }
        } finally priorBands.unpersist()
      } finally setsB.unpersist()
    } finally {
      merged.unpersist(); batchCnt.unpersist(); shingles.unpersist()
    }
  }

  /** LSM compaction: fold each state table's live dirs into one
    * `base=K` dir (K = the highest batch currently on disk), so read
    * listing cost stops growing with replay depth. df deltas sum-merge
    * on the shingle key; sets/bands rows are immutable and union as-is.
    *
    * Atomicity: the merged content is staged, then ONE rename promotes
    * `base=K`; readers ignore covered dirs from that instant, so the
    * subsequent cleanup of old base/delta dirs is lazy — a crash
    * anywhere leaves a readable, non-double-counting state. Only
    * compact batches whose emissions are durably committed: a
    * checkpoint REPLAY of batch j <= K would append `delta=j` on top
    * of a base that already contains it. */
  def compact(spark: SparkSession, root: String, buckets: Int = 16): Unit = {
    heal(root)
    Seq(("df", dfSchema, col("tri")),
        ("sets", setsSchema, col("doc_id")),
        ("bands", bandsSchema, col("bkey"))).foreach {
      case (table, schema, key) =>
        val live = liveDirs(root, table)
        val covered = live.map { f =>
          val n = f.getName
          n.stripPrefix("base=").stripPrefix("delta=").toInt
        }
        if (covered.nonEmpty) {
          val k = covered.max
          val all = readState(spark, root, table, schema, None)
          val folded =
            if (table == "df") all.groupBy("tri").agg(sum("cnt").as("cnt"))
            else all
          val dir = new java.io.File(root, table)
          val staging = new java.io.File(dir, s".staging_compact_$k")
          if (staging.exists()) delete(staging)
          folded.withColumn("gbucket", gb(key, buckets))
            .repartition(col("gbucket"), key)
            .write.partitionBy("gbucket").mode("overwrite")
            .parquet(staging.getPath)
          val target = new java.io.File(dir, s"base=$k")
          if (target.exists()) delete(target)
          if (!staging.renameTo(target))
            throw new java.io.IOException(s"cannot promote $staging to $target")
          // lazy cleanup of everything the new base covers
          live.filter(_.getName != s"base=$k").foreach(delete)
        }
    }
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
