package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, IntegerType, StructType}

/** Last-write-wins keyed table as an LSM merge-on-read store — the
  * third commit protocol in the upsert family, after the rename-pair
  * snapshot swap ([[graft.streaming.BucketedSnapshot]]) and the
  * manifest-pointer commit ([[graft.streaming.ManifestTable]]).
  *
  * Those two scale their write volume to the touched BUCKETS: a batch
  * that touches a bucket rewrites that whole bucket (read-merge-
  * rewrite). This one scales writes to the BATCH unconditionally — an
  * upsert appends one [[DeltaStore]] delta (O(batch) bytes, one atomic
  * rename) and never rereads or rewrites stored data, so a hot bucket
  * costs the same as a cold one. The merge moves to the READ side:
  * [[snapshot]] unions the live dirs and keeps each key's row from the
  * highest batch (the LSM/ReplacingMergeTree trade — cheap writes,
  * fold-on-read), and [[compact]] folds the fold into a new base so
  * read cost stops growing with replay depth. Readers see only
  * promoted dirs at every instant, so a crash mid-upsert leaves the
  * previous snapshot intact and a checkpoint REPLAY of the same batch
  * id replaces its own delta (idempotent).
  *
  * Rows within one batch must be unique per key (dedup the batch
  * first, as every upsert path here does): the LWW fold orders by the
  * batch id alone, so (key, batch) uniqueness is what makes the
  * snapshot deterministic.
  */
final case class MorTable(store: DeltaStore, keyCols: Seq[String],
                          bloomItems: Option[Long] = None) {

  /** SSTable-style per-delta key bloom. With `bloomItems = Some(n)`
    * (the expected keys per batch — a capacity number the operator
    * knows), every upsert/delete also writes a `_keybloom` sidecar of
    * the delta's key hashes, and [[lookup]] SKIPS whole deltas that
    * cannot contain any probe key — the LSM read-amplification fix
    * every SSTable format ships: gbucket pruning caps at 1/buckets,
    * but a point probe against a long delta tail mostly hits deltas
    * that never touched the key. Safety is one-sided by construction:
    * blooms have no false negatives at ANY sizing (an undersized n
    * only raises the false-positive rate → extra reads), tombstone
    * keys are in the bloom (both write paths go through [[write]], so
    * a skipped delta can never hide a newer delete), and a MISSING
    * sidecar (crash between commit and sidecar write, or a pre-bloom
    * delta) means "must read". The base is always read — it is the
    * bulk a real probe usually hits; the win is skipping the tail. */
  private val bloomSidecar = "_keybloom"
  private def keyHash = xxhash64(keyCols.map(col): _*)

  /** `schema` + the `_batch` lineage column the fold orders by and the
    * `_deleted` tombstone marker. */
  private def stored(schema: StructType): StructType =
    schema.add("_batch", IntegerType, nullable = false)
      .add("_deleted", BooleanType, nullable = false)

  /** Append `batch` (unique per key) as the delta for `batchId` —
    * O(batch) write bytes, one rename, no stored-data reads. */
  def upsert(batch: DataFrame, batchId: Int): Unit =
    write(batch.withColumn("_deleted", lit(false)), batchId)

  /** Delete `keys` as the delta for `batchId`: appends TOMBSTONE rows
    * (key columns + `_deleted = true`, data columns null-filled from
    * `schema`) that the LWW fold lets outrank every earlier version.
    * The delete is logical until the next [[compact]], which drops
    * tombstone-winning keys from the base — the point where the bytes
    * physically leave storage (the GDPR clock's stop condition; run a
    * compact to make a deletion durable). A batch id carries EITHER an
    * upsert or a delete (a delta is replaced whole by its batch id);
    * union key-disjoint changes into one frame first if both are
    * needed in one batch. */
  def delete(keys: DataFrame, batchId: Int, schema: StructType): Unit = {
    val tomb = schema.fields.foldLeft(
      keys.select(keyCols.map(col): _*).distinct()) { (df, f) =>
        if (keyCols.contains(f.name)) df
        else df.withColumn(f.name, lit(null).cast(f.dataType))
      }
      .select(schema.fieldNames.map(col).toSeq: _*)
      .withColumn("_deleted", lit(true))
    write(tomb, batchId)
  }

  private def write(df: DataFrame, batchId: Int): Unit = {
    store.append(
      df
        .withColumn("_batch", lit(batchId))
        .withColumn("gbucket", store.gb(struct(keyCols.map(col): _*))),
      batchId,
      within = keyCols.map(col))
    bloomItems.foreach { n =>
      val bf = df.select(keyHash.as("_h")).stat.bloomFilter("_h", n, 0.01)
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      store.writeSidecar(batchId, bloomSidecar, out.toByteArray)
    }
  }

  /** The current table: every key's latest-batch row, folded from the
    * live base + deltas. `schema` is the DATA schema (no `_batch`). */
  def snapshot(spark: SparkSession, schema: StructType): DataFrame =
    lww(store.read(spark, stored(schema), None))
      .where(!col("_deleted"))
      .select(schema.fieldNames.map(col).toSeq: _*)

  /** Time travel: the table as of `batch` — deltas above it are
    * excluded from the fold. History is retained back to the last
    * [[compact]] (an older `batch` is refused, not answered wrongly):
    * the reproducible-training-snapshot read, pinned by batch id
    * instead of copying the corpus. */
  def snapshotAsOf(spark: SparkSession, schema: StructType,
                   batch: Int): DataFrame =
    lww(store.read(spark, stored(schema), None, asOf = Some(batch)))
      .where(!col("_deleted"))
      .select(schema.fieldNames.map(col).toSeq: _*)

  /** Continuous ingestion: upsert each micro-batch under its stream
    * batch id. Checkpoint replay of a batch re-appends the SAME delta
    * (replace-by-batch-id in [[DeltaStore.append]]), so the sink is
    * idempotent end-to-end — the exactly-once story without any sink-
    * side transaction log beyond the delta dirs themselves. The batch
    * is deduped on the key (LWW needs (key, batch) uniqueness):
    * with `orderCol = Some(c)` the row with the HIGHEST c per key
    * survives (the Hudi-style precombine field — what makes
    * last-write-wins hold for a CDC stream whose micro-batch can
    * carry several versions of one key; ties on c resolve
    * arbitrarily, so c should be a monotonic version/event time).
    * Without it, dropDuplicates keeps an ARBITRARY row per key —
    * acceptable only when the source emits at most one version per
    * key per micro-batch; a caller with in-batch versions and no
    * orderCol must pre-resolve them upstream.
    *
    * `compactEvery = Some(n)` folds the store after every n-th batch
    * (ids n-1, 2n-1, ...) — the retention policy that keeps read-side
    * fold cost and delta-listing cost bounded on an endless stream.
    * Crash-safe even though the batch's commit-log entry lands after
    * foreachBatch returns: if the stream dies between this compact and
    * that commit, the batch REPLAYS under the same id and re-appends
    * `delta=id` — which the covering rule ignores (id <= base K), so
    * the replayed bytes are dead weight, never a double-count. The
    * trade: compaction truncates time travel to the compact point. */
  def sink(input: DataFrame, checkpointDir: String,
           availableNow: Boolean = true,
           compactEvery: Option[Int] = None,
           orderCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = input.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // DeltaStore batch ids are Int; a stream epoch past 2^31 must
        // fail loudly, not wrap negative and corrupt the LWW order
        require(id <= Int.MaxValue, s"stream batch id $id exceeds Int range")
        val b = orderCol match {
          case Some(c) => batch
            .withColumn("_vrn", row_number().over(
              Window.partitionBy(keyCols.map(col): _*)
                .orderBy(col(c).desc_nulls_last)))
            .where(col("_vrn") === 1).drop("_vrn")
          case None => batch.dropDuplicates(keyCols)
        }
        if (!b.isEmpty) upsert(b, id.toInt)
        compactEvery.foreach { n =>
          if (id % n == n - 1) compact(batch.sparkSession,
            StructType(batch.schema.fields.toSeq))
        }
      }
    (if (availableNow) writer.trigger(
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }

  /** Bucket-pruned snapshot restricted to `keys`' buckets — the point-
    * lookup path: whole deltas whose key bloom excludes every probe
    * key are SKIPPED (see [[bloomItems]]), then only the `gbucket`
    * dirs the probe keys hash into are read, the LWW fold runs over
    * that slice, and an inner join restricts to the probe. `keys`
    * must carry `keyCols`. */
  def lookup(spark: SparkSession, schema: StructType,
             keys: DataFrame): DataFrame = {
    val touched = store.touched(keys, struct(keyCols.map(col): _*))
    lww(store.readEntries(spark, stored(schema),
        bloomLiveEntries(keys), Some(touched)))
      .where(!col("_deleted"))
      .join(keys.select(keyCols.map(col): _*).distinct(), keyCols)
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Probe-keys-per-lookup cap on driver-side bloom probing: above it
    * the probe is a scan, not a point lookup, and entry skipping is
    * abandoned (bucket pruning still applies). */
  private val bloomProbeCap = 65536

  /** The live entries a lookup for `keys` must read: every base +
    * every delta whose bloom might contain some probe key (missing
    * bloom, disabled blooms, or an over-cap probe ⇒ keep all). */
  private[graft] def bloomLiveEntries(keys: DataFrame)
      : Seq[(Boolean, Int, java.io.File)] = {
    val entries = store.live()
    if (bloomItems.isEmpty) entries
    else {
      val hashes = keys.select(keyHash.as("_h")).distinct()
        .limit(bloomProbeCap + 1).collect().map(_.getLong(0))
      if (hashes.length > bloomProbeCap) entries
      else entries.filter {
        case (true, _, _) => true
        case (false, _, d) => store.readSidecar(d, bloomSidecar) match {
          case None => true
          case Some(bytes) =>
            val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(bytes))
            hashes.exists(bf.mightContainLong)
        }
      }
    }
  }

  /** Change feed (CDC read): each key whose LWW state DIFFERS between
    * the table as of `from` and as of `to`, with an `op` column —
    * `insert` (absent before, live now; new values), `update` (live in
    * both, any data column changed; new values), `delete` (live
    * before, tombstone-or-absent now; the OLD values, the preimage a
    * downstream purge needs). Keys untouched by batches in (from, to]
    * never appear — and are never FOLDED either: the fold inputs are
    * bucket-pruned to the gbuckets of touched keys and semi-joined on
    * them, so feed cost scales with the changed slice, not the table.
    * Both bounds must be at or above the last compact (as
    * [[snapshotAsOf]]; history below the base is gone). This is the
    * read that lets a downstream consumer (a derived table, a cache,
    * a reverse index) follow the table incrementally instead of
    * diffing snapshots. */
  def changes(spark: SparkSession, schema: StructType,
              from: Int, to: Int): DataFrame =
    changes(spark, schema, from, to, preimage = false)

  /** [[changes]] with `preimage = true` emits an update as TWO rows —
    * `update_pre` (old values) and `update_post` (new values) — the
    * Delta-CDF/Debezium shape an incremental view maintainer needs:
    * additive state subtracts the preimage and adds the postimage
    * ([[IncrementalView]]), which plain postimage-only updates cannot
    * express. */
  def changes(spark: SparkSession, schema: StructType,
              from: Int, to: Int, preimage: Boolean): DataFrame = {
    require(from <= to, s"change feed bounds out of order: $from > $to")
    val st = stored(schema)
    val touched = store.read(spark, st, None, asOf = Some(to))
      .where(col("_batch") > from)
      .select(keyCols.map(col): _*).distinct()
    val gbs = store.touched(touched, struct(keyCols.map(col): _*))
    def state(asOf: Int) =
      lww(store.read(spark, st, Some(gbs), asOf = Some(asOf))
          .join(touched, keyCols, "left_semi"))
        .where(!col("_deleted"))
    val dataCols = schema.fieldNames.filterNot(keyCols.contains).toSeq
    val olds = state(from).select(
      keyCols.map(col) ++ Seq(lit(true).as("_in_a"),
        struct(dataCols.map(col): _*).as("_va")): _*)
    val news = state(to).select(
      keyCols.map(col) ++ Seq(lit(true).as("_in_b"),
        struct(dataCols.map(col): _*).as("_vb")): _*)
    val diff = olds.join(news, keyCols, "full_outer")
      .withColumn("op",
        when(col("_in_a").isNull, "insert")
          .when(col("_in_b").isNull, "delete")
          .otherwise("update"))
      // an update whose values are byte-identical is no change at all
      .where(col("op") =!= "update" || !(col("_va") <=> col("_vb")))
    if (!preimage)
      diff.select(keyCols.map(col) ++ Seq(col("op")) ++ dataCols.map(c =>
        when(col("op") === "delete", col(s"_va.$c"))
          .otherwise(col(s"_vb.$c")).as(c)): _*)
    else
      diff
        .select(keyCols.map(col) :+ explode(
          when(col("op") === "update", array(
            struct(lit("update_pre").as("op"), col("_va").as("v")),
            struct(lit("update_post").as("op"), col("_vb").as("v"))))
          .when(col("op") === "insert",
            array(struct(lit("insert").as("op"), col("_vb").as("v"))))
          .otherwise(
            array(struct(lit("delete").as("op"), col("_va").as("v")))))
          .as("_e"): _*)
        .select(keyCols.map(col) ++ Seq(col("_e.op").as("op")) ++
          dataCols.map(c => col(s"_e.v.$c").as(c)): _*)
  }

  /** Fold live dirs into one base holding just each key's winning row
    * (the `_batch` column is kept: later deltas must still outrank the
    * base). Tombstone-winning keys are dropped entirely — the base
    * folds ALL surviving history, so no older version can resurface,
    * and this is where deleted bytes physically leave storage. Compact
    * only batches whose upstream checkpoint is durable — a replayed
    * batch j <= base K would stack `delta=j` on a base that already
    * folded it, and the LWW order would then prefer the base's row
    * from a HIGHER-numbered original batch, which is correct, but the
    * replayed delta's bytes are dead weight until the next compact. */
  def compact(spark: SparkSession, schema: StructType): Unit =
    store.compact(spark, stored(schema),
      struct(keyCols.map(col): _*),
      df => lww(df).where(!col("_deleted")))

  /** Export a reproducible training snapshot: the table as of `asOf`
    * (or current) materialized as PLAIN partitioned parquet any
    * consumer can read without this library — the handoff artifact
    * between the data pipeline and a trainer — plus a `_PROVENANCE`
    * sidecar recording the source store, key columns, and the batch
    * horizon that produced it (the lineage a training run pins
    * instead of copying "whatever the table said that day"). The fold
    * happens once at export; readers pay zero merge cost. */
  def exportSnapshot(spark: SparkSession, schema: StructType, path: String,
                     asOf: Option[Int] = None,
                     partitionCols: Seq[String] = Nil): Unit = {
    val snap = asOf match {
      case Some(b) => snapshotAsOf(spark, schema, b)
      case None => snapshot(spark, schema)
    }
    val w = snap.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
    val horizon = asOf.orElse(store.live().map(_._2).maxOption)
    java.nio.file.Files.write(
      new java.io.File(path, "_PROVENANCE").toPath,
      (s"store=${store.dir}\nkeys=${keyCols.mkString(",")}\n" +
        s"asOfBatch=${horizon.getOrElse(-1)}\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Count-based compaction policy: fold when the live delta tail
    * exceeds `maxDeltas`. Preferable to scheduling by batch id
    * ([[sink]]'s `compactEvery`): replays, crashes, and manual
    * compactions all shift id-based schedules, while the delta TAIL is
    * what read cost (listing, fold width, bloom probes) actually
    * follows. Returns whether a compact ran. */
  def compactIfNeeded(spark: SparkSession, schema: StructType,
                      maxDeltas: Int): Boolean = {
    val run = store.deltaCount() > maxDeltas
    if (run) compact(spark, schema)
    run
  }

  /** Keep each key's highest-`_batch` row. */
  private def lww(all: DataFrame): DataFrame =
    all
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(col("_batch").desc)))
      .where(col("_rn") === 1)
      .drop("_rn")
}
