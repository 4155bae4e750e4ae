package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** LSM-style append-only bucketed table: per-batch delta dirs holding
  * hash-bucketed subdirs (`dir/delta=K/gbucket=B/part-*.parquet`),
  * periodically folded into a `base=K` dir. The state-store seam the
  * incremental index family ([[LshIndex]], [[EmbIndex]]) builds on.
  *
  * Design point (vs [[graft.streaming.BucketedSnapshot]]'s
  * read-merge-rewrite buckets): when a batch's keys hash into every
  * bucket — the normal case for shingle vocabularies and band keys —
  * a replace-bucket merge rewrites O(table) bytes per batch. Appending
  * a delta dir writes O(batch) bytes regardless of table size; the
  * read side unions live dirs on the fly, pruned to the gbuckets a
  * probe's keys hash into. Listing cost grows with the delta count,
  * so long-lived stores call [[compact]] periodically.
  *
  * Commit protocol: each delta is staged, then ONE rename promotes
  * `delta=K` (atomic on POSIX; the object-store variant of this
  * pattern is [[graft.streaming.ManifestTable]]'s pointer move). A
  * replayed batch replaces its own delta — idempotent under the
  * replay-from-checkpoint contract. [[compact]] promotes `base=K`
  * with the same single rename; readers ignore covered dirs from
  * that instant, so cleanup is lazy and a crash anywhere leaves a
  * readable, non-double-counting state. [[heal]] drops dead staging
  * dirs.
  */
final case class DeltaStore(dir: String, buckets: Int = 16) {

  /** The deterministic bucket id of a key column. */
  def gb(c: Column): Column = pmod(hash(c), lit(buckets)).cast("int")

  /** Distinct bucket ids a frame's keys hash into — a driver-side
    * metadata collect bounded by `buckets`. */
  def touched(df: DataFrame, key: Column): Seq[Int] =
    df.select(gb(key).as("g")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

  def heal(): Unit = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith(".staging")) DeltaStore.delete(f)
    })
  }

  /** Live dirs: the newest `base=K` plus `delta=J` with J > K; deltas
    * a base covers are ignored even if still on disk. With `asOf`,
    * deltas above that batch are also excluded — the time-travel read.
    * History BELOW the newest base is folded away (compaction is the
    * retention boundary, as in any LSM/table-format log), so an `asOf`
    * older than the base is refused rather than answered wrongly. */
  private def liveDirs(asOf: Option[Int] = None): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    val all = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(_.isDirectory)
    val bases = all.filter(_.getName.startsWith("base="))
    val live = bases.map(f => f.getName.stripPrefix("base=").toInt).sorted.lastOption match {
      case None => all.filter(_.getName.startsWith("delta="))
      case Some(k) =>
        asOf.foreach(j => require(j >= k,
          s"as-of batch $j predates base=$k — compaction folded that history away"))
        bases.filter(_.getName == s"base=$k") ++
          all.filter(f => f.getName.startsWith("delta=") &&
            f.getName.stripPrefix("delta=").toInt > k)
    }
    asOf match {
      case None => live
      case Some(j) => live.filter(f => f.getName.startsWith("base=") ||
        f.getName.stripPrefix("delta=").toInt <= j)
    }
  }

  /** Bucket-pruned union of the live dirs (every bucket if `buckets`
    * is None); empty frame with `schema` when none exist. `asOf`
    * restricts to deltas <= that batch (time travel back to the last
    * compact; older as-of values are refused — see [[liveDirs]]). */
  def read(spark: SparkSession, schema: StructType,
           touched: Option[Seq[Int]], asOf: Option[Int] = None): DataFrame = {
    val paths = for {
      d <- liveDirs(asOf)
      sub <- Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      if sub.isDirectory && sub.getName.startsWith("gbucket=")
      if touched.forall(_.exists(k => sub.getName == s"gbucket=$k"))
    } yield sub.getPath
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths.sorted: _*)
  }

  /** Append `df` (carrying a `gbucket` column) as the delta for
    * `batchId`: staged write, one atomic rename; replaces an existing
    * same-batch delta (replay idempotence).
    *
    * The staging shuffle targets exactly `buckets` partitions keyed on
    * the bucket, yielding ~one file per bucket per delta: deltas are
    * BATCH-sized, and letting the session's shuffle partitions each
    * write into every bucket dir produced up to 32x16 tiny files per
    * delta — measured as a dominant replay cost (file-open overhead on
    * both sides). At production batch sizes the partition count scales
    * with batch bytes over target file size instead. */
  def append(df: DataFrame, batchId: Int, within: Seq[Column]): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val staging = new java.io.File(d, s".staging_$batchId")
    if (staging.exists()) DeltaStore.delete(staging)
    df.repartition(buckets, col("gbucket"))
      .sortWithinPartitions((col("gbucket") +: within): _*)
      .write.partitionBy("gbucket").mode("overwrite")
      .parquet(staging.getPath)
    val target = new java.io.File(d, s"delta=$batchId")
    if (target.exists()) DeltaStore.delete(target)
    if (!staging.renameTo(target))
      throw new java.io.IOException(s"cannot promote $staging to $target")
  }

  /** Fold the live dirs into one `base=K` (K = highest batch on disk)
    * so read listing cost stops growing with replay depth. `fold`
    * merges the unioned rows (identity for immutable-row tables; a
    * sum-by-key for additive ones). Only compact batches whose
    * downstream effects are durably committed: a checkpoint REPLAY of
    * batch j <= K would append `delta=j` on top of a base that already
    * contains it. */
  def compact(spark: SparkSession, schema: StructType, key: Column,
              fold: DataFrame => DataFrame): Unit = {
    heal()
    val live = liveDirs()
    if (live.nonEmpty) {
      val k = live.map(f =>
        f.getName.stripPrefix("base=").stripPrefix("delta=").toInt).max
      val folded = fold(read(spark, schema, None))
      val d = new java.io.File(dir)
      val staging = new java.io.File(d, s".staging_compact_$k")
      if (staging.exists()) DeltaStore.delete(staging)
      folded.withColumn("gbucket", gb(key))
        .repartition(buckets, col("gbucket"))
        .sortWithinPartitions(col("gbucket"), key)
        .write.partitionBy("gbucket").mode("overwrite")
        .parquet(staging.getPath)
      val target = new java.io.File(d, s"base=$k")
      if (target.exists()) DeltaStore.delete(target)
      if (!staging.renameTo(target))
        throw new java.io.IOException(s"cannot promote $staging to $target")
      live.filter(_.getName != s"base=$k").foreach(DeltaStore.delete)
    }
  }
}

object DeltaStore {
  private[operators] def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
