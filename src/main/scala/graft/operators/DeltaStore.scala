package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** LSM-style append-only bucketed table: per-batch delta dirs holding
  * hash-bucketed subdirs (`dir/delta=K/gbucket=B/part-*.parquet`),
  * periodically folded into a `base=K` dir. The state-store seam the
  * incremental index family ([[LshIndex]], [[EmbIndex]]), the
  * merge-on-read table ([[MorTable]]), and incremental statistics
  * ([[IncrementalStats]]) build on.
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
  * TWO commit protocols behind the same API, selected by `manifest`:
  *
  *   - `manifest = false` (default, local FS): each delta is staged,
  *     then ONE rename promotes `delta=K` (atomic on POSIX). A
  *     replayed batch replaces its own delta — idempotent under the
  *     replay-from-checkpoint contract. [[compact]] promotes `base=K`
  *     with the same single rename; readers ignore covered dirs from
  *     that instant, so cleanup is lazy and a crash anywhere leaves a
  *     readable, non-double-counting state. [[heal]] drops dead
  *     staging dirs.
  *   - `manifest = true` (object-store-safe, NO renames anywhere):
  *     data prefixes are written DIRECTLY to their final, epoch-unique
  *     paths (`data/d<K>_e<E>/gbucket=B/...`) — invisible until a
  *     manifest object (`manifest=<E>`) listing the live (kind, id,
  *     prefix) entries is written and the `_current` pointer is moved
  *     to E (here a tmp-file rename standing in for the object
  *     store's atomic PUT / conditional copy, exactly
  *     [[graft.streaming.ManifestTable]]'s move). Replay rewrites the
  *     same batch id under a NEW epoch prefix and the manifest entry
  *     is replaced, so in-place overwrites never happen; a crash
  *     mid-write leaves an unreferenced prefix that readers never see
  *     and [[heal]] garbage-collects. Single-writer assumption, as in
  *     every manifest-pointer design.
  */
final case class DeltaStore(dir: String, buckets: Int = 16,
                            manifest: Boolean = false) {

  /** The deterministic bucket id of a key column. */
  def gb(c: Column): Column = pmod(hash(c), lit(buckets)).cast("int")

  /** Distinct bucket ids a frame's keys hash into — a driver-side
    * metadata collect bounded by `buckets`. */
  def touched(df: DataFrame, key: Column): Seq[Int] =
    df.select(gb(key).as("g")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

  def heal(): Unit =
    if (manifest) healManifest()
    else {
      val d = new java.io.File(dir)
      Option(d.listFiles()).foreach(_.foreach { f =>
        if (f.getName.startsWith(".staging")) DeltaStore.delete(f)
      })
    }

  /** Live (isBase, id, dataDir) entries, newest-covering rule applied.
    * With `asOf`, deltas above that batch are excluded — the
    * time-travel read. History BELOW the newest base is folded away
    * (compaction is the retention boundary, as in any LSM/table-format
    * log), so an `asOf` older than the base is refused rather than
    * answered wrongly. */
  private def liveEntries(asOf: Option[Int]): Seq[(Boolean, Int, java.io.File)] = {
    val raw: Seq[(Boolean, Int, java.io.File)] =
      if (manifest) {
        readManifest() match {
          case None => Nil
          case Some((_, entries)) => entries.map { case (isBase, id, rel) =>
            (isBase, id, new java.io.File(dir, rel))
          }
        }
      } else {
        val d = new java.io.File(dir)
        val all = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
          .filter(_.isDirectory)
        val bases = all.filter(_.getName.startsWith("base="))
        bases.map(f => f.getName.stripPrefix("base=").toInt).sorted.lastOption match {
          case None => all.filter(_.getName.startsWith("delta="))
            .map(f => (false, f.getName.stripPrefix("delta=").toInt, f))
          case Some(k) =>
            bases.filter(_.getName == s"base=$k").map(f => (true, k, f)) ++
              all.filter(f => f.getName.startsWith("delta=") &&
                f.getName.stripPrefix("delta=").toInt > k)
                .map(f => (false, f.getName.stripPrefix("delta=").toInt, f))
        }
      }
    // Covering rule, uniform across protocols: with a base at K, only
    // deltas with id > K count — a REPLAYED delta j <= K (appended on
    // top of a base that already folded it) must not double-count.
    val live = raw.collectFirst { case (true, k, _) => k } match {
      case None => raw
      case Some(k) => raw.filter { case (isBase, id, _) => isBase || id > k }
    }
    asOf match {
      case None => live
      case Some(j) =>
        live.collectFirst { case (true, k, _) => k }.foreach(k => require(j >= k,
          s"as-of batch $j predates base=$k — compaction folded that history away"))
        live.filter { case (isBase, id, _) => isBase || id <= j }
    }
  }

  /** Bucket-pruned union of the live dirs (every bucket if `touched`
    * is None); empty frame with `schema` when none exist. `asOf`
    * restricts to deltas <= that batch (time travel back to the last
    * compact; older as-of values are refused — see [[liveEntries]]). */
  def read(spark: SparkSession, schema: StructType,
           touched: Option[Seq[Int]], asOf: Option[Int] = None): DataFrame = {
    val paths = for {
      (_, _, d) <- liveEntries(asOf)
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
    * `batchId`: rename protocol — staged write, one atomic rename,
    * replacing an existing same-batch delta (replay idempotence);
    * manifest protocol — direct write to a fresh epoch prefix, then
    * manifest + pointer commit replacing the batch's entry.
    *
    * The write shuffle targets exactly `buckets` partitions keyed on
    * the bucket, yielding ~one file per bucket per delta: deltas are
    * BATCH-sized, and letting the session's shuffle partitions each
    * write into every bucket dir produced up to 32x16 tiny files per
    * delta — measured as a dominant replay cost (file-open overhead on
    * both sides). At production batch sizes the partition count scales
    * with batch bytes over target file size instead. */
  def append(df: DataFrame, batchId: Int, within: Seq[Column]): Unit = {
    def write(target: java.io.File): Unit =
      df.repartition(buckets, col("gbucket"))
        .sortWithinPartitions((col("gbucket") +: within): _*)
        .write.partitionBy("gbucket").mode("overwrite")
        .parquet(target.getPath)
    if (manifest) {
      val (epoch, entries) = readManifest().getOrElse((0L, Nil))
      val rel = s"data/d${batchId}_e${epoch + 1}"
      write(new java.io.File(dir, rel))
      commitManifest(epoch + 1,
        entries.filterNot { case (isBase, id, _) => !isBase && id == batchId } :+
          ((false, batchId, rel)))
    } else {
      val d = new java.io.File(dir)
      d.mkdirs()
      val staging = new java.io.File(d, s".staging_$batchId")
      if (staging.exists()) DeltaStore.delete(staging)
      write(staging)
      val target = new java.io.File(d, s"delta=$batchId")
      if (target.exists()) DeltaStore.delete(target)
      if (!staging.renameTo(target))
        throw new java.io.IOException(s"cannot promote $staging to $target")
    }
  }

  /** Fold the live dirs into one base (id = highest batch on disk) so
    * read listing cost stops growing with replay depth. `fold` merges
    * the unioned rows (identity for immutable-row tables; a sum-by-key
    * for additive ones). Only compact batches whose downstream effects
    * are durably committed: a checkpoint REPLAY of batch j <= K would
    * append `delta=j` on top of a base that already contains it (the
    * replayed bytes are ignored by the covering rule / replaced entry,
    * but they are dead weight until the next compact). */
  def compact(spark: SparkSession, schema: StructType, key: Column,
              fold: DataFrame => DataFrame): Unit = {
    heal()
    val live = liveEntries(None)
    if (live.nonEmpty) {
      val k = live.map(_._2).max
      val folded = fold(read(spark, schema, None))
        .withColumn("gbucket", gb(key))
        .repartition(buckets, col("gbucket"))
        .sortWithinPartitions(col("gbucket"), key)
      if (manifest) {
        val (epoch, _) = readManifest().getOrElse((0L, Nil))
        val rel = s"data/b${k}_e${epoch + 1}"
        folded.write.partitionBy("gbucket").mode("overwrite")
          .parquet(new java.io.File(dir, rel).getPath)
        commitManifest(epoch + 1, Seq((true, k, rel)))
        healManifest() // old prefixes are now unreferenced — GC them
      } else {
        val d = new java.io.File(dir)
        val staging = new java.io.File(d, s".staging_compact_$k")
        if (staging.exists()) DeltaStore.delete(staging)
        folded.write.partitionBy("gbucket").mode("overwrite")
          .parquet(staging.getPath)
        val target = new java.io.File(d, s"base=$k")
        if (target.exists()) DeltaStore.delete(target)
        if (!staging.renameTo(target))
          throw new java.io.IOException(s"cannot promote $staging to $target")
        live.map(_._3).filter(_.getName != s"base=$k").foreach(DeltaStore.delete)
      }
    }
  }

  // ---- manifest protocol internals -------------------------------

  /** (epoch, entries) from the current pointer; None before the first
    * commit. Entry = (isBase, id, relative data prefix). */
  private def readManifest(): Option[(Long, Seq[(Boolean, Int, String)])] = {
    val cur = new java.io.File(dir, "_current")
    if (!cur.exists()) None
    else {
      val epoch = new String(java.nio.file.Files.readAllBytes(cur.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      val mf = new java.io.File(dir, s"manifest=$epoch")
      val entries = new String(java.nio.file.Files.readAllBytes(mf.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty).map { line =>
          val Array(kind, id, rel) = line.split("\t")
          (kind == "base", id.toInt, rel)
        }
      Some((epoch, entries))
    }
  }

  /** Write `manifest=<epoch>` (a new object), then move the pointer —
    * the single atomic step. Deltas sort by id for deterministic read
    * order. */
  private def commitManifest(epoch: Long,
                             entries: Seq[(Boolean, Int, String)]): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val body = entries.sortBy { case (isBase, id, _) => (!isBase, id) }
      .map { case (isBase, id, rel) =>
        s"${if (isBase) "base" else "delta"}\t$id\t$rel" }
      .mkString("\n")
    java.nio.file.Files.write(
      new java.io.File(d, s"manifest=$epoch").toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val tmp = new java.io.File(d, "_current.tmp")
    java.nio.file.Files.write(tmp.toPath,
      epoch.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, new java.io.File(d, "_current").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** GC: delete data prefixes and manifest objects the current pointer
    * does not reference (crash orphans, replaced replay prefixes,
    * pre-compact history). Single-writer, so nothing unreferenced can
    * become referenced again. */
  private def healManifest(): Unit = {
    readManifest().foreach { case (epoch, entries) =>
      val liveRel = entries.map(_._3).toSet
      val dataDir = new java.io.File(dir, "data")
      Option(dataDir.listFiles()).foreach(_.foreach { f =>
        if (!liveRel.contains(s"data/${f.getName}")) DeltaStore.delete(f)
      })
      Option(new java.io.File(dir).listFiles()).foreach(_.foreach { f =>
        if (f.getName.startsWith("manifest=") &&
          f.getName.stripPrefix("manifest=").toLong != epoch) f.delete()
      })
    }
  }
}

object DeltaStore {
  private[operators] def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
