package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter sidecar index — POINT-LOOKUP file skipping on a
  * high-cardinality column, the case where [[ZOrderLayout]]'s min/max
  * stats are useless (every file's [min,max] of a scattered id column
  * spans the whole domain). This is Delta's BLOOMFILTER INDEX move,
  * rebuilt from public primitives so the planning stays visible:
  *
  *  1. the table is laid out by whatever its NATURAL clustering is
  *     (here: a hash repartition on a layout column — by-source, by-day
  *     — chosen for scan locality, NOT for the lookup key);
  *  2. ONE distributed pass groups rows by `_metadata.file_path` and
  *     folds each file's lookup-key set into a Bloom sketch via a typed
  *     [[Aggregator]] (map-side partial sketches merge with
  *     `mergeInPlace` — no driver loop, no per-file jobs);
  *  3. a point lookup consults the sidecar first and plans ONLY the
  *     files whose sketch might contain one of the probe keys; Bloom
  *     false positives cost a wasted file scan, false negatives are
  *     impossible, so results are EXACT.
  *
  * At 100 TB the sidecar is one row per file (a few KB of sketch each)
  * and a point lookup touches ~fpp x nFiles extra files instead of all
  * of them — the difference between a point read and a table scan on a
  * non-clustered column.
  *
  * MUTATION: the sidecar stays transactionally consistent with the
  * table instead of silently going stale —
  *  - [[refresh]] reconciles incrementally: sketches are rebuilt ONLY
  *    for files whose (path, size, mtime) is new or changed, entries
  *    for deleted files drop, untouched entries are carried over
  *    byte-identically (one row per file — no data rescan);
  *  - [[upsertBucketed]] is the partition-preserving write path: a
  *    bucket-partitioned layout lets an upsert rewrite only the
  *    buckets the batch touches, so refresh then rebuilds only those
  *    buckets' sketches — O(batch), not O(table), index maintenance;
  *  - [[graft.streaming.IncrementalRollup.mergeBatch]]'s `onCommit`
  *    hook wires refresh into the streaming merge loop.
  */
object BloomIndex {

  private def indexDir(dir: String) = s"$dir/_bloom_index"

  /** One-pass per-group Bloom builder: input = lookup-key string,
    * buffer = the sketch itself (serializable), output = serialized
    * sketch bytes. */
  private class BloomAgg(expectedPerFile: Long, fpp: Double)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expectedPerFile, fpp)
    override def reduce(b: BloomFilter, v: String): BloomFilter = {
      if (v != null) b.putString(v)
      b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b)
      a
    }
    override def finish(b: BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      b.writeTo(bos)
      bos.toByteArray
    }
    override def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** One distributed sketch-building pass over `df` (which must carry
    * `_metadata`): one output row per file —
    * (file_path, bloom, n_rows, file_size, file_mtime). */
  private def buildSketches(df: DataFrame, keyCol: String,
                            expectedPerFile: Long, fpp: Double): DataFrame = {
    val bloomAgg = udaf(new BloomAgg(expectedPerFile, fpp))
    df.groupBy(col("_metadata.file_path").as("file_path"))
      .agg(
        bloomAgg(col(keyCol).cast("string")).as("bloom"),
        count(lit(1)).as("n_rows"),
        max(col("_metadata.file_size")).as("file_size"),
        max(unix_millis(col("_metadata.file_modification_time")))
          .as("file_mtime"))
  }

  /** `file:/p`, `file:///p`, and `/p` all name the same local file —
    * compare listings and `_metadata.file_path` on this form. */
  private def normPath(p: String): String = p.replaceFirst("^file:/+", "/")

  /** Live data files under `dir` (recursive, so bucket-partition
    * subdirs are covered), skipping sidecar/hidden entries:
    * (path, size, mtime ms). Driver-side METADATA listing — one tuple
    * per file, the same cost class as any planner's file enumeration. */
  private def listDataFiles(spark: SparkSession,
                            dir: String): Seq[(String, Long, Long)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return Seq.empty
    val out = Seq.newBuilder[(String, Long, Long)]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      val full = st.getPath.toString
      // skip hidden files, anything under a `_`-prefixed sidecar dir
      // (_bloom_index, its crash-orphaned .staging, _zorder_manifest),
      // and crash-orphaned .old bucket dirs
      if (st.isFile && !name.startsWith("_") && !name.startsWith(".") &&
          !full.contains("/_") && !full.contains(".old/"))
        out += ((full, st.getLen, st.getModificationTime))
    }
    out.result()
  }

  /** Write `df` into `nFiles` files clustered on `layoutCol` (the scan-
    * locality layout), then build the per-file Bloom sidecar over
    * `keyCol` (the point-lookup key) in one distributed pass. */
  def write(df: DataFrame, layoutCol: String, keyCol: String, dir: String,
            nFiles: Int, expectedPerFile: Long = 100000L,
            fpp: Double = 0.01): Unit = {
    df.repartition(nFiles, col(layoutCol))
      .write.mode("overwrite").parquet(dir)
    refresh(df.sparkSession, dir, keyCol, expectedPerFile, fpp)
  }

  /** Reconcile the sidecar with the data directory, incrementally:
    * entries whose (path, size, mtime) still matches a live file are
    * CARRIED OVER (byte-identical, no rescan); entries for deleted or
    * rewritten files drop; sketches are built only for new/changed
    * files — one distributed pass over exactly those files. Also the
    * initial build (no sidecar = every file is new). The staged
    * rename-pair swap means a reader never sees a half-written
    * sidecar; the sidecar is derived data, so the non-atomic window is
    * rebuild-from-refresh, never data loss. */
  def refresh(spark: SparkSession, dir: String, keyCol: String,
              expectedPerFile: Long = 100000L, fpp: Double = 0.01): Unit = {
    import spark.implicits._
    val live = listDataFiles(spark, dir)
    val idxPath = new java.io.File(indexDir(dir))
    val empty = spark.emptyDataset[(String, Array[Byte], Long, Long, Long)]
      .toDF("file_path", "bloom", "n_rows", "file_size", "file_mtime")
    val existing: DataFrame =
      if (!idxPath.exists()) empty
      else {
        val cur = index(spark, dir)
        // a sidecar from before the (size, mtime) columns can't prove
        // any entry still matches its file — rebuild everything once
        if (cur.columns.contains("file_size")) cur else empty
      }
    val liveDf = live.toDF("live_path", "live_size", "live_mtime")
      .withColumn("live_norm", expr("regexp_replace(live_path, '^file:/+', '/')"))

    // unchanged rows survive as-is; only changed/new paths reach the
    // driver (to become the rebuild scan's file list)
    val normed = existing.withColumn(
      "norm", expr("regexp_replace(file_path, '^file:/+', '/')"))
    val kept = normed.join(liveDf,
        col("norm") === col("live_norm") &&
          col("file_size") === col("live_size") &&
          col("file_mtime") === col("live_mtime"),
        "left_semi")
      .drop("norm")
    val keptNorms = kept
      .select(expr("regexp_replace(file_path, '^file:/+', '/')"))
      .collect().map(_.getString(0)).toSet
    val toBuild = live.map(_._1).filterNot(p => keptNorms.contains(normPath(p)))

    val fresh =
      if (toBuild.isEmpty)
        kept.limit(0)
      else
        buildSketches(spark.read.parquet(toBuild: _*), keyCol,
          expectedPerFile, fpp)
    val next = kept.unionByName(fresh).coalesce(1)

    // staged swap: never leave a partially-written live sidecar
    val staging = indexDir(dir) + ".staging"
    next.write.mode("overwrite").parquet(staging)
    val target = new java.io.File(indexDir(dir))
    val old = new java.io.File(indexDir(dir) + ".old")
    if (old.exists()) delete(old)
    if (target.exists() && !target.renameTo(old))
      throw new java.io.IOException(s"cannot stage out ${target.getPath}")
    if (!new java.io.File(staging).renameTo(target))
      throw new java.io.IOException(s"cannot promote $staging")
    delete(old)
  }

  /** Bucket-partitioned layout (`dir/gbucket=K/`): bucket =
    * pmod(hash(layoutCol), nBuckets). The layout that makes upserts
    * index-friendly — [[upsertBucketed]] rewrites only touched
    * buckets, and partition pruning serves scans on `layoutCol`. */
  def writeBucketed(df: DataFrame, layoutCol: String, keyCol: String,
                    dir: String, nBuckets: Int,
                    expectedPerFile: Long = 100000L,
                    fpp: Double = 0.01): Unit = {
    df.withColumn("gbucket", pmod(hash(col(layoutCol)), lit(nBuckets)))
      .repartition(nBuckets, col("gbucket"))
      .write.partitionBy("gbucket").mode("overwrite").parquet(dir)
    refresh(df.sparkSession, dir, keyCol, expectedPerFile, fpp)
  }

  /** Partition-preserving upsert: replace-by-`keyCols` semantics
    * ([[Upsert.replaceByKey]]), but only the buckets the batch touches
    * are read (partition-pruned scan), rewritten (staged rename-pair
    * per bucket), and re-sketched (refresh sees every other file
    * byte-unchanged). Index maintenance cost is O(touched buckets) =
    * O(batch), not O(table) — the lakehouse contract the write-once
    * sidecar lacked. */
  def upsertBucketed(spark: SparkSession, dir: String, batch: DataFrame,
                     layoutCol: String, keyCol: String,
                     keyCols: Seq[String], nBuckets: Int,
                     expectedPerFile: Long = 100000L,
                     fpp: Double = 0.01): Unit = {
    val bucket = pmod(hash(col(layoutCol)), lit(nBuckets)).cast("int")
    val touched = batch.select(bucket.as("gbucket")).distinct()
      .collect().map(_.getInt(0)).sorted // bounded by nBuckets
    if (touched.isEmpty) return
    val cur = spark.read.parquet(dir)
      .where(col("gbucket").isin(touched.map(Integer.valueOf): _*)) // partition-pruned
      .drop("gbucket")
    val merged = Upsert.replaceByKey(cur, batch, keyCols)
    val staging = dir + ".upsert_staging"
    merged.withColumn("gbucket", bucket)
      .repartition(touched.length, col("gbucket"))
      .write.partitionBy("gbucket").mode("overwrite").parquet(staging)
    touched.foreach { k =>
      val tgt = new java.io.File(dir, s"gbucket=$k")
      val src = new java.io.File(staging, s"gbucket=$k")
      val old = new java.io.File(dir, s"gbucket=$k.old")
      if (old.exists()) delete(old)
      if (tgt.exists() && !tgt.renameTo(old))
        throw new java.io.IOException(s"cannot stage out ${tgt.getPath}")
      if (src.exists() && !src.renameTo(tgt))
        throw new java.io.IOException(s"cannot promote ${src.getPath}")
      delete(old)
    }
    delete(new java.io.File(staging))
    refresh(spark, dir, keyCol, expectedPerFile, fpp)
  }

  /** Sidecar contents: (file_path, bloom, n_rows, file_size,
    * file_mtime). */
  def index(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(indexDir(dir))

  /** Files whose sketch might contain ANY of `keys` — the planned set
    * for a point lookup. The probe runs DISTRIBUTED over the sidecar
    * (each row deserializes its own sketch in the executors) and only
    * the surviving paths reach the driver — so planning stays cheap
    * even at millions of files, where collecting every sketch first
    * would move GBs to the driver. The typed filter is cold-path
    * planning over one-row-per-file data, not a data-path UDF. */
  def selectFiles(spark: SparkSession, dir: String,
                  keys: Seq[String]): Seq[String] = {
    val probe = keys.toArray
    index(spark, dir).select("file_path", "bloom")
      .filter { r =>
        val bloom = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        probe.exists(bloom.mightContainString)
      }
      .select("file_path")
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Exact point lookup: plan only sketch-surviving files, then apply
    * the exact IN predicate as a residual (kills Bloom false
    * positives). */
  def lookup(spark: SparkSession, dir: String, keyCol: String,
             keys: Seq[String]): DataFrame = {
    val files = selectFiles(spark, dir, keys)
    val residual = col(keyCol).cast("string").isin(keys: _*)
    if (files.isEmpty)
      spark.read.parquet(dir).where(residual).limit(0)
    else
      spark.read.parquet(files: _*).where(residual)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
