package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
