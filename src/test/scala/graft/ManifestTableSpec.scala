package graft

import graft.streaming.{IncrementalRollup, ManifestTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ManifestTable: pointer-commit semantics (round-trip, epoch GC,
  * orphan-prefix invisibility) and end-to-end equivalence of
  * mergeBatchManifest with the rename-pair mergeBatch. */
class ManifestTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_manifest_").toString

  test("commit/read round-trip; epochs advance; GC keeps exactly two") {
    val dir = tmp() + "/t"
    assert(ManifestTable.currentEpoch(dir) == -1L)
    assert(ManifestTable.commit(Seq((1, "a")).toDF("k", "v"), dir) == 0L)
    assert(ManifestTable.read(spark, dir, null).collect().map(_.getString(1)).toSet == Set("a"))
    assert(ManifestTable.commit(Seq((2, "b")).toDF("k", "v"), dir) == 1L)
    assert(ManifestTable.commit(Seq((3, "c")).toDF("k", "v"), dir) == 2L)
    val epochs = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).sorted
    assert(epochs.toSeq == Seq("epoch=1", "epoch=2"), "GC keeps previous + current")
    assert(ManifestTable.read(spark, dir, null).collect().map(_.getString(1)).toSet == Set("c"))
    // time travel: the retained previous epoch is still readable
    assert(ManifestTable.readAt(spark, dir, 1L)
      .collect().map(_.getString(1)).toSet == Set("b"))
    assertThrows[IllegalArgumentException](ManifestTable.readAt(spark, dir, 0L))
  }

  test("an orphan epoch prefix (crash before pointer move) is invisible and reclaimed") {
    val dir = tmp() + "/t"
    ManifestTable.commit(Seq((1, "committed")).toDF("k", "v"), dir)
    // simulate a crash AFTER the next epoch's data write, BEFORE the
    // pointer move: the prefix exists but _current still names epoch 0
    Seq((9, "orphan")).toDF("k", "v").write.parquet(s"$dir/epoch=1")
    assert(ManifestTable.currentEpoch(dir) == 0L)
    assert(ManifestTable.read(spark, dir, null)
      .collect().map(_.getString(1)).toSet == Set("committed"))
    // the re-run commit overwrites the orphan and commits it
    assert(ManifestTable.commit(Seq((2, "retry")).toDF("k", "v"), dir) == 1L)
    assert(ManifestTable.read(spark, dir, null)
      .collect().map(_.getString(1)).toSet == Set("retry"))
  }

  test("mergeBatchManifest produces the same rollup as the rename-pair path") {
    val base = tmp()
    def batch(rows: Seq[(String, String, Double)]) =
      rows.toDF("coin_id", "d", "price_usd")
        .select(col("coin_id"), col("d").cast("date").as("fetch_date"), col("price_usd"))
    val batches = Seq(
      batch(Seq(("btc", "2024-01-03", 10.0), ("eth", "2024-01-05", 5.0))),
      batch(Seq(("btc", "2024-01-03", 12.0), ("btc", "2024-02-01", 20.0))),
      batch(Seq(("eth", "2024-01-09", 4.0), ("eth", "2024-01-05", 7.0))))
    batches.foreach(b =>
      IncrementalRollup.mergeBatch(spark, b, s"$base/rp/table", s"$base/rp/rollup"))
    batches.foreach(b =>
      IncrementalRollup.mergeBatchManifest(spark, b, s"$base/mf/table", s"$base/mf/rollup"))
    val rp = spark.read.parquet(s"$base/rp/rollup")
      .orderBy("coin_id", "year", "month").collect().toSeq
    val mf = ManifestTable.read(spark, s"$base/mf/rollup", null)
      .orderBy("coin_id", "year", "month").collect().toSeq
    assert(rp == mf, s"rename-pair vs manifest rollup diverge:\n$rp\n$mf")
    // late-data-wins check shared by both: btc 2024-01 min/max from the
    // batch-2 overwrite (12.0), eth 2024-01 from {7.0, 4.0}
    val m = mf.map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
      (r.getDouble(3), r.getDouble(4))).toMap
    assert(m(("btc", 2024, 1)) == (12.0, 12.0))
    assert(m(("btc", 2024, 2)) == (20.0, 20.0))
    assert(m(("eth", 2024, 1)) == (4.0, 7.0))
  }

  test("commitBuckets rewrites only touched buckets and carries the rest forward") {
    val dir = tmp() + "/t"
    def rows(xs: (Int, String)*) =
      xs.toDF("k", "v").withColumn("gbucket", col("k") % 3)
    // epoch 0: buckets 0, 1, 2
    assert(ManifestTable.commitBuckets(rows(0 -> "a", 1 -> "b", 2 -> "c"), dir) == 0L)
    // epoch 1: only bucket 1 changes
    assert(ManifestTable.commitBuckets(rows(4 -> "B"), dir) == 1L)
    // PRUNING EVIDENCE: the new epoch prefix holds ONLY the touched
    // bucket; untouched buckets' bytes were not rewritten — their
    // manifest entries still name the epoch-0 prefix
    val e1 = new java.io.File(dir, "epoch=1").listFiles()
      .filter(_.getName.startsWith("gbucket=")).map(_.getName).toSeq
    assert(e1 == Seq("gbucket=1"), s"epoch 1 should hold only bucket 1: $e1")
    val snap = ManifestTable.readBucketed(spark, dir, null)
      .select("k", "v").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(snap == Map(0 -> "a", 4 -> "B", 2 -> "c"),
      s"bucket 1 replaced, others carried: $snap")
    // pruned read plans only the asked bucket
    val b2 = ManifestTable.readBuckets(spark, dir, null, Some(Seq(2)))
      .select("v").collect().map(_.getString(0)).toSeq
    assert(b2 == Seq("c"))
    // a third commit touching bucket 0 must keep epoch=0 alive while
    // bucket 2 still references it
    assert(ManifestTable.commitBuckets(rows(3 -> "A"), dir) == 2L)
    assert(new java.io.File(dir, "epoch=0").exists(),
      "epoch 0 still referenced by bucket 2's entry — GC must keep it")
    val snap2 = ManifestTable.readBucketed(spark, dir, null)
      .select("k", "v").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(snap2 == Map(3 -> "A", 4 -> "B", 2 -> "c"))
  }

  test("mergeBatchBucketed matches mergeBatch on both protocols") {
    val base = tmp()
    def batch(rows: Seq[(String, String, Double)]) =
      rows.toDF("coin_id", "d", "price_usd")
        .select(col("coin_id"), col("d").cast("date").as("fetch_date"), col("price_usd"))
    // keys collide across batches (late wins) and span two buckets
    val batches = Seq(
      batch(Seq(("btc", "2024-01-03", 10.0), ("eth", "2024-01-05", 5.0))),
      batch(Seq(("btc", "2024-01-03", 12.0), ("btc", "2024-02-01", 20.0))),
      batch(Seq(("eth", "2024-01-09", 4.0), ("eth", "2024-01-05", 7.0))))
    val tb = pmod(hash(col("coin_id")), lit(4))
    val rb = pmod(hash(col("coin_id")), lit(4))
    batches.foreach(b =>
      IncrementalRollup.mergeBatch(spark, b, s"$base/rp/table", s"$base/rp/rollup"))
    batches.foreach(b =>
      IncrementalRollup.mergeBatchBucketed(
        spark, b, s"$base/bk/table", s"$base/bk/rollup", tb, rb))
    batches.foreach(b =>
      IncrementalRollup.mergeBatchBucketed(
        spark, b, s"$base/bm/table", s"$base/bm/rollup", tb, rb, manifest = true))
    val rp = spark.read.parquet(s"$base/rp/rollup")
      .select("coin_id", "year", "month", "min_price_usd", "max_price_usd")
      .orderBy("coin_id", "year", "month").collect().toSeq
    val bk = spark.read.parquet(s"$base/bk/rollup")
      .select("coin_id", "year", "month", "min_price_usd", "max_price_usd")
      .orderBy("coin_id", "year", "month").collect().toSeq
    val bm = graft.streaming.ManifestTable.readBucketed(spark, s"$base/bm/rollup", null)
      .select("coin_id", "year", "month", "min_price_usd", "max_price_usd")
      .orderBy("coin_id", "year", "month").collect().toSeq
    assert(rp == bk, s"rename-pair bucketed diverges:\n$rp\n$bk")
    assert(rp == bm, s"bucket-manifest diverges:\n$rp\n$bm")
    // and the bucketed table dirs really are bucket-partitioned
    val bkDirs = new java.io.File(s"$base/bk/table").listFiles()
      .map(_.getName).filter(_.startsWith("gbucket=")).toSeq
    assert(bkDirs.nonEmpty, "rename-pair table should hold gbucket=K dirs")
  }
}
