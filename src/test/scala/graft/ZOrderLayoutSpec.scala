package graft

import java.nio.file.Files

import graft.operators.ZOrderLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Z-order WRITE path must buy planning-time file skipping on BOTH
  * dimensions. Both layouts (Morton vs lexicographic-by-px) are written
  * with the identical machinery (range shuffle + manifest), so the only
  * variable is the clustering key — then the same manifest pruning is
  * measured under single-dimension and 2-D predicates.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val nFiles = 16

  private lazy val (zDir, lexDir) = {
    val root = Files.createTempDirectory("graft_zorder_").toString
    // dimensions chosen to actually SPAN [0,256) at sf0.001: partkey
    // covers 0..199 and orderkey%256 covers 0..255 (suppkey only 0..9)
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .selectExpr("l_orderkey", "l_partkey % 256 as px", "l_orderkey % 256 as sx")
    ZOrderLayout.write(df, "px", "sx", s"$root/z", nFiles)
    ZOrderLayout.writeClustered(df, col("px") * 256 + col("sx"),
      "px", "sx", s"$root/lex", nFiles)
    (s"$root/z", s"$root/lex")
  }

  private def nSelected(dir: String, aMin: Long, aMax: Long,
                        bMin: Long, bMax: Long): Int =
    ZOrderLayout.selectFiles(spark, dir, aMin, aMax, bMin, bMax).size

  test("manifest has one row per file with sane spans") {
    val mf = spark.read.parquet(s"$zDir/_zorder_manifest").collect()
    // range partitioning samples boundaries, so a file or two may come up
    // empty (and unwritten) — but most of the nFiles budget must exist
    assert(mf.length >= nFiles / 2 && mf.length <= nFiles)
    mf.foreach { r =>
      assert(r.getAs[Long]("min_a") <= r.getAs[Long]("max_a"))
      assert(r.getAs[Long]("min_b") <= r.getAs[Long]("max_b"))
      assert(r.getAs[Long]("n_rows") > 0L)
    }
  }

  test("sx-only predicate: Z-order prunes files, lexicographic reads ALL") {
    // lexicographic-by-px files each span the full sx range -> zero pruning
    val lexTotal = spark.read.parquet(s"$lexDir/_zorder_manifest").count()
    val lex = nSelected(lexDir, 0, 255, 64, 79)
    val z = nSelected(zDir, 0, 255, 64, 79)
    assert(lex.toLong == lexTotal, s"lex layout must read all $lexTotal files, got $lex")
    assert(z <= nFiles / 2, s"Z-order must prune the sx predicate, read $z")
  }

  test("2-D predicate: Z-order reads a small fraction of files") {
    val z = nSelected(zDir, 64, 79, 64, 79)
    assert(z <= nFiles / 2, s"Z-order 2-D box read $z of $nFiles files")
  }

  test("px-only predicate: both layouts prune (lex is the specialist)") {
    val lex = nSelected(lexDir, 64, 79, 0, 255)
    val z = nSelected(zDir, 64, 79, 0, 255)
    val zTotal = spark.read.parquet(s"$zDir/_zorder_manifest").count()
    assert(lex <= nFiles / 2, s"px-sorted lex layout must prune hard, read $lex")
    // the Z path's exact file count depends on repartitionByRange's
    // SAMPLED cuts (±1-2 files run to run — the sampler nondeterminism
    // PLANS.md documents), so assert the stable properties instead of a
    // hard cap: Z prunes something, and lex is the px specialist
    assert(z < zTotal, s"Z-order must prune a px-only predicate, read $z/$zTotal")
    assert(lex <= z, s"lex ($lex files) must be at least as good as Z ($z) on px")
  }

  test("manifest-pruned scan returns exactly the full-scan rows") {
    for (dir <- Seq(zDir, lexDir)) {
      val pruned = ZOrderLayout.scan(spark, dir, "px", "sx", 64, 79, 64, 79)
        .select("l_orderkey", "px", "sx")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val full = spark.read.parquet(dir)
        .where(col("px").between(64, 79) && col("sx").between(64, 79))
        .select("l_orderkey", "px", "sx")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(pruned == full, s"layout $dir: pruned scan diverged")
    }
  }

  test("empty query box plans zero files and returns an empty frame") {
    // px/sx are < 256, so a box above that intersects no manifest entry
    assert(nSelected(zDir, 300, 310, 300, 310) == 0)
    assert(ZOrderLayout.scan(spark, zDir, "px", "sx", 300, 310, 300, 310).count() == 0L)
  }
}
