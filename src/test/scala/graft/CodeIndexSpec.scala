package graft

import graft.operators.CodeIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** CodeIndex: incrementally-maintained PQ codes equal the one-shot
  * encoding, across replay and compaction (the q109 oracle hashes the
  * full search; this pins the store semantics in isolation). */
class CodeIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("batch-appended codes equal the whole-corpus encoding; replay and compact change nothing") {
    val root = Files.createTempDirectory("graft_codeidx_").toString + "/idx"
    val emb = Tables.embeddings(spark, sfDir)
    (0 to 3).foreach { k =>
      CodeIndex.appendBatch(spark, emb.where(col("vec_id") % 4 === k),
        root, batchId = k)
    }
    def snap() = CodeIndex.codes(spark, root)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val got = snap()
    val oneShot = emb
      .select(col("vec_id").as("cand_id"),
        explode(expr("sequence(0, 7)")).as("sub"), col("embedding"))
      .withColumn("code", expr(CodeIndex.codeExpr))
      .select("cand_id", "sub", "code")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == oneShot, "maintained codes must equal the one-shot encoding")
    assert(got.size == emb.count() * 8)
    // replay of a batch replaces its own delta — no duplicates
    CodeIndex.appendBatch(spark, emb.where(col("vec_id") % 4 === 2),
      root, batchId = 2)
    assert(snap() == oneShot)
    CodeIndex.compact(spark, root)
    assert(snap() == oneShot, "compaction folds without loss")
    // manifest protocol: identical maintained codes through the same
    // replay + mid-replay compact (protocol must be invisible)
    val mroot = Files.createTempDirectory("graft_codeidx_m_").toString + "/idx"
    (0 to 3).foreach { k =>
      CodeIndex.appendBatch(spark, emb.where(col("vec_id") % 4 === k),
        mroot, batchId = k, manifest = true)
      if (k == 1) CodeIndex.compact(spark, mroot, manifest = true)
    }
    assert(CodeIndex.codes(spark, mroot, manifest = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet ==
      oneShot, "commit protocol must not change the maintained codes")
  }
}
