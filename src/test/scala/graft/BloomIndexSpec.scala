package graft

import graft.operators.BloomIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** BloomIndex: exactness of sketch-planned point lookups, actual file
  * skipping on a non-clustered key, and empty-result behavior. */
class BloomIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def layout(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("graft_bloomidx_").toString + "/t"
    // laid out by group (scan locality), looked up by id (scattered)
    val df = (0L until 4000L).map(i => (i, s"g${i % 8}", s"payload_$i"))
      .toDF("id", "grp", "payload")
    BloomIndex.write(df, "grp", "id", dir, nFiles = 16,
      expectedPerFile = 1000L, fpp = 0.01)
    (dir, df)
  }

  test("lookup equals a plain filter and actually skips files") {
    val (dir, df) = layout()
    val keys = Seq("7", "1234", "3999")
    val got = BloomIndex.lookup(spark, dir, "id", keys)
      .select("id", "grp", "payload").collect().toSet
    val want = df.where(col("id").cast("string").isin(keys: _*))
      .collect().toSet
    assert(got == want, "sketch-planned lookup must be exact")
    val planned = BloomIndex.selectFiles(spark, dir, keys)
    val total = BloomIndex.index(spark, dir).count()
    assert(planned.size < total,
      s"expected skipping: planned ${planned.size} of $total files")
    assert(planned.nonEmpty, "keys exist, so their files must be planned")
  }

  test("absent key returns empty without a full scan") {
    val (dir, _) = layout()
    val keys = Seq("definitely_absent_key")
    val planned = BloomIndex.selectFiles(spark, dir, keys)
    val total = BloomIndex.index(spark, dir).count()
    // fpp 0.01 over 16 files: a handful of false positives at most
    assert(planned.size < total, s"absent key planned ${planned.size}/$total")
    assert(BloomIndex.lookup(spark, dir, "id", keys).count() == 0L)
  }

  test("index has one row per data file") {
    val (dir, _) = layout()
    val files = spark.read.parquet(dir)
      .select(col("_metadata.file_path")).distinct().count()
    assert(BloomIndex.index(spark, dir).count() == files)
  }
}
