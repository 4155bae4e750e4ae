package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ScaleGen is the audit's INSTRUMENT — if it is not deterministic, the
  * SCALING.md ratios are not reproducible and the planted-structure
  * guarantees (dup clusters, near-dup vector pairs) that the dedup/ANN
  * queries rely on are not pinned. Two generations of the same (dir,
  * mult) must be byte-equivalent in content, and the planted structure
  * must be present at the documented rates. */
class ScaleGenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val (dirA, dirB) = {
    val base = Files.createTempDirectory("graft_scalegen_").toString
    ScaleGen.generate(spark, s"$base/a", 1)
    ScaleGen.generate(spark, s"$base/b", 1)
    (s"$base/a", s"$base/b")
  }

  /** Order-free content checksum of a whole table. */
  private def checksum(dir: String, table: String): (Long, Long) = {
    val df = spark.read.parquet(s"$dir/$table.parquet")
    val row = df
      .select(crc32(to_json(struct(df.columns.map(col): _*))).as("c"))
      .agg(count(lit(1)), sum(col("c")))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  test("two generations of the same (mult) are content-identical") {
    Tables.all.foreach { t =>
      val a = checksum(dirA, t)
      val b = checksum(dirB, t)
      assert(a == b, s"table $t: $a vs $b")
      assert(a._1 > 0, s"table $t must not be empty")
    }
  }

  test("planted structure: doc dup clusters and near-dup vector pairs " +
      "at the documented rates") {
    // documents: id%17==9 is an exact copy of its cluster base; id%17==3
    // is a near-dup (two extra words)
    val docs = spark.read.parquet(s"$dirA/documents.parquet")
    val exactDupGroups = docs.groupBy("text").count()
      .where(col("count") > 1).count()
    assert(exactDupGroups >= (5000 / 17) * 9 / 10,
      s"~1 exact-dup group per 17 docs expected, got $exactDupGroups")
    // embeddings: id%23==5 copies id-5 with a ~1% perturbation -> the
    // pair's cosine must exceed the q55 threshold while random pairs
    // stay far below it
    val emb = spark.read.parquet(s"$dirA/embeddings.parquet")
    val dot = expr(
      "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0.0 as double), (acc, v) -> acc + v)")
    val pairs = emb.where(pmod(col("vec_id"), lit(23)) === 5)
      .select(col("vec_id"), col("embedding").as("a"))
      .join(emb.select((col("vec_id") + 5).as("vec_id"),
        col("embedding").as("b")), Seq("vec_id"))
      .select((dot / (sqrt(expr(
        "aggregate(transform(a, x -> cast(x as double) * x), cast(0.0 as double), (acc, v) -> acc + v)")) *
        sqrt(expr(
          "aggregate(transform(b, x -> cast(x as double) * x), cast(0.0 as double), (acc, v) -> acc + v)"))))
        .as("cos"))
    val stats = pairs.agg(count(lit(1)), min(col("cos"))).head()
    val wantPairs = (0 until 2000).count(_ % 23 == 5)
    assert(stats.getLong(0) == wantPairs,
      s"one planted pair per 23 vectors ($wantPairs), got ${stats.getLong(0)}")
    assert(stats.getDouble(1) > 0.9,
      s"planted pairs must be near-dups, min cosine ${stats.getDouble(1)}")
  }
}
