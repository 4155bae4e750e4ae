package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    // Warm-up (uncounted): touch every table's footer/pages, then run the
    // ENTIRE suite once so every codepath gets its C2 JIT compilation
    // before measurement. Warming everything (rather than a hand-picked
    // subset) keeps the measured numbers defensible: no query is
    // advantaged over another.
    try Tables.all.foreach(t => Tables.df(spark, sfDir, t).count())
    catch { case e: Throwable => System.err.println(s"[bench] table warm-up failed: $e") }
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] warm-up $name failed: $e") }
    }
    var errors = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full materialization of every operator (a bare count()
      // would let Catalyst prune windows/projections out of the plan).
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            errors ::= name
            false
        }
      // A failed query must be distinguishable from a fast one: -1, and
      // it is excluded from the total.
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // Side-channel copy for local tooling (driver reads stdout).
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/graft_bench_last.json"), line)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
