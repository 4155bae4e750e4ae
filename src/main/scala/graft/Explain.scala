package graft

/** Dev tool: `runMain graft.Explain <sfDir> <outDir> <query> [query...]`
  * — runs each registry query and writes the FORMATTED physical plan of
  * its returned frame to `<outDir>/<query>.txt` (plans/r18 evidence
  * files). For orchestration queries (maintenance folds, streams) the
  * returned frame is the report read; the body's job structure is
  * covered by [[Profile]], so the two tools together are the
  * measure-first record guide §1 asks for. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val fn = SparkEntry.queries(name)
        val df = fn(spark, sfDir)
        // materialize once so AQE's final plan exists, then render it
        df.write.format("noop").mode("overwrite").save()
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.txt"), s)
        println(s"[explain] wrote $outDir/$name.txt (${s.length} chars)")
      } catch {
        case e: Throwable => System.err.println(s"[explain] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
