package graft

/** Dev tool: `runMain graft.Explain <queryName> [sfDir]` — prints the
  * formatted physical plan and two timed noop-sink runs (cold + warm). */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val nRuns = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.local()
    val fn = SparkEntry.queries(name)
    val df = fn(spark, sfDir)
    df.explain("formatted")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/graft_plan_$name.txt"),
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    catch { case _: Throwable => () }
    val lines = (1 to nRuns).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val msg = f"[explain] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s"
      println(msg)
      msg
    }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/graft_explain_last.txt"), lines.mkString("\n"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
