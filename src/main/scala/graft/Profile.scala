package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: `runMain graft.Profile <queryName> [sfDir] [runs]` — runs a
  * registry query with a listener that records every Spark JOB (wall
  * time, stage/task counts) and prints a per-job table for the LAST
  * run. At bench scale (sf0.1 ~ 17 MB) queries are dominated by fixed
  * per-job overhead, so the job log — not the plan — is where the time
  * goes; this is the measurement tool guide §1 asks for, adapted to a
  * many-tiny-jobs workload. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val nRuns = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.local()
    val fn = SparkEntry.queries(name)

    case class JobRec(id: Int, desc: String, start: Long, var end: Long = -1,
                      var stages: Int = 0, var tasks: Int = 0)
    val jobs = new scala.collection.concurrent.TrieMap[Int, JobRec]
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, desc, e.time))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val sid = e.stageInfo.stageId
        jobs.values.find(_.end < 0).foreach { j => // best-effort attach
          j.stages += 1; j.tasks += e.stageInfo.numTasks
        }
        val _ = sid
      }
    }

    // warm runs first (uncounted) so JIT + page cache settle
    (1 until nRuns).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name warm$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // let listener events drain

    val recs = order.toArray(Array.empty[Integer]).map(i => jobs(i))
    val lines = new StringBuilder
    lines ++= f"[profile] $name measured: $wall%.2f s, ${recs.length} jobs\n"
    var prevEnd = -1L
    recs.foreach { j =>
      val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
      val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
      prevEnd = if (j.end > 0) j.end else prevEnd
      lines ++= f"  job ${j.id}%4d ${dur}%7.3f s  gap ${gap}%7.3f s  stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(110)}\n"
    }
    val gapSum = {
      var s = 0.0; var pe = -1L
      recs.foreach { j =>
        if (pe > 0 && j.start > pe) s += (j.start - pe) / 1e3
        if (j.end > 0) pe = j.end
      }
      s
    }
    val jobSum = recs.map(j => if (j.end > 0) (j.end - j.start) / 1e3 else 0.0).sum
    lines ++= f"[profile] job time $jobSum%.2f s, inter-job driver gaps $gapSum%.2f s\n"
    print(lines)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/graft_profile_$name.txt"), lines.toString)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
