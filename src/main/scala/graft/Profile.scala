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

    // Catalyst-phase accounting: per-execution planning-phase durations
    // (parsing/analysis/optimization/planning) — the part of the
    // inter-job driver gaps that is query planning rather than FS ops.
    val phaseTotals = new scala.collection.concurrent.TrieMap[String, Long]
    val execSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val qeListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        execSeen.incrementAndGet()
        qe.tracker.phases.foreach { case (ph, summ) =>
          phaseTotals.updateWith(ph) {
            case Some(v) => Some(v + (summ.endTimeMs - summ.startTimeMs))
            case None => Some(summ.endTimeMs - summ.startTimeMs)
          }
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }

    // warm runs first (uncounted) so JIT + page cache settle; walls are
    // kept so the summary can report a min-of-(N-1) over the post-JIT
    // runs — one sample is uninterpretable on this oversubscribed host
    val warmWalls = (1 until nRuns).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name warm$i: $w%.2f s")
      w
    }
    spark.listenerManager.register(qeListener)
    spark.sparkContext.addSparkListener(listener)
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val gc0 = gcMs()

    // Poor-man's gap profiler: while NO job is running, sample every
    // thread's stack and histogram the deepest "interesting" frame —
    // tells us what the driver does between jobs (FS ops, commit
    // protocol, planning, streaming bookkeeping).
    val liveJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        liveJobs.incrementAndGet()
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        liveJobs.decrementAndGet()
    })
    val gapFrames = new scala.collection.concurrent.TrieMap[String, Int]
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (sampling) {
        if (liveJobs.get() == 0) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, frames) =>
            if (t.getState == Thread.State.RUNNABLE &&
                t.getId != Thread.currentThread().getId) {
              val fs = frames.map(f => s"${f.getClassName}.${f.getMethodName}")
              // skip pure-idle stacks (socket polls, park)
              val interesting = fs.exists(f =>
                f.startsWith("org.apache.spark") || f.startsWith("graft") ||
                f.startsWith("org.apache.hadoop") || f.startsWith("java.io") ||
                f.startsWith("java.nio") || f.startsWith("sun.nio"))
              if (interesting) {
                val top = fs.find(f => f.startsWith("org.apache.spark") ||
                    f.startsWith("graft") || f.startsWith("org.apache.hadoop"))
                  .getOrElse(fs.head)
                val key = s"${t.getName.take(28)}: $top"
                gapFrames.updateWith(key) {
                  case Some(v) => Some(v + 1); case None => Some(1) }
              }
            }
          }
        }
        Thread.sleep(20)
      }
    }, "gap-sampler")
    sampling = true
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    spark.sparkContext.removeSparkListener(listener)
    spark.listenerManager.unregister(qeListener)
    Thread.sleep(300) // let listener events drain

    val recs = order.toArray(Array.empty[Integer]).map(i => jobs(i))
    val lines = new StringBuilder
    val postJit = warmWalls.drop(1) :+ wall
    lines ++= f"[profile] $name measured: $wall%.2f s, ${recs.length} jobs" +
      f" (min of ${postJit.length} post-JIT runs: ${postJit.min}%.2f s)\n"
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
    val phases = phaseTotals.toSeq.sortBy(-_._2)
      .map { case (p, ms) => f"$p=${ms / 1e3}%.2f s" }.mkString(", ")
    lines ++= f"[profile] ${execSeen.get()} executions; Catalyst phase totals: $phases\n"
    lines ++= f"[profile] JVM GC during measured run: ${(gcMs() - gc0) / 1e3}%.2f s\n"
    lines ++= "[profile] top gap-time stacks (20 ms samples while no job ran):\n"
    gapFrames.toSeq.sortBy(-_._2).take(25).foreach { case (k, n) =>
      lines ++= f"  $n%4d  $k\n"
    }
    print(lines)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/graft_profile_$name.txt"), lines.toString)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
