package graft.tools

/** Dev probe: repeat the timed pipeline in one JVM to separate JIT/codegen
  * warmup from steady-state wall time.
  */
object RepeatRun {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(16)
    val n = args.lift(1).getOrElse("60000")
    val s = graft.Bench.session(cores, 0L)

    // job accounting: how much of the wall clock is covered by running jobs
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobWall = new java.util.concurrent.atomic.AtomicLong // ns, sum of job durations
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        Option(starts.remove(j.jobId)).foreach(t0 => jobWall.addAndGet(System.nanoTime() - t0))
      }
    })
    // per-stage task-time skew: (numTasks, sumTaskMs, maxTaskMs, wallMs)
    val stageStats = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long, Long, Long)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val sStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        sStart.put(e.stageInfo.stageId, System.nanoTime())
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = Option(e.taskInfo).map(_.duration).getOrElse(0L)
        stageStats.merge(e.stageId, ("", 1, d, d, 0L),
          (a, b) => (a._1, a._2 + 1, a._3 + d, math.max(a._4, d), a._5))
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val wall = Option(sStart.remove(e.stageInfo.stageId))
          .map(t0 => (System.nanoTime() - t0) / 1000000L).getOrElse(0L)
        stageStats.merge(e.stageInfo.stageId, (e.stageInfo.name.take(60), 0, 0L, 0L, wall),
          (a, b) => (if (b._1.nonEmpty) b._1 else a._1, a._2, a._3, a._4, math.max(a._5, b._5)))
      }
    })
    val sites = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val st = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        if (sys.env.contains("GRAFT_JOB_DEBUG")) {
          val sts = j.stageInfos.map(s => s"${s.name.takeWhile(_ != '(').trim}:${s.numTasks}").mkString(" | ")
          System.err.println(s"[job ${j.jobId}] stages=${j.stageInfos.size} $sts")
        }
        st.put(j.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(st.remove(j.jobId)).foreach { case (site, t0) =>
          sites.merge(site, (1, System.nanoTime() - t0),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
    })
    // job timeline: (jobId, startOffsetSec, durSec, site) for gap analysis
    val timeline = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Double, String)]()
    @volatile var tlBase = System.nanoTime()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val st = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        st.put(j.jobId, (System.nanoTime(),
          j.stageInfos.map(_.numTasks).sum + ":" +
            j.stageInfos.lastOption.map(_.name.take(44)).getOrElse("?")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(st.remove(j.jobId)).foreach { case (t0, site) =>
          timeline.add((j.jobId, (t0 - tlBase) / 1e9, (System.nanoTime() - t0) / 1e9, site))
        }
    })
    def t(f: => Any): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def probe(label: String, path: String): Unit = {
      val j0 = jobs.get(); val w0 = jobWall.get()
      timeline.clear(); tlBase = System.nanoTime()
      val sec = t(graft.Bench.pipelineRun(s, path))
      println(f"$label sec=$sec%.1f jobs=${jobs.get() - j0} jobWallSec=${(jobWall.get() - w0) / 1e9}%.1f")
    }
    probe("warm2000", "/tmp/graft_bench_input_2000")
    sites.clear()
    for (i <- 1 to 3) probe(s"run$i", s"/tmp/graft_bench_input_$n")
    import scala.jdk.CollectionConverters._
    sites.asScala.toSeq.sortBy(-_._2._2).foreach { case (site, (c, ns)) =>
      println(f"[site] $site%-40s n=$c wall=${ns / 1e9}%.1f")
    }
    stageStats.asScala.toSeq.sortBy(-_._2._5).take(12).foreach {
      case (id, (name, nt, sum, mx, wall)) =>
        println(f"[stage $id] wall=${wall / 1000.0}%6.1f tasks=$nt sumTask=${sum / 1000.0}%7.1f maxTask=${mx / 1000.0}%6.1f  $name")
    }
    // timeline of the LAST run: gaps between a job's end and the next
    // job's start are driver-side time (planning, codegen, collect)
    val tl = timeline.asScala.toSeq.sortBy(_._2)
    var prevEnd = 0.0
    tl.foreach { case (id, start, dur, site) =>
      val gap = start - prevEnd
      println(f"[tl] job=$id%3d start=$start%7.2f dur=$dur%6.2f gap=${math.max(gap, 0)}%6.2f  $site")
      prevEnd = math.max(prevEnd, start + dur)
    }
    s.stop()
  }
}
