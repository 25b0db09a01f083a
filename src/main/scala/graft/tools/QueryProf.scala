package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** One-query stage profiler: runs a single catalog query with a listener
  * accumulating per-stage executor run/CPU time. Usage:
  *   runMain graft.tools.QueryProf <query> <sfDir>
  */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Bench.session(32, 0L)
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val runMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
    val cpuNs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
    val tasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
    def adder(m: java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder], k: Int) =
      m.computeIfAbsent(k, _ => new java.util.concurrent.atomic.LongAdder)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          adder(runMs, te.stageId).add(m.executorRunTime)
          adder(cpuNs, te.stageId).add(m.executorCpuTime)
          adder(tasks, te.stageId).increment()
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        names.put(sc.stageInfo.stageId, sc.stageInfo.name.takeWhile(_ != '\n').take(70))
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(700)
    import scala.jdk.CollectionConverters._
    val rows = runMs.keySet.asScala.toSeq.map { id =>
      (id, names.getOrDefault(id, "?"), runMs.get(id).sum / 1e3, cpuNs.get(id).sum / 1e9,
        tasks.get(id).sum)
    }.sortBy(-_._3).take(15)
    println(f"[qprof] $name rows=$n wall=$wall%.2f")
    rows.foreach { case (id, nm, run, cpu, t) =>
      println(f"[qprof] $id%4d $nm%-70s run=$run%7.1f cpu=$cpu%7.1f tasks=$t%4d")
    }
    spark.stop()
    sys.exit(0)
  }
}
