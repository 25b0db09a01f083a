package graft.tools

/** Dev tool: materialize the deterministic bench input at a given n. */
object GenInput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(240000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = graft.Bench.session(cores)
    val t0 = System.nanoTime()
    graft.Bench.ensureInput(spark, n)
    println(f"[gen] n=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
