package graft

/** Scratch profiling main (not part of the driver contract).
  * Usage: runMain graft.Prof <sfDir> <q1,q2,...> — times a warm scan,
  * then each named query twice (cold plan vs warm).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args(1).split(",").toSeq else Seq("ann_ivf", "cc_clusters")
    val spark = Bench.session(8, Bench.dirBytes(dir))
    def t(label: String)(f: => Unit): Unit = {
      val s = System.nanoTime; f
      println(f"PROF $label%-24s ${(System.nanoTime - s) / 1e9}%.2f s")
    }
    t("warm_scan") { spark.read.parquet(dir + "/embeddings.parquet").count() }
    for (n <- names) {
      t(s"${n}_cold") { SparkEntry.queries(n)(spark, dir).count() }
      t(s"${n}_warm") { SparkEntry.queries(n)(spark, dir).count() }
    }
    spark.stop()
  }
}
