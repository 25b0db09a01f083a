package graft.tools

import org.apache.spark.sql.functions._

import graft.sig.Signatures

/** Dev probe: which part of the feature projection fails to scale. */
object FeatProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(16)
    val n = args.lift(1).getOrElse("60000")
    val spark = graft.Bench.session(cores)
    val images = spark.read.parquet(s"/tmp/graft_bench_input_$n")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[feat] $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (rep <- 1 to 2) {
      println(s"-- rep $rep")
      t("scan-only")(images.select(count(lit(1))).head())
      t("md5-bytes")(images.select(md5(col("bytes"))).select(count(col("*"))).head())
      val norm = Signatures.normalizeCol(col("caption"))
      t("normalize")(images.select(norm.as("n")).select(sum(length(col("n")))).head())
      t("shingle-hash")(images.select(norm.as("n"))
        .select(Signatures.hashedShinglesCol(col("n"), 5).as("a"))
        .select(sum(size(col("a")))).head())
      t("simhash")(images.select(norm.as("n"))
        .select(Signatures.simHashFastCol(col("n"), 60).as("s"))
        .select(count(when(col("s") > 0L, 1))).head())
      t("full-features") {
        val f = graft.app.Pipeline.features(images, graft.model.DedupConfig())
        f.select(count(lit(1))).head()
      }
      t("features+persist") {
        val f = graft.app.Pipeline.features(images, graft.model.DedupConfig())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.count()
        f.unpersist(false)
      }
    }
    spark.stop()
  }
}
