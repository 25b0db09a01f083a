package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.app.Pipeline
import graft.gen.ImageGen
import graft.model.DedupConfig

/** Stage-by-stage wall-time profile of the pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = graft.Bench.session(cores)
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cfg = DedupConfig()
    val path = t("gen+write") {
      val p = s"/tmp/graft_profile_$n"
      if (!new java.io.File(p, "_SUCCESS").exists())
        ImageGen.asImages(ImageGen.generate(spark, n, 42L, 32)).write.mode("overwrite").parquet(p)
      p
    }
    for (_ <- 1 to reps) runOnce(spark, path, cfg)
    spark.stop()
  }

  private def runOnce(spark: SparkSession, path: String, cfg: DedupConfig): Unit = {
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val images = spark.read.parquet(path)
    val feats = t("features") {
      val f = Pipeline.features(images, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      f.count(); f
    }
    val cands = t("candidates") {
      val c = Pipeline.candidates(feats, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[profile]   candidate pairs: ${c.count()}")
      c
    }
    val scored = t("classify") {
      val s = Pipeline.classified(feats, cands, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[profile]   dup edges: ${s.where($"classification" === "DUPLICATE").count()}")
      s
    }
    val assign0 = t("cc") {
      val a = Pipeline.cluster(feats, scored).persist(StorageLevel.MEMORY_AND_DISK)
      a.count(); a
    }
    val refined = t("refine") {
      val r = Pipeline.refine(assign0, feats, scored, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    t("fuse") {
      val slim = images.select($"image_id", $"caption", $"fmt", $"w", $"h", $"phash")
      println(s"[profile]   clusters: ${Pipeline.fuse(slim, refined).count()}")
    }
    Seq(feats, cands, scored, assign0, refined).foreach(_.unpersist(false))
  }
}
