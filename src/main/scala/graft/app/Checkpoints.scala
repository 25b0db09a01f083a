package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage checkpointing with lineage + metrics — the resumability story
  * of the north_rule. Each stage writes its output as a parquet table (the
  * sandbox stand-in for an Iceberg table; swap `parquet` for
  * `writeTo(...).append()` on a real catalog) plus a `_metrics.json`
  * sidecar carrying row counts per partition (lineage: which partition of
  * which stage produced how many rows) and stage wall time.
  *
  * `stage(name)(compute)` is skip-if-complete: a re-run after a crash
  * resumes from the last completed stage — no recomputation of finished
  * work (verified by CheckpointSpec).
  */
final class Checkpoints(spark: SparkSession, workDir: String) {

  private def path(name: String) = s"$workDir/$name"
  private def metricsPath(name: String) = s"$workDir/${name}_metrics.json"

  def isComplete(name: String): Boolean =
    Files.exists(Paths.get(path(name), "_SUCCESS"))

  /** Compute-or-load a stage. On compute: write parquet + metrics sidecar
    * with per-partition row counts (spark_partition_id lineage) and wall
    * time. On resume: read the parquet back (fresh lineage, no upstream
    * recompute).
    */
  def stage(name: String)(compute: => DataFrame): DataFrame = {
    if (!isComplete(name)) {
      val t0 = System.nanoTime()
      val df = compute
      df.write.mode("overwrite").parquet(path(name))
      val wallSec = (System.nanoTime() - t0) / 1e9
      val perPart = spark.read.parquet(path(name))
        .groupBy(spark_partition_id().as("partition"))
        .agg(count(lit(1)).as("rows"))
        .orderBy("partition")
        .collect()
        .map(r => s"""{"partition":${r.getInt(0)},"rows":${r.getLong(1)}}""")
        .mkString("[", ",", "]")
      val total = spark.read.parquet(path(name)).count()
      Files.createDirectories(Paths.get(workDir))
      Files.writeString(Paths.get(metricsPath(name)),
        s"""{"stage":"$name","rows":$total,"wall_sec":$wallSec,"partitions":$perPart}""")
    }
    spark.read.parquet(path(name))
  }

  def metrics(name: String): Option[String] =
    if (Files.exists(Paths.get(metricsPath(name)))) Some(Files.readString(Paths.get(metricsPath(name))))
    else None
}

object Checkpoints {

  /** Full pipeline with per-stage checkpoints: resumable end-to-end run.
    * Stages: features, candidates, scored, assign0, assign, canonical.
    */
  def runCheckpointed(spark: SparkSession, images: DataFrame, workDir: String,
                      cfg: graft.model.DedupConfig): DataFrame = {
    import spark.implicits._
    val cp = new Checkpoints(spark, workDir)
    val feats = cp.stage("01_features")(Pipeline.features(images, cfg))
    val cands = cp.stage("02_candidates")(Pipeline.candidates(feats, cfg))
    val scoredDf = cp.stage("03_scored") {
      Pipeline.classified(feats, cands, cfg).toDF()
    }
    val scored = scoredDf.as[Pipeline.ScoredEdge]
    val assign0 = cp.stage("04_assign_tc")(Pipeline.cluster(feats, scored))
    val assign = cp.stage("05_assign_refined")(Pipeline.refine(assign0, feats, scored, cfg))
    val slim = images.select(col("image_id"), col("caption"), col("fmt"),
      col("w"), col("h"), col("phash"))
    cp.stage("06_canonical")(Pipeline.fuse(slim, assign).toDF())
  }
}
