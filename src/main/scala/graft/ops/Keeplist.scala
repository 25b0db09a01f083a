package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster representative election — the OUTPUT stage of a hard-dedup
  * pipeline: given cluster assignments and a per-record quality score,
  * elect one representative per cluster (argmax score, ties to the
  * smallest id) and flag every record keep/drop. This is the decision
  * list a curation pipeline actually materializes (the reference stops at
  * cluster assignments — `TransitiveClosure.java:52-140` — and leaves
  * survivor choice to fusion; at corpus scale the keep-list IS the
  * product, fused or not).
  *
  * Scale shape: the election is an argmin AGGREGATE over a
  * `(-score, id)` struct — partial-combined map-side, so a pathological
  * giant cluster (the n=4M probe produced one) costs one combiner cell
  * per task, never a single-task window over the cluster's rows. The
  * keep-decision join is keyed on cluster_id and reuses the aggregate's
  * partitioning (or broadcasts: reps is one row per cluster).
  */
object Keeplist {

  /** `assign` = (idCol, cluster_id); `scores` = (idCol, scoreCol).
    * Returns (idCol, cluster_id, cluster_size, rep_id, keep, scoreCol).
    * Default elects argMAX score; `argmin = true` elects argMIN (SemDeDup's
    * keep-the-marginal-example policy). Ties always break to the smallest
    * id. Score negation for the argmax case is IEEE sign-flip — exact, so
    * oracle hashes over the returned scoreCol are unaffected.
    */
  def elect(assign: DataFrame, scores: DataFrame, idCol: String,
            scoreCol: String, argmin: Boolean = false): DataFrame = {
    val scored = assign.join(scores, Seq(idCol))
    val ordKey = if (argmin) col(scoreCol) else -col(scoreCol)
    val reps = scored.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        min(struct(ordKey.as("s"), col(idCol).as("i"))).as("_f"))
      .select(col("cluster_id"), col("cluster_size"), col("_f.i").as("rep_id"))
    scored.join(reps, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        col("rep_id"), (col(idCol) === col("rep_id")).as("keep"),
        col(scoreCol))
  }
}
