package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-standard clustering + evaluation — the reference's OracleClustering
  * (`common/dedupe/clustering/OracleClustering.java:56-101`: look up each
  * record's cluster in a supplied gold partition) as distributed operators.
  */
object OracleClustering {

  /** Assignment from a gold table (id -> gold cluster id); records absent
    * from the gold become singletons, mirroring the reference's fallback of
    * an unknown record to its own cluster.
    */
  def assign(records: DataFrame, idCol: String, gold: DataFrame): DataFrame = {
    val Seq(gi, gc) = gold.columns.toSeq.take(2)
    records.select(col(idCol).as("id"))
      .join(gold.select(col(gi).as("_gid"), col(gc).as("_gcluster")),
        col("id") === col("_gid"), "left")
      .select(col("id"), coalesce(col("_gcluster"), col("id")).as("cluster_id"))
  }

  /** Pairwise precision/recall of an assignment against a gold partition —
    * the evaluation the reference's oracle tests perform, order-insensitive
    * (SURVEY.md §7.5 risk 1: parity is defined on partitions/pair sets, not
    * ids). Intra-cluster pairs are materialized via a self-join per side;
    * quadratic per cluster, so this is an EVALUATION operator — cap cluster
    * sizes upstream if the gold contains giant components.
    *
    * @return one row: (n_pairs_got, n_pairs_gold, tp, precision, recall)
    */
  def pairMetrics(assign: DataFrame, gold: DataFrame): DataFrame = {
    def pairsOf(df: DataFrame): DataFrame = {
      val Seq(i, c) = df.columns.toSeq.take(2)
      val a = df.select(col(i).as("id1"), col(c).as("_c"))
      val b = df.select(col(i).as("id2"), col(c).as("_c"))
      a.join(b, Seq("_c")).where(col("id1") < col("id2")).select(col("id1"), col("id2"))
    }
    val got = pairsOf(assign)
    val gld = pairsOf(gold)
    val tp = got.join(gld, Seq("id1", "id2")).count()
    val nGot = got.count()
    val nGold = gld.count()
    val spark = assign.sparkSession
    import spark.implicits._
    Seq((nGot, nGold, tp,
      if (nGot == 0) 1.0 else tp.toDouble / nGot,
      if (nGold == 0) 1.0 else tp.toDouble / nGold))
      .toDF("n_pairs_got", "n_pairs_gold", "tp", "precision", "recall")
  }
}
