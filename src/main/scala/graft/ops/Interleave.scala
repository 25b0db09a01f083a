package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted source mixing for training-data assembly — the
  * "sample sources in ratio 3:2:1" step of every pretraining recipe, as a
  * stride schedule (Waldspurger & Weihl, OSDI '95 "Stride Scheduling"):
  * document r (1-based rank within its source, ordered by id) gets virtual
  * time `sched_key = r * (L / w_source)` with L = lcm(weights). Reading the
  * corpus in ascending sched_key interleaves sources in exact weight
  * proportion over every prefix — no RNG, no epoch boundary artifacts, and
  * any shard of the schedule is reproducible from (id, source) alone.
  *
  * Scale shape: the per-source rank is [[Packing.prefixSum]] of 1 within
  * the source stratum (two-phase scan: tiny rollup shuffle + broadcast
  * offsets + bucket-partitioned window — NEVER a row_number over a whole
  * source, which would funnel millions of rows through one task), and the
  * sched_key is a row-local integer multiply. Consumers don't need a
  * global sort either: chunk boundaries in sched_key space are computable
  * arithmetically, so shards range-filter and sort locally.
  */
object Interleave {

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
  private def lcm(a: Long, b: Long): Long = a / gcd(a, b) * b

  /** The schedule's virtual-time base L — exposed so oracle SQL derives it
    * from the same fold instead of hardcoding a value.
    */
  def lcmOf(ws: Seq[Long]): Long = ws.reduce(lcm)

  /** @param docs          input with a NUMERIC unique id and a source column
    * @param idCol         unique id ordering documents within a source
    * @param srcCol        source/stratum column (e.g. language, corpus name)
    * @param weights       relative mixing weights per source value
    * @param defaultWeight weight for sources not named in `weights`
    */
  def schedule(docs: DataFrame, idCol: String, srcCol: String,
               weights: Map[String, Long], defaultWeight: Long,
               buckets: Int = 64): DataFrame = {
    require(defaultWeight >= 1 && weights.values.forall(_ >= 1),
      "weights must be positive")
    val l = lcmOf(weights.values.toSeq :+ defaultWeight)
    val stride: Column = weights.foldLeft(
      when(lit(false), lit(0L))) { case (c, (s, w)) =>
        c.when(col(srcCol) === s, lit(l / w))
      }.otherwise(lit(l / defaultWeight))
    Packing.prefixSum(
        docs.select(col(idCol).cast("long").as("doc_id"), col(srcCol)),
        "doc_id", lit(1L), Seq(srcCol), buckets)
      .withColumn("rank_in_src", col("cum_before") + 1L)
      .select(col("doc_id"), col(srcCol),
        col("rank_in_src"), (col("rank_in_src") * stride).as("sched_key"))
  }
}
