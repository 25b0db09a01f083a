package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sig.Signatures

/** The operator catalog: every SURVEY.md §2 operator (and the training-data
  * extensions) exposed as a named query over the driver's parquet tables,
  * plus its exactly-equivalent DuckDB oracle SQL.
  */
object Queries {

  import SparkEntry.table

  // ------------------------------------------------------------ helpers

  /** Normalized text + distinct word-3-gram shingles of documents.text —
    * the blocking/verify unit shared by several queries.
    */
  private def docNorm(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), Signatures.normalizeCol(col("text")).as("norm"))

  /** DuckDB CTE producing the same (doc_id, norm). */
  private val docNormSql: String =
    s"SELECT doc_id, ${Signatures.normalizeSql("text")} AS norm FROM documents"

  // ------------------------------------------------------------ queries

  /** Exact deduplication by full-content hash (hash-groupBy; SURVEY.md
    * training-data extension "exact dedup"). Scales: one shuffle on a
    * 128-bit key, no payload movement.
    */
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("rep_id"))

  private val ddExactSql =
    """SELECT md5(text) AS content_hash, count(*) AS n_copies,
       min(doc_id) AS rep_id FROM documents GROUP BY 1"""

  /** Token counting + basic quality stats (training-data extension).
    * Whitespace tokens over raw text; normalized char count.
    */
  def taTokens(spark: SparkSession, dir: String): DataFrame = {
    val norm = Signatures.normalizeCol(col("text"))
    table(spark, dir, "documents").select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens"),
      length(norm).as("n_chars_norm"),
      length(col("text")).as("n_chars_raw"))
  }

  private val taTokensSql =
    s"""SELECT doc_id,
        len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
        length(${Signatures.normalizeSql("text")}) AS n_chars_norm,
        length(text) AS n_chars_raw
        FROM documents"""

  /** TPC-H-style pricing-summary aggregation (generic agg/groupBy surface;
    * bench headline). Integer-exact outputs only, to keep the hash compare
    * stable: quantities are integral doubles.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       count(*) AS n_rows,
       count(DISTINCT l_orderkey) AS n_orders
       FROM lineitem GROUP BY 1, 2"""

  /** Placeholder flagship: replaced by the full pipeline as stages land. */
  def pipelineClusters(spark: SparkSession, dir: String): DataFrame =
    ddExact(spark, dir).select(col("rep_id").as("cluster_id"), col("n_copies"))

  // ------------------------------------------------------------ registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> (ddExact _),
    "ta_tokens" -> (taTokens _),
    "q1_agg" -> (q1Agg _))

  val oracles: Map[String, String] = Map(
    "dd_exact" -> ddExactSql,
    "ta_tokens" -> taTokensSql,
    "q1_agg" -> q1AggSql)
}
