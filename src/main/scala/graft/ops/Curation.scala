package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-training corpus curation filters — the LAION-style keep/drop gate a
  * multimodal pipeline runs BEFORE dedup spends anything on a row (ref
  * analog: the reference classifies every candidate pair it is given,
  * `core/src/main/java/com/bakdata/dedupe/classifier/Classifier.java:30-38`;
  * a web-scale pipeline first shrinks the candidate universe with per-row
  * gates).
  *
  * Every rule is a pure Column predicate over already-materialized metadata
  * (decoded dims + caption) — a narrow map stage with zero shuffles, fully
  * inside whole-stage codegen, so it composes with any upstream scan and
  * pushes through to the parquet reader when the inputs are stored columns.
  * Aspect-ratio and resolution checks use integer cross-multiplication
  * (never a double division) so the DuckDB oracle reproduces them exactly.
  */
object Curation {

  /** Per-image keep/drop decision with the first failing rule as the
    * drop reason. Input must carry (w, h, caption); emits n_px,
    * n_cap_words, keep, drop_reason.
    *
    * Rules, in precedence order (first failure wins the reason):
    *  - `low_res`:  w*h < minPx
    *  - `aspect`:   max(w,h)/min(w,h) > aspectN/aspectD
    *                (checked as max*aspectD > min*aspectN — integer-exact)
    *  - `caption`:  whitespace-token count outside [minWords, maxWords]
    */
  def imageFilter(
      images: DataFrame,
      minPx: Long,
      aspectN: Int, aspectD: Int,
      minWords: Int, maxWords: Int): DataFrame = {
    val nPx = col("w").cast("long") * col("h")
    // captions are single-space separated; split(' ') matches the oracle's
    // string_split — empty caption yields one empty token, counted 1
    val nWords = size(split(col("caption"), " "))
    val lowRes = nPx < minPx
    val badAspect =
      greatest(col("w"), col("h")) * lit(aspectD) >
        least(col("w"), col("h")) * lit(aspectN)
    val badCaption = nWords < minWords || nWords > maxWords
    images
      .withColumn("n_px", nPx)
      .withColumn("n_cap_words", nWords)
      .withColumn("keep", !lowRes && !badAspect && !badCaption)
      .withColumn("drop_reason",
        when(lowRes, "low_res")
          .when(badAspect, "aspect")
          .when(badCaption, "caption")
          .otherwise("ok"))
  }

  /** SQL mirror of [[imageFilter]]'s computed columns for a relation
    * exposing (w, h, caption) — kept next to the operator so the two rule
    * sets cannot drift independently.
    */
  def imageFilterSql(
      minPx: Long,
      aspectN: Int, aspectD: Int,
      minWords: Int, maxWords: Int): String = {
    val nw = "len(string_split(caption, ' '))"
    s"""CAST(w AS BIGINT) * h AS n_px,
  $nw AS n_cap_words,
  (CAST(w AS BIGINT) * h >= $minPx
    AND greatest(w, h) * $aspectD <= least(w, h) * $aspectN
    AND $nw BETWEEN $minWords AND $maxWords) AS keep,
  CASE WHEN CAST(w AS BIGINT) * h < $minPx THEN 'low_res'
       WHEN greatest(w, h) * $aspectD > least(w, h) * $aspectN THEN 'aspect'
       WHEN $nw < $minWords OR $nw > $maxWords THEN 'caption'
       ELSE 'ok' END AS drop_reason"""
  }
}
