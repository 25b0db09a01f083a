package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL-level dedup — the front gate of every
  * web-crawl curation pipeline (the same page arrives under case-shuffled
  * hosts, `www.` prefixes, tracking params, session ids, fragments and
  * trailing slashes; URL-level dedup collapses them before any content
  * fetch or text dedup spends a byte on the copies).
  *
  * Canonical form: lowercase scheme and host (NOT the path — paths are
  * case-sensitive), strip a leading `www.`, drop the fragment, drop a
  * trailing path slash, drop `utm_*` / `sessionid` params, sort the
  * surviving params bytewise. Pure codegen'd string expressions: the
  * canonicalize pass is row-local (zero exchanges) and the dedup one
  * partial-aggregated groupBy — hash-exactly mirrorable in SQL.
  */
object Urls {

  def canonicalize(url: Column): Column =
    // crawl feeds carry junk rows; a scheme-less string is not a URL —
    // yield NULL (dedup drops it) instead of fabricating a "://" key
    when(instr(url, "://") === 0, lit(null).cast("string"))
      .otherwise(canonicalizeWellFormed(url))

  private def canonicalizeWellFormed(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val hasQ = instr(noFrag, "?") > 0
    // split at the FIRST '?' and FIRST '://' — crawl URLs embed full URLs
    // inside query values (?next=https://...), and a last-occurrence split
    // (substring_index(..., -1)) would silently drop the middle query
    // segment and merge distinct URLs (it also diverged from the oracle's
    // strpos-based split)
    val pre = when(hasQ, substring_index(noFrag, "?", 1)).otherwise(noFrag)
    val query = when(hasQ, noFrag.substr(instr(noFrag, "?") + 1, length(noFrag)))
      .otherwise(lit(""))
    val scheme = lower(substring_index(pre, "://", 1))
    val rest = pre.substr(instr(pre, "://") + 3, length(pre))
    val host0 = substring_index(rest, "/", 1)
    val host = regexp_replace(lower(host0), "^www\\.", "")
    val path = regexp_replace(rest.substr(length(host0) + 1, length(rest)), "/$", "")
    val params = filter(split(query, "&"),
      p => !(p.startsWith("utm_") || p.startsWith("sessionid=")) && p =!= "")
    val sortedQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /** One row per canonical URL: occurrence count and the minimum id as the
    * deterministic representative (the row a fetch dedup would keep).
    */
  def dedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(col(idCol), canonicalize(col(urlCol)).as("canonical_url"))
      .where(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_urls"), min(col(idCol)).as("rep_id"))
}
