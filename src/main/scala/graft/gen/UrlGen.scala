package graft.gen

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic URL table for the `dd_url` canonicalize-and-dedup
  * operator. Rows come in planted duplicate groups: a base URL plus noisy
  * variants that must canonicalize to the SAME string (case-shuffled
  * scheme/host, `www.` prefix, tracking params in shuffled order, session
  * ids, fragments, trailing slashes) and decoys that must NOT (a real query
  * param difference, a different path). All hosts are under example.com/.org
  * (RFC 2606 reserved), so nothing resembles a real site.
  *
  * gold_canonical carries the generator's intended canonical string — unit
  * tests assert the operator recovers it exactly; the DuckDB oracle
  * re-canonicalizes from scratch in SQL.
  */
object UrlGen {

  final case class UrlRow(url_id: Long, url: String, gold_canonical: String)

  private val hosts = Array("alpha.example.com", "beta.example.org",
    "gamma.example.com", "delta.example.org", "epsilon.example.com")
  private val paths = Array("news/story", "docs/guide", "shop/item",
    "blog/post", "wiki/page", "data/set")

  private def mix(seed: Long, i: Long, salt: Long): Long = ImageGen.mix(seed, i, salt)
  private def pick[T](arr: Array[T], seed: Long, i: Long, salt: Long): T =
    arr(java.lang.Math.floorMod(mix(seed, i, salt), arr.length.toLong).toInt)

  /** The clean base URL of group g: lowercase, no junk, params sorted. */
  def base(seed: Long, g: Long): String = {
    val host = pick(hosts, seed, g, 1)
    val path = pick(paths, seed, g, 2)
    val id = java.lang.Math.floorMod(mix(seed, g, 3), 1000L)
    s"https://$host/$path/$id?lang=en&page=${java.lang.Math.floorMod(mix(seed, g, 4), 9L) + 1}"
  }

  private def caseShuffle(s: String, seed: Long, i: Long): String =
    s.zipWithIndex.map { case (c, j) =>
      if (c.isLetter && (mix(seed, i, 50 + j) & 1) == 0) c.toUpper else c
    }.mkString

  /** Variant v of group g: same canonical form, different surface bytes. */
  def variant(seed: Long, i: Long, b: String): String = {
    val Array(pre, query) = b.split("\\?", 2)
    val scheme = pre.substring(0, pre.indexOf("://"))
    val rest = pre.substring(pre.indexOf("://") + 3)
    val host0 = rest.substring(0, rest.indexOf('/'))
    val path = rest.substring(rest.indexOf('/'))
    val host = (if ((mix(seed, i, 10) & 1) == 0) "www." else "") +
      caseShuffle(host0, seed, i)
    val params = query.split("&").toSeq ++
      (if ((mix(seed, i, 11) & 1) == 0)
        Seq(s"utm_source=feed${java.lang.Math.floorMod(mix(seed, i, 12), 5L)}") else Nil) ++
      (if ((mix(seed, i, 13) & 1) == 0)
        Seq(s"sessionid=${java.lang.Math.floorMod(mix(seed, i, 14), 100000L)}") else Nil) ++
      // a junk redirect param whose VALUE is a full URL — plants a second
      // '?' and '://' inside the query (real crawls do this constantly);
      // canonicalization must split at the FIRST occurrence or this mangles
      (if ((mix(seed, i, 17) & 1) == 0)
        Seq(s"utm_next=https://track.example.org/r?u=${java.lang.Math.floorMod(mix(seed, i, 18), 1000L)}") else Nil)
    val shuffled = params.sortBy(p => mix(seed, i, 20 + p.length))
    val frag = if ((mix(seed, i, 15) & 1) == 0) "#section2" else ""
    val slash = if ((mix(seed, i, 16) & 1) == 0) "/" else ""
    s"${caseShuffle(scheme, seed, i + 7)}://$host$path$slash?${shuffled.mkString("&")}$frag"
  }

  /** Decoy: near the base but canonically DISTINCT — either a different
    * page param, or a KEPT `next=` redirect param carrying a full embedded
    * URL (params stay bytewise-sorted: lang < next < page, so the decoy
    * string is its own canonical form).
    */
  def decoy(seed: Long, i: Long, b: String): String =
    if ((mix(seed, i, 31) & 1) == 0)
      b.replaceFirst("page=", s"next=https://other.example.org/go?x=${
        java.lang.Math.floorMod(mix(seed, i, 32), 1000L)}&page=")
    else
      b.replaceFirst("page=[0-9]+", s"page=${java.lang.Math.floorMod(mix(seed, i, 30), 9L) + 10}")

  /** n rows in groups of 4: the base, two duplicate variants, one decoy. */
  def generate(spark: SparkSession, n: Long, seed: Long = 23L,
               partitions: Int = 8): Dataset[UrlRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val g = i / 4
      val b = base(seed, g)
      i % 4 match {
        case 0 => UrlRow(i, b, b)
        case 3 =>
          val d = decoy(seed, i, b)
          UrlRow(i, d, d)
        case _ => UrlRow(i, variant(seed, i, b), b)
      }
    }
  }
}
