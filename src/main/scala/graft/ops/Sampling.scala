package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sig.Signatures

/** Deterministic, reproducible sampling for training-data curation.
  *
  * Down-sampling a 100 TB corpus must be (a) a pure map-side filter — no
  * shuffle, no driver state, repeatable across reruns and resumable jobs —
  * and (b) stratified, because corpus curation wants different keep-rates
  * per stratum (language, source, quality band). Both fall out of hashing a
  * stable row key into a fixed bucket space: `bucket = hash60(key) % n`,
  * keep the row iff `bucket < rate(stratum)`. The same hash60 base used by
  * the signature kernels keeps the DuckDB oracle bit-exact.
  *
  * The keep decision is row-local, so the operator composes with scan-level
  * pruning: Catalyst pushes the surviving conjuncts down and the filter
  * rides the parquet scan — zero exchanges at any scale.
  */
object Sampling {

  /** Stable bucket in [0, nBuckets) for a row key. hash60 is uniform over
    * 2^60, so buckets are uniform and `bucket < r` keeps ~r/nBuckets rows.
    */
  def bucketCol(key: Column, nBuckets: Int = 100): Column =
    pmod(Signatures.hash60Col(key), lit(nBuckets))

  /** Deterministic train/val/test split: every row gets exactly one split
    * label from its hash bucket. `fractions` are integer bucket widths out
    * of `nBuckets` (e.g. 90/5/5); the last split absorbs any remainder. The
    * key is salted so the split is statistically independent of any
    * [[stratified]] sampling decision over the same key — a row's keep and
    * split fates must not correlate.
    *
    * Like sampling, this is a pure row-local map (zero exchanges at any
    * scale), and the assignment is stable across reruns, cluster sizes and
    * partitionings — the property a resumable 100 TB curation run needs.
    */
  def split(
      df: DataFrame,
      key: Column,
      fractions: Seq[(String, Int)],
      salt: String = "split",
      nBuckets: Int = 100): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= nBuckets)
    val bucket = bucketCol(concat(lit(s"$salt:"), key.cast("string")), nBuckets)
    val cuts = fractions.map(_._2).scanLeft(0)(_ + _).tail
    val assign = fractions.zip(cuts).init.foldRight(lit(fractions.last._1)) {
      case (((name, _), cut), acc) => when(col("bucket") < cut, name).otherwise(acc)
    }
    df.withColumn("bucket", bucket).withColumn("split", assign)
  }

  /** Per-stratum quota cap: keep at most `k` rows per stratum — the
    * C4/RefinedWeb-style anti-spam step ("no domain/language may contribute
    * more than K documents"), deterministic: survivors are the k lowest
    * ids of each stratum (callers wanting quality-ordered quotas map a
    * quality rank into the id first). Unlike [[stratified]]'s rate
    * sampling, a hard cap needs each row's RANK within its stratum — at
    * scale that is [[Packing.prefixSum]]'s two-phase scan (tiny rollup
    * shuffle + broadcast offsets + bucket-partitioned window), never a
    * whole-stratum single-task window.
    */
  def capPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                    k: Long, buckets: Int = 64): DataFrame = {
    require(k >= 0, s"cap must be >= 0, got $k")
    Packing.prefixSum(df, idCol, lit(1L), Seq(stratumCol), buckets)
      .withColumn("rank_in_stratum", col("cum_before") + 1L)
      .where(col("rank_in_stratum") <= k)
      .drop("cum_before")
  }

  /** Deterministic global shuffle for training-order randomization: every
    * row gets a stable (shard, pos) coordinate — shard = hash60 % nShards,
    * pos = the row's rank within its shard under hash order. Reading shards
    * in order yields a reproducible pseudo-random permutation of the corpus
    * (the "shuffle the training data once, globally" step), stable across
    * reruns, cluster sizes and partitionings.
    *
    * Scale shape: NOT a global sort and NOT a per-shard single-task window
    * — pos comes from [[Packing.prefixSum]]'s two-phase scan (hash-range
    * buckets are near-uniform by construction, the rollup shuffle is
    * O(shards × buckets) rows, offsets broadcast back), so parallelism is
    * shards × buckets regardless of shard count. Rank ties would need two
    * rows of one shard to collide on the salted 60-bit hash
    * (P ≈ n²/2^61 per shard; the rank window tiebreaks on the key itself,
    * mirroring the oracle's `ORDER BY ord, doc_id`, so even a collision
    * orders deterministically).
    */
  def globalShuffle(df: DataFrame, key: Column, nShards: Int = 8,
                    salt: String = "shuf", buckets: Int = 64): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val slim = df
      .withColumn("_ord", Signatures.hash60Col(concat(lit(s"$salt:"), key.cast("string"))))
      .withColumn("shard", pmod(col("_ord"), lit(nShards.toLong)).cast("int"))
    Packing.prefixSum(slim, "_ord", lit(1L), Seq("shard"), buckets, tieCol = Some(key))
      .withColumn("pos", col("cum_before"))
      .drop("_ord", "cum_before")
  }

  /** Length-tier training curriculum (the easy-to-hard ordering of
    * curriculum learning, Bengio et al. ICML 2009, reshaped for corpus
    * emission): documents bucket into token-count TIERS (n_tokens div
    * `tierW`) and are emitted in (tier ascending, seeded shuffle within
    * tier) order — short examples first, deterministic across reruns and
    * partitionings. The within-tier order rides the same two-phase
    * prefix-sum rank as [[globalShuffle]] (hash60 virtual-time key with a
    * doc_id tiebreak mirroring the oracle's `ORDER BY ord, doc_id`, never
    * a global sort); tier offsets are a ≤-#tiers-row driver rollup
    * broadcast back — ds_pack's offset pattern. `global_pos` is the
    * curriculum read order.
    */
  def curriculum(docs: DataFrame, textCol: String, tierW: Int = 16): DataFrame = {
    require(tierW >= 1, s"tier width must be >= 1, got $tierW")
    // qualified: Sampling.split (the train/val/test splitter) shadows it
    val nTok = size(org.apache.spark.sql.functions.split(
      trim(col(textCol)), "\\s+")).cast("long")
    val slim = docs.select(col("doc_id"), nTok.as("n_tokens"))
      // null-text docs have no token count and no tier: exempt from the
      // curriculum (the oracle's tier-offset equi-join drops the NULL
      // tier the same way)
      .where(col("n_tokens").isNotNull)
      .withColumn("tier", (col("n_tokens") / tierW).cast("int"))
      .withColumn("_ord",
        Signatures.hash60Col(concat(lit("cur:"), col("doc_id").cast("string"))))
    val ranked = Packing.prefixSum(slim, "_ord", lit(1L), Seq("tier"), 64,
        tieCol = Some(col("doc_id")))
      .withColumn("pos", col("cum_before")).drop("cum_before", "_ord")
    val sizes = ranked.groupBy(col("tier")).agg(count(lit(1)).as("_n"))
      .collect().sortBy(_.getInt(0))
    var acc = 0L
    val offRows = sizes.toSeq.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = broadcast(offRows.toDF("tier", "_toff"))
    ranked.join(offDf, Seq("tier"))
      .select(col("doc_id"), col("n_tokens"), col("tier"), col("pos"),
        (col("_toff") + col("pos")).as("global_pos"))
  }

  /** Deterministic stratified sample: keep a row iff its hash bucket falls
    * under the keep-rate of its stratum (per-mille-style integer rates out
    * of `nBuckets`). Unknown strata fall back to `defaultRate`.
    */
  def stratified(
      df: DataFrame,
      key: Column,
      stratum: Column,
      rates: Map[String, Int],
      defaultRate: Int,
      nBuckets: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(stratum === lit(s), lit(r)).otherwise(acc)
    }
    df.withColumn("bucket", bucketCol(key, nBuckets))
      .filter(col("bucket") < rate)
  }
}
