package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators for training-data pipelines. */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapSec`. All windows are PARTITIONED by
    * user — per-user event counts are bounded, so no single-partition
    * WindowExec appears at any scale, and the single shuffle is the
    * hash-partition on user_id that the session aggregate reuses (Catalyst
    * collapses the window and groupBy exchanges).
    *
    * Gap arithmetic is integer microseconds (`unix_micros`) so the DuckDB
    * oracle (`epoch_us`) is bit-exact; duration is reported in
    * microseconds for the same reason.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ts is TIMESTAMP_NTZ; sessions run UTC (Verify/Bench), so the cast is
    // the identity instant and unix_micros matches DuckDB's epoch_us exactly
    val us = unix_micros(col("ts").cast("timestamp"))
    val prevUs = lag(us, 1).over(byUser)
    // an event without a timestamp cannot be placed in time: exempt (the
    // engine's window ordering and the oracle's NULLS-LAST lag would
    // otherwise each invent a different session for it)
    events.where(col("ts").isNotNull)
      .withColumn("_is_new",
        when(prevUs.isNull || us - prevUs > gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("_is_new")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        (max(us) - min(us)).as("duration_us"),
        sum(col("value")).cast("float").as("sum_value"))
  }

  /** Extract an integer field from the semi-structured `props` JSON column.
    * `get_json_object` is a codegen'd path expression — no UDF, no
    * per-row parser object; at scale the extraction rides the scan
    * projection, so only the needed field ever leaves the parquet reader's
    * string column.
    */
  def propsLong(events: DataFrame, field: String): DataFrame =
    events.withColumn(field,
      get_json_object(col("props"), s"$$.$field").cast("long"))

  /** Point-in-time (as-of) join within one event stream: for every event of
    * `forType`, attach the value and microsecond gap of the user's most
    * recent STRICTLY PRIOR `matchType` event. Expressed as a per-user
    * running `last(_, ignoreNulls)` window rather than a range join — one
    * hash-partition on user_id, bounded per-user partitions, no
    * self-join, no skew amplification (the classic as-of-join-as-window
    * re-expression; a range join would shuffle both sides and explode on
    * hot users). Ordering ties break on event_id, so the result is
    * deterministic and hash-exact against the oracle.
    */
  def asofPrev(
      events: DataFrame,
      forType: String = "purchase",
      matchType: String = "view"): DataFrame = {
    val prior = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val us = unix_micros(col("ts").cast("timestamp"))
    val matchValue = when(col("event_type") === matchType, col("value"))
    val matchUs = when(col("event_type") === matchType, us)
    val prevValue = s"prev_${matchType}_value"
    events
      .withColumn(prevValue, last(matchValue, ignoreNulls = true).over(prior))
      .withColumn("gap_us", us - last(matchUs, ignoreNulls = true).over(prior))
      .filter(col("event_type") === forType)
      .select(col("event_id"), col("user_id"), col(prevValue), col("gap_us"))
  }

  /** Ordered funnel: for each user, the earliest time of stage i+1 STRICTLY
    * AFTER the user's earliest completion of stage i (a view before the
    * signup does not count). `stage_depth` is the number of stages reached.
    *
    * Shape at scale: the stage-type filter pushes to the scan, then ONE
    * hash-partition on user_id feeds a chain of whole-partition window
    * mins — stage i+1's `min(us WHERE type=s AND us > t_i)` reads the
    * previous window's per-user constant, so the sequential dependence
    * costs extra partition-local passes, never extra shuffles (a
    * stage-per-join formulation plans k exchanges and re-aggregates the
    * prefix chain under every left join). The final per-user collapse
    * reuses the same partitioning: exactly one exchange at any scale
    * (PlanSpec-gated). Timestamps are integer microseconds for oracle
    * exactness.
    */
  def funnel(
      events: DataFrame,
      stages: Seq[String] = Seq("signup", "view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty)
    def tCol(s: String) = s"t_${s}_us"
    val byUser = Window.partitionBy(col("user_id"))
    val e = events
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn(tCol(stages.head),
        min(when(col("event_type") === stages.head, col("us"))).over(byUser))
    val staged = stages.sliding(2).filter(_.length == 2).foldLeft(e) {
      case (df, Seq(prev, next)) =>
        df.withColumn(tCol(next),
          min(when(col("event_type") === next && col("us") > col(tCol(prev)),
            col("us"))).over(byUser))
    }
    val depth = stages.tail.map(s => when(col(tCol(s)).isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    staged
      .groupBy(col("user_id"))
      .agg(min(col(tCol(stages.head))).as(tCol(stages.head)),
        stages.tail.map(s => min(col(tCol(s))).as(tCol(s))): _*)
      .where(col(tCol(stages.head)).isNotNull)
      .withColumn("stage_depth", depth.cast("int"))
  }

  /** Cohort retention: users grouped by the DAY of their first `cohortType`
    * event, counted once per day-offset at which they were active on or
    * after that day. The classic retention-curve input
    * (cohort_day × day_offset × n_users).
    *
    * Shape at scale: ONE hash-partition on user_id drives both the
    * first-event window and the per-user (cohort_day, day_offset) distinct
    * — the distinct's grouping keys include user_id, so the window's
    * partitioning already clusters them and Spark plans no second
    * exchange; only the final small rollup (days × offsets rows) shuffles
    * again. No self-join, no per-day scan.
    */
  def retention(events: DataFrame, cohortType: String = "signup"): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    events
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .withColumn("cohort_day",
        min(when(col("event_type") === cohortType, col("day"))).over(byUser))
      .where(col("cohort_day").isNotNull && col("day") >= col("cohort_day"))
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Hopping (sliding) window aggregation — the batch analog of Structured
    * Streaming's `window()` group (and bit-compatible with it: same
    * epoch-aligned window arithmetic, so a backfill with this op and a live
    * stream produce identical rows). Each event lands in size/hop windows;
    * Spark's `window()` generator explodes the covering windows MAP-SIDE
    * (no self-join against a window table), then one partial-aggregated
    * groupBy on (window, event_type) shuffles only the rolled-up rows.
    *
    * Window starts are reported as integer epoch microseconds and every
    * aggregate is order-independent (counts, distinct counts, min/max), so
    * the DuckDB oracle — explicit floor-division window enumeration — is
    * hash-exact.
    */
  def hoppingWindows(events: DataFrame, sizeSec: Long, hopSec: Long,
                     withUserCounts: Boolean = true): DataFrame = {
    require(sizeSec % hopSec == 0,
      s"window size must be a multiple of the hop, got $sizeSec/$hopSec")
    // exact distinct-count is not available under streaming execution —
    // callers running this op over readStream pass withUserCounts = false
    // (same windows, same counts/min/max: the backfill-parity subset)
    val userAgg =
      if (withUserCounts) Seq(countDistinct(col("user_id")).as("n_users")) else Nil
    events
      .groupBy(
        window(col("ts").cast("timestamp"), s"$sizeSec seconds", s"$hopSec seconds"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        userAgg ++ Seq(
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value")): _*)
      .withColumn("win_start_us", unix_micros(col("window.start")))
      .drop("window")
      .select(col("win_start_us") +: col("event_type") +:
        (if (withUserCounts)
          Seq(col("n_events"), col("n_users"), col("min_value"), col("max_value"))
        else Seq(col("n_events"), col("min_value"), col("max_value"))): _*)
  }

  /** Event-type transition matrix (user-journey bigrams): for every pair of
    * CONSECUTIVE events of one user, count (from_type -> to_type) and the
    * distinct users making that transition — the Markov-chain input behind
    * flow/sankey analysis and next-action models.
    *
    * Shape at scale: one hash-partition on user_id feeds the lead() window
    * (per-user partitions are bounded), and the rollup's grouping is the
    * tiny type-pair space, partial-aggregated map-side. Deterministic: the
    * window orders by (ts, event_id) so ties never reorder.
    */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Top event-type paths: each user's first `k` events (by (ts, event_id))
    * form an ordered path string; emit the `topN` most common paths with
    * their user counts — the funnel-discovery complement to [[funnel]]'s
    * fixed-stage conversion. One hash-partition on user_id feeds the
    * row_number window AND the per-user path rollup (Catalyst reuses the
    * exchange); the path-level count is a partial-combined aggregate over
    * at most |event_types|^k keys, and the final topN plans as
    * TakeOrderedAndProject (per-partition heap, driver merge — never a
    * global sort). Ties at the cut break on the path string, so the
    * result is deterministic and hash-exact.
    */
  def topPaths(events: DataFrame, k: Int = 5, topN: Int = 20): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("_rn", row_number().over(byUser))
      .where(col("_rn") <= k)
      .groupBy(col("user_id"))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("_rn"), col("event_type")))),
          s => s.getField("event_type")), ">").as("path"),
        count(lit(1)).as("_n_steps"))
      .groupBy(col("path"))
      .agg(max(col("_n_steps")).as("n_steps"), count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topN)
  }

  /** Distinct-user sketch per hour: linear-counting bitmap (Whang et al.
    * 1990 — the fixed-size sketch family HLL refines) with m bits; each
    * event sets bit hash60("u:" || user_id) mod m, bitmaps OR-merge. The
    * sketch state is m/8 bytes REGARDLESS of cardinality, and OR is
    * commutative/associative/idempotent — so at 100 TB the per-hour
    * distinct estimate is a map-side-combined aggregate of bitmap words
    * (groupBy(hour, word) + bit_or partial-combines before any exchange;
    * at most m/32 rows per hour ever shuffle), where the exact
    * countDistinct must shuffle every (hour, user) pair. Both are emitted
    * side by side: `bits_set` is the sketch observable (estimate =
    * -m*ln(1-bits_set/m); left to the reader — IEEE ln is not
    * oracle-portable), `n_users` the exact truth it approximates.
    * Deterministic integer arithmetic end to end; the DuckDB oracle
    * rebuilds the identical bitmap. Words are 32-bit lanes (shift ≤ 31)
    * because a shift by 63 overflows ANSI engines' checked BIGINT shift
    * where the JVM's wraps — the portable-arithmetic discipline every
    * oracle-mirrored kernel here follows.
    */
  def approxUsers(events: DataFrame, m: Int = 4096): DataFrame = {
    require(m % 32 == 0, s"bitmap bits must be a multiple of 32, got $m")
    val bit = graft.sig.Signatures.hash60Col(
      concat(lit("u:"), col("user_id").cast("string"))) % m
    val base = events.select(
      date_trunc("hour", col("ts")).as("hour_ts"), col("user_id"),
      (bit / 32).cast("int").as("_w"), (bit % 32).cast("int").as("_b"))
    val bitsSet = base
      .select(col("hour_ts"), col("_w"),
        expr("shiftleft(CAST(1 AS BIGINT), _b)").as("_mask"))
      .groupBy(col("hour_ts"), col("_w"))
      .agg(bit_or(col("_mask")).as("_word"))
      .groupBy(col("hour_ts"))
      .agg(sum(bit_count(col("_word"))).as("bits_set"))
    val exact = base
      .groupBy(col("hour_ts"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    exact.join(bitsSet, Seq("hour_ts"))
      .select(col("hour_ts"), col("n_events"), col("n_users"), col("bits_set"))
  }

  /** Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005): d
    * hash rows × w counters estimate any key's event count as the MIN of
    * its d counters — a one-sided overcount (collisions only add). The
    * sketch state is d·w integers regardless of key cardinality and
    * merges by cell-wise sum, so at 100 TB the counter build is a
    * map-side-combined aggregate over at most d·w cells per partition
    * where an exact per-key count must shuffle every key. Emits the topN
    * true-heaviest keys with exact count and sketch estimate side by side
    * (the estimate's error IS the observable — this is the
    * frequency-sketch complement to [[approxUsers]]'s cardinality
    * sketch). Pure hash60 integer arithmetic; the DuckDB oracle rebuilds
    * the identical counter matrix.
    */
  def heavyHitters(events: DataFrame, d: Int = 4, w: Int = 64,
                   topN: Int = 20): DataFrame = {
    def bucket(i: Int) = graft.sig.Signatures.hash60Col(
      concat(lit(s"cms:$i:"), col("user_id").cast("string"))) % w
    val rows = (0 until d).map(i => bucket(i))
    val counters = events
      .select(col("user_id"), posexplode(array(rows: _*)).as(Seq("i", "bucket")))
      .groupBy(col("i"), col("bucket")).agg(count(lit(1)).as("c"))
    val top = events.groupBy(col("user_id")).agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("user_id")).limit(topN)
    top
      .select(col("user_id"), col("n_true"),
        posexplode(array(rows: _*)).as(Seq("i", "bucket")))
      .join(counters, Seq("i", "bucket"))
      .groupBy(col("user_id"), col("n_true"))
      .agg(min(col("c")).as("n_cms"))
      .select(col("user_id"), col("n_true"), col("n_cms"))
  }

  /** Per-event-type rollup over the extracted JSON field: classic
    * partial-aggregate shape (map-side combine on the handful of event
    * types, one tiny shuffle). All aggregates are order-independent
    * (counts, integer sums, min/max), so the result is deterministic under
    * any partitioning — and hash-exact against the DuckDB oracle.
    */
  def propsRollup(events: DataFrame, field: String): DataFrame =
    propsLong(events, field)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col(field)).as(s"sum_$field"),
        min(col(field)).as(s"min_$field"),
        max(col(field)).as(s"max_$field"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
}
