package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the online (record-at-a-time) semantics of
  * the reference re-expressed on Spark's streaming engine.
  *
  * The reference's online dedup holds mutable state (seen-key index,
  * `OnlineSortedNeighborhoodMethod.java:103`) and emits per record; here
  * the state lives in `flatMapGroupsWithState` (checkpointable,
  * partitioned by key — unbounded-state risk is the watermark/timeout's
  * job, not a process heap's). Batch remains the primitive for the
  * 10^12-row target (SURVEY.md §7.5 risk 7); this covers the online API
  * surface.
  */
object StreamingDedup {

  final case class Keyed(key: String, id: String)

  /** Online exact dedup: the FIRST record per content key survives, later
    * arrivals are dropped — the streaming analog of
    * `Deduplication.materializedDeduplicate` last/first-wins
    * (`core/dedupe/deduplication/Deduplication.java:86-91`) with
    * first-wins semantics (arrival order, as in the online reference).
    *
    * @param stateTtl optional per-key state TTL (processing time). The
    *        default (null) is EXACT-FOREVER dedup: state grows with key
    *        cardinality and never expires — correct, and acceptable only
    *        for bounded keyspaces. Pass e.g. "24 hours" for the
    *        memory/exactness trade every large-scale streaming dedup makes
    *        (a key seen again after the TTL is re-emitted). NOTE: with a
    *        TTL set, the engine schedules wall-clock timeout batches
    *        indefinitely (processAllAvailable / AvailableNow never settle
    *        — observed on Spark 4.1), and eviction is not replayable;
    *        prefer [[firstPerKeyEventTime]], whose watermark-driven TTL is
    *        deterministic and is covered by the e2e spec.
    */
  def firstPerKey(records: DataFrame, keyCol: String, idCol: String,
                  stateTtl: String = null): Dataset[Keyed] = {
    val spark = records.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtl == null) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    records.select(col(keyCol).cast("string").as("key"), col(idCol).cast("string").as("id"))
      .as[Keyed]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: String, rows: Iterator[Keyed], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) Iterator.empty
          else {
            state.update(true)
            if (stateTtl != null) state.setTimeoutDuration(stateTtl)
            rows.take(1)
          }
        })
  }

  final case class KeyedTs(key: String, id: String, ts: java.sql.Timestamp)

  /** Online first-per-key dedup with EVENT-TIME state TTL: a key's seen
    * state expires `ttlMs` after its last event timestamp, relative to the
    * stream's watermark — the bounded-state form of [[firstPerKey]] whose
    * eviction is DETERMINISTIC and replayable (a checkpoint replay evicts
    * at the same watermark, where a processing-time TTL depends on the
    * wall clock of the original run; empirically the engine also keeps
    * scheduling wall-clock timeout batches forever under
    * ProcessingTimeTimeout, so AvailableNow/processAllAvailable never
    * settle — event time is the operationally sane choice at scale).
    *
    * Eviction: a group with an expired timeout AND no new rows in the batch
    * is removed once the watermark passes last_ts + ttl; the key's next
    * arrival re-emits. A group that keeps receiving rows keeps its first
    * winner (the timeout is pushed out past each new event).
    */
  def firstPerKeyEventTime(records: DataFrame, keyCol: String, idCol: String,
                           tsCol: String, ttlMs: Long,
                           lateness: String = "0 seconds"): Dataset[Keyed] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.select(col(keyCol).cast("string").as("key"),
        col(idCol).cast("string").as("id"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", lateness)
      .as[KeyedTs]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[KeyedTs], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rs = rows.toArray
            val first = !state.exists
            if (first) state.update(true)
            val maxTs = rs.iterator.map(_.ts.getTime).max
            // must be strictly beyond the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            if (first) rs.iterator.take(1).map(r => Keyed(r.key, r.id))
            else Iterator.empty
          }
        })
  }

  /** Streaming gap-based sessionization via the native `session_window`
    * (declarative merge-on-overlap session state — no hand-rolled
    * flatMapGroupsWithState): one row per (user, session) once the
    * watermark closes the session. The streaming twin of
    * `graft.ops.Events.sessionize`, with one boundary difference: a gap of
    * EXACTLY `gap` starts a new session here (session windows merge on
    * overlap, `[ts, ts+gap)`), while the batch form's strictly-greater
    * test keeps it — the e2e spec pins both behaviors away from the
    * boundary.
    */
  def sessionCounts(events: DataFrame, tsCol: String, userCol: String,
                    gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Watermarked tumbling-window counts per event type — the standard
    * streaming aggregation shape (late data beyond the watermark dropped).
    */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
                     window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp")) // NTZ -> LTZ: watermarks need an instant
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
}
