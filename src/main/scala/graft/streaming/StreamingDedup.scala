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
    *        (a key seen again after the TTL is re-emitted).
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
