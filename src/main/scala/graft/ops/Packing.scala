package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate the corpus in a stable
  * global order (doc_id) and cut it into fixed-`capacity` token chunks —
  * the GPT-style concat-then-chunk layout, where a document may span chunk
  * boundaries. The output maps every document to its physical location:
  * first/last chunk index, offset inside the first chunk, chunks spanned.
  *
  * The whole computation is ONE global prefix sum over token counts, made
  * distributed the classic two-phase way:
  *   1. bucket documents by deterministic, monotone id ranges (width from
  *      one min/max agg — NOT a sampled RangePartitioner, whose boundaries
  *      vary per execution and would desynchronize phase 1 and phase 2);
  *   2. per-bucket token totals (partial-aggregated, one row per bucket)
  *      are scanned into cumulative offsets on the driver — O(buckets)
  *      rows, the standard scan trick — and broadcast-joined back;
  *   3. a window partitioned BY BUCKET (never a single global partition)
  *      adds the within-bucket running sum.
  * At 100 TB nothing heavy crosses the wire: phase 2 moves `buckets` rows,
  * phase 3 shuffles only (doc_id, n_tok, bucket). Bucket skew follows id
  * skew; for dense ids (the common case) buckets are near-uniform.
  *
  * All outputs are integer-exact (DIV / %), so the DuckDB oracle — a plain
  * single-window prefix sum — hash-matches bit for bit.
  */
object Packing {

  /** @param docs     input with an orderable NUMERIC id column
    * @param idCol    unique id defining the global concatenation order
    * @param tokCol   per-document token count (>= 0; empty docs still get
    *                 a defined, zero-width location)
    * @param capacity tokens per training chunk (context length)
    * @param buckets  parallelism of the prefix sum
    */
  def packChunks(docs: DataFrame, idCol: String, tokCol: Column,
                 capacity: Long, buckets: Int = 64): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      tokCol.cast("long").as("n_tok"))

    val mm = toks.agg(min(col("doc_id")), max(col("doc_id"))).head()
    if (mm.isNullAt(0)) return emptyResult(toks)
    val lo = mm.getLong(0); val hi = mm.getLong(1)
    val width = math.max(1L, (hi - lo) / buckets + 1L)
    val bucketed = toks.withColumn("bucket", expr(s"(doc_id - $lo) DIV $width"))

    // phase 2: per-bucket totals -> exclusive cumulative offsets (driver scan)
    val totals = bucketed.groupBy(col("bucket")).agg(sum(col("n_tok")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = (b, acc); acc += t; o }
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("bucket", "bucket_off"))

    // phase 3: within-bucket running sum, strictly-prior rows only
    val win = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(offDf, Seq("bucket"))
      .withColumn("cum_before",
        col("bucket_off") + coalesce(sum(col("n_tok")).over(win), lit(0L)))
      .withColumn("first_chunk", expr(s"cum_before DIV $capacity"))
      .withColumn("chunk_offset", col("cum_before") % capacity)
      .withColumn("last_chunk",
        expr(s"(cum_before + greatest(n_tok, 1) - 1) DIV $capacity"))
      .select(col("doc_id"), col("n_tok"), col("first_chunk"),
        col("chunk_offset"), col("last_chunk"),
        (col("last_chunk") - col("first_chunk") + 1L).as("n_chunks"))
  }

  private def emptyResult(toks: DataFrame): DataFrame =
    toks.select(col("doc_id"), col("n_tok"), lit(0L).as("first_chunk"),
      lit(0L).as("chunk_offset"), lit(0L).as("last_chunk"),
      lit(0L).as("n_chunks")).limit(0)
}
