package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM training: concatenate the corpus in a stable
  * global order (doc_id) and cut it into fixed-`capacity` token chunks —
  * the GPT-style concat-then-chunk layout, where a document may span chunk
  * boundaries. The output maps every document to its physical location:
  * first/last chunk index, offset inside the first chunk, chunks spanned.
  *
  * Built on [[prefixSum]], the distributed two-phase scan. All outputs are
  * integer-exact (DIV / %), so the DuckDB oracle — a plain single-window
  * prefix sum — hash-matches bit for bit.
  */
object Packing {

  /** Distributed EXCLUSIVE prefix sum of `valueCol` over the order of a
    * NUMERIC unique `idCol`, independently within each `partCols` stratum:
    * appends `cum_before` = sum of values of strictly-prior ids in the same
    * stratum. The classic two-phase scan:
    *   1. bucket rows by deterministic, monotone id ranges (width from one
    *      min/max agg — NOT a sampled RangePartitioner, whose boundaries
    *      vary per execution and would desynchronize the phases);
    *   2. per-(stratum, bucket) totals — one partial-aggregated row each —
    *      are scanned into exclusive offsets on the driver (O(strata ×
    *      buckets) rows) and broadcast-joined back;
    *   3. a window partitioned by (stratum, bucket) — never a single
    *      global partition — adds the within-bucket running sum.
    * At 100 TB nothing heavy crosses the wire: phase 2 moves tiny rollup
    * rows, phase 3 shuffles only the projected columns. Bucket skew follows
    * id skew; for dense ids (the common case) buckets are near-uniform.
    */
  /** @param tieCol optional ordering tiebreak for callers whose `idCol`
    *               is a HASH rather than a unique id (globalShuffle /
    *               curriculum rank on hash60 virtual time): the phase-3
    *               window orders by (id, tie) so a 60-bit hash collision
    *               — plausible at billions of rows — stays deterministic
    *               and mirrors the oracle's `ORDER BY ord, doc_id`.
    *               Bucketing is unaffected (colliding ids share a bucket).
    */
  def prefixSum(df: DataFrame, idCol: String, valueCol: Column,
                partCols: Seq[String] = Nil, buckets: Int = 64,
                tieCol: Option[Column] = None): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = df.withColumn("_v", valueCol.cast("long"))
    val idL = col(idCol).cast("long")

    val mm = base.agg(min(idL), max(idL)).head()
    if (mm.isNullAt(0)) return base.withColumn("cum_before", lit(0L)).drop("_v")
    val lo = mm.getLong(0); val hi = mm.getLong(1)
    val width = math.max(1L, (hi - lo) / buckets + 1L)
    val bucketed = base.withColumn("_bucket",
      expr(s"(CAST($idCol AS BIGINT) - $lo) DIV $width"))
    val keyCols = partCols.map(col) :+ col("_bucket")

    // phase 2: per-(stratum, bucket) totals -> exclusive offsets (driver scan)
    val nPart = partCols.length
    val totals = bucketed.groupBy(keyCols: _*).agg(sum(col("_v")).as("_t"))
      .collect()
      .groupBy(r => (0 until nPart).map(r.get))
      .flatMap { case (_, rows) =>
        var acc = 0L
        rows.toSeq.sortBy(_.getLong(nPart)).map { r =>
          val o = Row.fromSeq(r.toSeq.take(nPart + 1) :+ acc)
          acc += r.getLong(nPart + 1)
          o
        }
      }.toSeq
    val spark = df.sparkSession
    val offSchema = StructType(
      partCols.map(c => bucketed.schema(c)) ++
        Seq(StructField("_bucket", LongType), StructField("_off", LongType)))
    val offDf = broadcast(
      spark.createDataFrame(spark.sparkContext.parallelize(totals, 1), offSchema))

    // phase 3: within-bucket running sum, strictly-prior rows only.
    // NULL-SAFE offsets join: a NULL stratum value (docs with unknown
    // lang/source) is a legitimate stratum — the window and the driver
    // scan both group NULLs together, so the join back must too (a plain
    // equi-join silently dropped every NULL-stratum row)
    val joinCols = partCols :+ "_bucket"
    val offRenamed = joinCols.zipWithIndex.foldLeft(offDf) {
      case (d, (c, i)) => d.withColumnRenamed(c, s"_jc$i")
    }
    val cond = joinCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"_jc$i") }.reduce(_ && _)
    val win = Window.partitionBy(keyCols: _*)
      .orderBy(idL +: tieCol.toSeq: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(offRenamed, cond)
      .withColumn("cum_before",
        col("_off") + coalesce(sum(col("_v")).over(win), lit(0L)))
      .drop("_v", "_bucket", "_off")
      .drop(joinCols.indices.map(i => s"_jc$i"): _*)
  }

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
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      tokCol.cast("long").as("n_tok"))
    prefixSum(toks, "doc_id", col("n_tok"), Nil, buckets)
      .withColumn("first_chunk", expr(s"cum_before DIV $capacity"))
      .withColumn("chunk_offset", col("cum_before") % capacity)
      .withColumn("last_chunk",
        expr(s"(cum_before + greatest(n_tok, 1) - 1) DIV $capacity"))
      .select(col("doc_id"), col("n_tok"), col("first_chunk"),
        col("chunk_offset"), col("last_chunk"),
        (col("last_chunk") - col("first_chunk") + 1L).as("n_chunks"))
  }
}
