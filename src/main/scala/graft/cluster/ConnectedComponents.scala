package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over DUPLICATE edges — the scale
  * re-expression of the reference's incremental in-memory transitive closure
  * (bakdata/dedupe `common/dedupe/clustering/TransitiveClosure.java:52-140`,
  * whose id->cluster map grows unboundedly on the heap).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — O(log n)
  * rounds even on path graphs, each round two shuffles (groupBy min +
  * join). Cluster id = min member id: deterministic and order-independent,
  * unlike the reference's counter ids (`ClusterIdGenerators.java:36-59`,
  * SURVEY.md §7.5 risk 1).
  *
  * Each round ends in `localCheckpoint()` to cut the lineage (a fixpoint
  * loop would otherwise grow an unbounded plan).
  */
object ConnectedComponents {

  /** @param edges DataFrame with two columns (src, dst) of one orderable
    *              type (long or string). Self-loops ignored.
    * @return DataFrame (id, cluster_id) for every node incident to an edge;
    *         callers union isolated records back as singletons.
    */
  /** @param minIter rounds to run before paying for convergence checks.
    *        The signature agg is one cheap job; computing it from round 1
    *        lets dense dedup graphs (near-cliques collapse to a star in one
    *        alternating round) exit after 2 rounds instead of paying an
    *        extra ~6-shuffle round to discover convergence later
    */
  def run(edges: DataFrame, maxIter: Int = 30, minIter: Int = 1): DataFrame = {
    val spark = edges.sparkSession
    // AQE off for the duration of the fixpoint loop: each round is a chain
    // of tiny shuffles, and AQE turns every one into its own stage-job
    // (observed ~8 extra driver-latency-bound jobs per round). Skew is
    // handled by the large-star/small-star decomposition itself (high-degree
    // nodes shed neighbors to their minimum each round), so AQE's skew
    // splitting buys nothing here. Restored afterwards.
    val aqeKey = "spark.sql.adaptive.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val aqeWas = spark.conf.get(aqeKey, "true")
    val partsWas = spark.conf.get(partsKey)
    spark.conf.set(aqeKey, "false")
    try runLoop(edges, maxIter, minIter)
    finally {
      spark.conf.set(aqeKey, aqeWas)
      spark.conf.set(partsKey, partsWas)
    }
  }

  private def runLoop(edges: DataFrame, maxIter: Int, minIter: Int): DataFrame = {
    val spark = edges.sparkSession
    val Seq(srcC, dstC) = edges.columns.toSeq.take(2)
    // canonical undirected edge set, u > v convention dropped; keep (u, v) pairs u != v
    //
    // Per-round plan truncation: each round references the previous round's
    // frame twice, so the logical TREE is 2^k-sized after k rounds (plans
    // hang in stringification/analysis long before data size matters).
    // `rebaseOnRdd` rebases the round on its execution RDD — a one-node
    // LogicalRDD plan — and the RDD is persisted so the round computes
    // once; unlike per-round localCheckpoint this adds NO extra jobs.
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.storage.StorageLevel
    val (e0, rdd0) = GraftColumnBridge.rebaseOnRdd(
      edges
        .select(col(srcC).as("u"), col(dstC).as("v"))
        .where(col("u") =!= col("v"))
        .distinct())
    rdd0.persist(StorageLevel.MEMORY_AND_DISK)
    // Size the LOOP's shuffles to the edge set, not the session default:
    // each round is a chain of shuffles over a frame that is usually tiny
    // relative to the session's shuffle.partitions (a 5k-edge set at 32
    // partitions = 8 rounds x ~10 stages x 32 near-empty tasks — profiled
    // as pure scheduling overhead, run time 7x the CPU time). One
    // materializing count on the already-persisted round-0 RDD picks
    // ~20k edges/partition, floored at 1 and capped at the session value
    // so huge edge sets keep full parallelism (restored by run()).
    val n0 = e0.count()
    val partsWas = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val loopParts = math.max(1L, math.min(partsWas.toLong, n0 / 20000L + 1L)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    var e = e0
    var eRdd: org.apache.spark.rdd.RDD[_] = rdd0

    var converged = false
    var iter = 0
    // convergence signature of the current edge set; carried across
    // iterations so each round pays ONE aggregate action, not two
    def sigOf(df: DataFrame) = df.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(cast(u as string), cast(v as string)))"), lit(0L)).as("h"))
      .head()
    var prevSig: org.apache.spark.sql.Row = null
    while (!converged && iter < maxIter) {
      // ---- large-star: for each u, connect every neighbor v > u to
      //      m = min(N(u) ∪ {u})
      val adj = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = adj.groupBy("u").agg(min(col("v")).as("_mv"))
        .select(col("u"), least(col("u"), col("_mv")).as("m"))
      // no distinct here: duplicate (u, m) rows are harmless to the
      // small-star min-aggregations and the final distinct — dropping the
      // dedup saves one shuffle per round
      val large = adj.join(mins, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))

      // ---- small-star: for each u over neighbors v <= u (v < u since no
      //      self-loops), connect them all (and u) to m = min(N<(u) ∪ {u})
      val adj2 = large.unionAll(large.select(col("v").as("u"), col("u").as("v")))
      val smallNbr = adj2.where(col("v") < col("u"))
      val smins = smallNbr.groupBy("u").agg(min(col("v")).as("m"))
      val small0 = smallNbr.join(smins, Seq("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .unionAll(smins.select(col("u").as("a"), col("m").as("b")))
        .where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("v"), greatest(col("a"), col("b")).as("u"))
        .select(col("u"), col("v"))
        .distinct()
      val (small, smallRdd) = GraftColumnBridge.rebaseOnRdd(small0)
      smallRdd.persist(StorageLevel.MEMORY_AND_DISK)

      if (iter >= minIter - 1) {
        val sig = sigOf(small) // materializes this round's RDD cache
        converged = sig == prevSig
        prevSig = sig
      }
      eRdd.unpersist(false)
      e = small
      eRdd = smallRdd
      iter += 1
    }
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[cc] rounds=$iter converged=$converged")

    // The final round's RDD must stay persisted until the CALLER materializes
    // the assignment (the result below is lazy), so it can't be released
    // here. Bound the leak to one live RDD per context instead: the next
    // run() in the same SparkContext unpersists the previous run's final
    // RDD (its lineage stays recomputable, so a still-cached consumer frame
    // remains correct, just slower on a cold re-read).
    val prevFinal = lastFinal.put(spark.sparkContext.applicationId, eRdd)
    if ((prevFinal ne null) && (prevFinal ne eRdd))
      scala.util.Try(prevFinal.unpersist(false))

    // after convergence e is a star forest: (bigger -> component min)
    val members = e.select(col("u").as("id"), col("v").as("cluster_id"))
    val roots = e.select(col("v").as("id"), col("v").as("cluster_id")).distinct()
    members.unionAll(roots)
      .groupBy("id").agg(min(col("cluster_id")).as("cluster_id"))
  }

  /** Last fixpoint-final RDD per SparkContext — see the release note in
    * [[runLoop]].
    */
  private val lastFinal =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.rdd.RDD[_]]()

  /** Incremental re-clustering: union the previous assignment (as
    * member->cluster_id star edges) with the new DUPLICATE edges before CC —
    * previously-emitted clusters stay connected, so their ids remain stable
    * unless new evidence merges them. This is the batch re-expression of the
    * reference's ConsistentClustering guarantee
    * (`common/dedupe/clustering/ConsistentClustering.java:60-116`,
    * SURVEY.md §2.5): never split an already-emitted cluster.
    */
  def incrementalAssign(records: DataFrame, idCol: String,
                        prevAssign: DataFrame, newEdges: DataFrame): DataFrame = {
    val prevEdges = prevAssign
      .select(col("id").as("src"), col("cluster_id").as("dst"))
      .where(col("src") =!= col("dst"))
    val Seq(s, d) = newEdges.columns.toSeq.take(2)
    assignAll(records, idCol,
      newEdges.select(col(s).as("src"), col(d).as("dst")).unionAll(prevEdges))
  }

  /** Assignment for all records: CC over edges, singletons map to
    * themselves — clusters partition the dataset, matching the reference's
    * contract (`Cluster.java:38-44`, SURVEY.md §7.1.3).
    */
  def assignAll(records: DataFrame, idCol: String, edges: DataFrame): DataFrame = {
    val assigned = run(edges)
    // fresh aliases on the way out: the output must not re-expose the input
    // relation's attributes (self-join ambiguity when callers join the
    // assignment back to the same records)
    records.select(col(idCol).as("id"))
      .join(assigned, Seq("id"), "left")
      .select(col("id").as("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .toDF("id", "cluster_id")
  }
}
