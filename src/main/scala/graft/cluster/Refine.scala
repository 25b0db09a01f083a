package graft.cluster

import scala.collection.mutable
import scala.util.Random

/** Precision refinement of transitive-closure clusters — the port of the
  * reference's cluster-splitting stage (bakdata/dedupe
  * `common/dedupe/clustering/RefineClusterImpl.java:78-459`): small clusters
  * are re-partitioned optimally by enumerating every set partition
  * (restricted-growth strings) against the full pairwise weight matrix; big
  * clusters greedily, over known edges plus sampled triangle edges.
  *
  * All algorithms are sequential per cluster and run inside
  * `flatMapGroups` — per-cluster data is small by construction (SURVEY.md
  * §2.5). Deviations from the reference, both deliberate:
  *  - randomness is seeded per cluster (the reference uses
  *    ThreadLocalRandom, :79 — nondeterministic);
  *  - greedy edges are visited in descending weight (the reference
  *    iterates a PriorityQueue with for-each, which visits heap order —
  *    an accident of Java PQ iteration, not a semantic choice).
  */
object Refine {

  /** Edge weight from a classification (ref `getWeight`, :104-115):
    * DUPLICATE => +confidence, NON_DUPLICATE => -confidence,
    * UNKNOWN => -0.0 (no weight).
    */
  def classificationWeight(classification: String, confidence: Double): Double =
    classification match {
      case graft.model.Classification.Duplicate => confidence
      case graft.model.Classification.NonDuplicate => -confidence
      case _ => -0.0d
    }

  /** Partition quality (ref `scoreClustering`, :117-137): intra-pair weight
    * is amortized over partition size; inter-pair weight penalizes both
    * sides scaled by their complements.
    */
  def scoreClustering(partitions: Array[Int], w: Array[Array[Double]]): Double = {
    val n = partitions.length
    val sizes = new Array[Int](n)
    partitions.foreach(p => sizes(p) += 1)
    var score = 0.0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val wij = w(i)(j)
        if (partitions(i) == partitions(j)) score += wij / sizes(partitions(i))
        else score -= wij / (n - sizes(partitions(i))) + wij / (n - sizes(partitions(j)))
        j += 1
      }
      i += 1
    }
    score
  }

  /** Every set partition of n elements as restricted-growth strings, in the
    * reference generator's lexicographic order (`ClusteringGenerator`,
    * :353-396) — order matters: ties in score keep the earliest partition.
    */
  def partitionsIterator(n: Int): Iterator[Array[Int]] = {
    val cur = new Array[Int](n)
    def rec(i: Int, maxUsed: Int): Iterator[Array[Int]] =
      if (i == n) Iterator.single(cur.clone())
      else (0 to math.min(maxUsed + 1, n - 1)).iterator.flatMap { k =>
        cur(i) = k
        rec(i + 1, math.max(maxUsed, k))
      }
    rec(0, -1)
  }

  /** Exact refinement for small clusters (ref `refineSmallCluster`,
    * :206-227): fill unknown weights via `classify`, argmax over all
    * partitions (earliest wins on ties).
    */
  def refineSmall(n: Int, knownW: Array[Array[Double]],
                  classify: (Int, Int) => Double): Array[Int] = {
    val w = Array.tabulate(n, n)((i, j) => knownW(i)(j))
    for (i <- 0 until n; j <- i + 1 until n)
      if (w(i)(j).isNaN) w(i)(j) = classify(i, j)
    var best: Array[Int] = null
    var bestScore = Double.NegativeInfinity
    partitionsIterator(n).foreach { p =>
      val s = scoreClustering(p, w)
      if (s > bestScore) { bestScore = s; best = p }
    }
    best
  }

  final case class WEdge(l: Int, r: Int, w: Double) {
    def overlaps(e: WEdge): Boolean =
      e.l == l || e.l == r || e.r == l || e.r == r
    /** Third edge of the triangle spanned with an overlapping edge
      * (ref `getTriangleEdge`, :154-164).
      */
    def triangleEdge(e: WEdge): WEdge =
      if (l < e.l) WEdge(l, e.l + e.r - r, Double.NaN)
      else if (l == e.l) WEdge(math.min(r, e.r), math.max(r, e.r), Double.NaN)
      else WEdge(e.l, l + r - e.r, Double.NaN)
  }
  object WEdge {
    def of(i: Int, j: Int, w: Double): WEdge = WEdge(math.min(i, j), math.max(i, j), w)
  }

  def triangularNumber(n: Int): Int = (n + 1) * n / 2

  /** Decode a linear index into the (row, col) of the strict lower triangle
    * (ref `createGaussPair`, :154-164).
    */
  def gaussPair(i: Int): (Int, Int) = {
    val left = (math.sqrt(2.0 * i + 0.25) - 0.5).toInt
    (left, i - triangularNumber(left))
  }

  /** Random candidate edges over the triangle-index space (ref
    * `getRandomEdges`, :139-147) — seeded, unlike the reference.
    */
  def randomEdges(potential: Int, desired: Int, rnd: Random): List[WEdge] = {
    val seen = mutable.LinkedHashSet.empty[Int]
    val out = mutable.ListBuffer.empty[WEdge]
    var guard = 0
    while (out.size < desired && seen.size < potential && guard < potential * 20) {
      guard += 1
      val i = rnd.nextInt(potential)
      if (seen.add(i)) {
        val (l, r) = gaussPair(i)
        if (l != r) out += WEdge.of(l, r, Double.NaN)
      }
    }
    out.toList
  }

  /** Grow the known-edge set with triangle edges until `desired` edges
    * (ref `addRandomEdges`, :299-317), shuffled with the seeded rnd.
    */
  def addRandomEdges(edges: List[WEdge], desired: Int, maxSmall: Int, rnd: Random): List[WEdge] = {
    val acc = mutable.LinkedHashSet(edges: _*)
    var distance = 2
    while (distance < maxSmall && acc.size < desired) {
      val added = edges.iterator
        .flatMap(e => edges.iterator.filter(e.overlaps).map(e.triangleEdge))
        .filter(t => !acc.contains(t) && t.l >= 0 && t.r >= 0 && t.l != t.r)
        .take(math.max(desired - edges.size, 0))
        .toList
      acc ++= rnd.shuffle(added)
      distance += 1
    }
    acc.toList
  }

  /** Greedy refinement (ref `GreedyClustering.greedyCluster`, :427-458):
    * start from singletons; for each edge in descending weight, merge its
    * endpoints' partitions if the score improves.
    */
  def greedyCluster(n: Int, edges: Seq[WEdge]): Array[Int] = {
    val w = Array.ofDim[Double](n, n)
    edges.foreach(e => w(e.l)(e.r) = e.w)
    var clustering = Array.tabulate(n)(identity)
    var score = scoreClustering(clustering, w)
    edges.sortBy(-_.w).foreach { e =>
      val next = clustering.clone()
      val keep = next(e.l); val drop = next(e.r)
      var i = 0
      while (i < n) { if (next(i) == drop) next(i) = keep; i += 1 }
      val s = scoreClustering(next, w)
      if (s > score) { score = s; clustering = next }
    }
    clustering
  }

  /** Heuristic refinement for big clusters (ref `refineBigCluster`,
    * :189-196): known edges + triangle/random fill to T(maxSmall) edges,
    * unknown weights computed, then greedy.
    */
  def refineBig(n: Int, known: List[WEdge], classify: (Int, Int) => Double,
                maxSmall: Int, seed: Long): Array[Int] = {
    val rnd = new Random(seed)
    val desired = triangularNumber(maxSmall)
    // Scale guard (beyond the reference): a dense known-edge set makes both
    // the triangle fill and the greedy loop quadratic-in-edges x O(n^2)
    // scoring — subsample to a few x desired; the greedy merge only needs a
    // spanning sample, not every edge.
    val sampled =
      if (known.size > desired * 4) rnd.shuffle(known).take(desired * 4)
      else known
    val base =
      if (sampled.isEmpty) randomEdges(triangularNumber(n), desired, rnd)
      else addRandomEdges(rnd.shuffle(sampled), desired, maxSmall, rnd)
    val weighted = base.map(e =>
      if (e.w.isNaN) e.copy(w = classify(e.l, e.r)) else e)
    greedyCluster(n, weighted)
  }

  /** Refine one cluster: members indexed 0..n-1, `known` carries signed
    * classification weights for already-scored pairs (NaN layout from the
    * weight matrix), `classify` recomputes missing pairs. Returns the
    * partition labels; clusters of size <= 2 pass through unchanged
    * (ref `refineCluster`, :242-250).
    */
  def refineCluster(n: Int, known: List[WEdge], classify: (Int, Int) => Double,
                    maxSmall: Int, seed: Long): Array[Int] = {
    if (n <= 2) Array.fill(n)(0)
    else if (n > maxSmall) refineBig(n, known, classify, maxSmall, seed)
    else {
      val w = Array.fill(n, n)(Double.NaN)
      known.foreach(e => w(math.min(e.l, e.r))(math.max(e.l, e.r)) = e.w)
      refineSmall(n, w, classify)
    }
  }
}
