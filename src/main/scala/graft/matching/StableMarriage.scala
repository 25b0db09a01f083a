package graft.matching

import scala.collection.mutable

/** Bipartite matching kernels, executor-local: invoked only inside row-level
  * similarity functions over small per-row bags (SURVEY.md §2.6).
  *
  * Semantics ported from the reference (bakdata/dedupe
  * `common/dedupe/matching/WeaklyStableMarriage.java:51-91`,
  * `StronglyStableMarriage.java:60-207`, `AbstractStableMarriage.java:47-204`)
  * — algorithms reimplemented from the published definitions (Gale-Shapley;
  * Irving '94 strong stability with Hopcroft-Karp critical sets), not from
  * the reference code.
  */
object StableMarriage {

  /** A weighted edge in the preference graph: left index, right index,
    * weight (higher = preferred).
    */
  final case class E(l: Int, r: Int, w: Double)

  /** Tied preference rankings per side: for each left node, right nodes
    * grouped into descending-weight tiers (ref `getRanking`,
    * `AbstractStableMarriage.java:85-110`).
    */
  private def rankings(n: Int, edges: Seq[E], byLeft: Boolean): Array[List[List[Int]]] = {
    val out = Array.fill(n)(List.empty[List[Int]])
    val grouped = edges.groupBy(e => if (byLeft) e.l else e.r)
    grouped.foreach { case (k, es) =>
      val tiers = es.groupBy(_.w).toList.sortBy(-_._1)
        .map(_._2.map(e => if (byLeft) e.r else e.l).toList)
      out(k) = tiers
    }
    out
  }

  /** Weakly stable matching from symmetric edge weights: Gale-Shapley with
    * ties broken arbitrarily (deterministically: first-listed). Returns
    * matched (l, r) pairs.
    */
  def weaklyStable(nLeft: Int, nRight: Int, edges: Seq[E]): Seq[(Int, Int)] = {
    val prefL = rankings(nLeft, edges, byLeft = true).map(_.flatten)
    val rankR = Array.fill(nRight)(mutable.Map.empty[Int, Int])
    rankings(nRight, edges, byLeft = false).zipWithIndex.foreach { case (tiers, r) =>
      var rank = 0
      tiers.foreach { tier => tier.foreach { l => rankR(r)(l) = rank }; rank += 1 }
    }
    weaklyStableCore(nLeft, nRight, prefL, rankR)
  }

  /** Weakly stable matching from explicit per-side tiered rankings (the
    * reference's `WeakMatcher` entry, asymmetric preferences allowed —
    * `WeaklyStableMarriageTest` fixtures use strict singleton tiers).
    */
  def weaklyStableRanked(prefLTiers: Seq[Seq[Seq[Int]]],
                         prefRTiers: Seq[Seq[Seq[Int]]]): Seq[(Int, Int)] = {
    val nLeft = prefLTiers.size; val nRight = prefRTiers.size
    val prefL = prefLTiers.map(_.flatten.toList).toArray
    val rankR = Array.fill(nRight)(mutable.Map.empty[Int, Int])
    prefRTiers.zipWithIndex.foreach { case (tiers, r) =>
      tiers.zipWithIndex.foreach { case (tier, rank) => tier.foreach(l => rankR(r)(l) = rank) }
    }
    weaklyStableCore(nLeft, nRight, prefL, rankR)
  }

  private def weaklyStableCore(nLeft: Int, nRight: Int,
                               prefL: Array[List[Int]],
                               rankR: Array[mutable.Map[Int, Int]]): Seq[(Int, Int)] = {
    val next = Array.fill(nLeft)(0)
    val matchR = Array.fill(nRight)(-1)
    val free = mutable.Queue(0 until nLeft: _*)
    while (free.nonEmpty) {
      val l = free.dequeue()
      if (next(l) < prefL(l).length) {
        val r = prefL(l)(next(l))
        next(l) += 1
        if (!rankR(r).contains(l)) free.enqueue(l) // unacceptable partner
        else if (matchR(r) < 0) matchR(r) = l
        else if (rankR(r)(l) < rankR(r).getOrElse(matchR(r), Int.MaxValue)) {
          free.enqueue(matchR(r)); matchR(r) = l
        } else free.enqueue(l)
      }
    }
    (0 until nRight).collect { case r if matchR(r) >= 0 => (matchR(r), r) }
  }

  /** Strongly stable matching from explicit per-side tiered rankings (the
    * reference's `StrongMatcher` entry; `StronglyStableMarriageTest`
    * fixtures). Tier index becomes a descending weight.
    */
  def stronglyStableRanked(prefLTiers: Seq[Seq[Seq[Int]]],
                           prefRTiers: Seq[Seq[Seq[Int]]]): Seq[(Int, Int)] = {
    val edgesL = for {
      (tiers, l) <- prefLTiers.zipWithIndex
      (tier, rank) <- tiers.zipWithIndex
      r <- tier
    } yield (l, r, -rank.toDouble)
    val rankRMap = (for {
      (tiers, r) <- prefRTiers.zipWithIndex
      (tier, rank) <- tiers.zipWithIndex
      l <- tier
    } yield (r, l, -rank.toDouble)).groupBy(_._1)
      .view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    // acceptability must be mutual: keep edges present on both sides
    val edges = edgesL.collect {
      case (l, r, w) if rankRMap.get(r).exists(_.contains(l)) =>
        // encode left preference in the shared weight; right preference is
        // installed below by overriding rankR
        E(l, r, w)
    }
    val nLeft = prefLTiers.size; val nRight = prefRTiers.size
    stronglyStableCore(nLeft, nRight, edges,
      (r: Int, l: Int) => rankRMap.getOrElse(r, Map.empty).getOrElse(l, Double.NegativeInfinity))
  }

  // ------------------------------------------------------- strong stability

  /** Hopcroft-Karp maximum bipartite matching on adjacency lists
    * (left -> rights). Returns matchL (right index or -1 per left).
    */
  def hopcroftKarp(nLeft: Int, nRight: Int, adj: Array[List[Int]]): Array[Int] = {
    val INF = Int.MaxValue
    val matchL = Array.fill(nLeft)(-1)
    val matchR = Array.fill(nRight)(-1)
    val dist = Array.fill(nLeft)(INF)

    def bfs(): Boolean = {
      val q = mutable.Queue.empty[Int]
      var found = false
      for (l <- 0 until nLeft) {
        if (matchL(l) < 0) { dist(l) = 0; q.enqueue(l) } else dist(l) = INF
      }
      while (q.nonEmpty) {
        val l = q.dequeue()
        adj(l).foreach { r =>
          val l2 = matchR(r)
          if (l2 < 0) found = true
          else if (dist(l2) == INF) { dist(l2) = dist(l) + 1; q.enqueue(l2) }
        }
      }
      found
    }

    def dfs(l: Int): Boolean = {
      adj(l).exists { r =>
        val l2 = matchR(r)
        if (l2 < 0 || (dist(l2) == dist(l) + 1 && dfs(l2))) {
          matchL(l) = r; matchR(r) = l; true
        } else false
      } || { dist(l) = Int.MaxValue; false }
    }

    while (bfs()) for (l <- 0 until nLeft) if (matchL(l) < 0) dfs(l)
    matchL
  }

  /** Strongly stable matching (Irving '94): repeatedly build the head-tier
    * proposal graph, find a maximum matching, delete dominated edges via the
    * critical set, until the proposal graph admits a perfect-on-proposers
    * matching. Returns matched (l, r) pairs; empty tiers simply leave nodes
    * unmatched. O(|V|^2.5) per the published bound.
    */
  def stronglyStable(nLeft: Int, nRight: Int, edges: Seq[E]): Seq[(Int, Int)] = {
    val byEdge = edges.map(e => (e.r, e.l) -> e.w).toMap
    stronglyStableCore(nLeft, nRight, edges,
      (r, l) => byEdge.getOrElse((r, l), Double.NegativeInfinity))
  }

  private def stronglyStableCore(nLeft: Int, nRight: Int, edges: Seq[E],
                                 rightWeight: (Int, Int) => Double): Seq[(Int, Int)] = {
    // mutable tiered preference structures
    val prefL: Array[mutable.Buffer[mutable.Set[Int]]] =
      rankings(nLeft, edges, byLeft = true).map(_.map(t => mutable.Set(t: _*)).toBuffer)
    val rankR = Array.fill(nRight)(mutable.Map.empty[Int, Double])
    edges.foreach(e => rankR(e.r)(e.l) = rightWeight(e.r, e.l))

    def deleteEdge(l: Int, r: Int): Unit = {
      prefL(l).foreach(_.remove(r)); rankR(r).remove(l)
    }

    var iter = 0
    val maxIters = (nLeft + nRight) * (nLeft + nRight) + 4
    while (iter < maxIters) {
      iter += 1
      // proposal graph: every left proposes to its entire head tier
      val adj = Array.fill(nLeft)(List.empty[Int])
      for (l <- 0 until nLeft) {
        val head = prefL(l).find(_.nonEmpty)
        adj(l) = head.map(_.toList.sorted).getOrElse(Nil)
      }
      val proposers = (0 until nLeft).filter(adj(_).nonEmpty)
      if (proposers.isEmpty) return Seq.empty
      // each proposed-to right deletes strictly-worse edges than its best proposer
      val proposedTo = adj.zipWithIndex.flatMap { case (rs, l) => rs.map(r => (r, l)) }
        .groupBy(_._1).map { case (r, ls) => (r, ls.map(_._2)) }
      var deleted = false
      proposedTo.foreach { case (r, ls) =>
        val best = ls.map(l => rankR(r).getOrElse(l, Double.NegativeInfinity)).max
        rankR(r).toList.foreach { case (l, w) =>
          if (w < best) { deleteEdge(l, r); deleted = true }
        }
      }
      if (!deleted) {
        // stable proposal graph: maximum matching on it is strongly stable
        val ml = hopcroftKarp(nLeft, nRight, adj)
        if (proposers.forall(ml(_) >= 0))
          return (0 until nLeft).collect { case l if ml(l) >= 0 => (l, ml(l)) }
        // critical set: proposers left unmatched by every maximum matching;
        // their head-tier rights delete their worst-tier edges
        val ml2 = ml
        val unmatched = proposers.filter(ml2(_) < 0)
        if (unmatched.isEmpty) return (0 until nLeft).collect { case l if ml2(l) >= 0 => (l, ml2(l)) }
        var del2 = false
        unmatched.foreach { l =>
          adj(l).foreach { r =>
            // r rejects its weakest current tier
            if (rankR(r).nonEmpty) {
              val worst = rankR(r).values.min
              rankR(r).toList.foreach { case (l2, w) =>
                if (w == worst) { deleteEdge(l2, r); del2 = true }
              }
            }
          }
        }
        if (!del2) return (0 until nLeft).collect { case l if ml2(l) >= 0 => (l, ml2(l)) }
      }
    }
    Seq.empty
  }

  /** Max-weight-ish assignment used by collection similarity: weakly stable
    * matching, returning total matched weight (ref `MatchingSimilarity`
    * usage: Σ matched weight / max(|L|, |R|)).
    */
  def matchedWeight(nLeft: Int, nRight: Int, edges: Seq[E]): Double = {
    val wmap = edges.map(e => (e.l, e.r) -> e.w).toMap
    weaklyStable(nLeft, nRight, edges).map(p => wmap.getOrElse(p, 0.0)).sum
  }
}
