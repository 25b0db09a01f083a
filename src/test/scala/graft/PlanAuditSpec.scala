package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan audit: every SparkEntry query's plan at
  * sf0.001 is swept for the two anti-patterns that do not survive a 100×
  * scale-up — `CartesianProduct` (quadratic row build) and
  * `Exchange SinglePartition` (all data through one task). PlanSpec gates
  * individual operators' shapes in depth; this sweep guarantees no FUTURE
  * catalog entry silently ships either pattern.
  *
  * Whitelist (each entry carries its justification):
  *  - ann_topk / emb_pairs: LABELED exact O(n²) oracle anchors (broadcast
  *    nested-loop by design; the scale paths are their ann-family and
  *    dd_semantic siblings). They stay listed so a third quadratic query
  *    cannot hide behind them.
  */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("plan-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val sfDir = "/root/testdata/sf0.001"

  private val quadraticAnchors = Set("ann_topk", "emb_pairs")

  test("no catalog query plans a CartesianProduct or a SinglePartition " +
    "exchange (exact-baseline anchors excepted)") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("Exchange SinglePartition") &&
          !quadraticAnchors.contains(name))
        offenders += s"$name: Exchange SinglePartition"
      if (plan.contains("BroadcastNestedLoopJoin") &&
          !quadraticAnchors.contains(name))
        offenders += s"$name: BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty,
      s"scale anti-patterns in catalog plans:\n${offenders.mkString("\n")}")
  }
}
