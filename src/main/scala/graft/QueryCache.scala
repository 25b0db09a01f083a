package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memoization of shared query stages.
  *
  * Several catalog queries share expensive sub-plans: the word-ngram
  * inverted-index edge set feeds `dd_ngram_jaccard`, `classify_rules`,
  * `cc_clusters`, `fuse_canonical` and `refine_clusters`. Without sharing,
  * each query recomputes the full shingle->index->pair->verify tree
  * (round-1 bench: 271 s of 491 s was recomputation). A production engine
  * would checkpoint the edge stage once per run (app/Checkpoints does for
  * the pipeline); for the catalog, results are persisted per
  * (session, stage, input-dir) and reused — identical plans, computed once.
  *
  * Keyed by `SparkSession.sessionUUID` so a new session (or a different
  * input dir) never sees stale data; entries are dropped when a different
  * session appears (benches create sessions sequentially).
  */
object QueryCache {

  private val cache = new ConcurrentHashMap[String, DataFrame]()

  def memo(spark: SparkSession, stage: String, dir: String)(build: => DataFrame): DataFrame = {
    val sid = s"${spark.sparkContext.applicationId}:${System.identityHashCode(spark)}"
    val key = s"$sid|$stage|$dir"
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      // evict entries from other sessions — and unpersist them, because the
      // owning CONTEXT may still be alive (sessions share a SparkContext):
      // without the unpersist each retired session leaks its persisted
      // blocks for the life of the JVM. Stopped contexts throw; swallowed.
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (!e.getKey.startsWith(sid + "|")) {
          scala.util.Try(e.getValue.unpersist(false))
          it.remove()
        }
      }
      // NOT computeIfAbsent: stages nest (cc_assign builds ngram_scored
      // builds ngram_shs), and nested computeIfAbsent on one
      // ConcurrentHashMap throws "Recursive update" when keys share a bin.
      // A benign double-build race is acceptable; the loser unpersists.
      val built = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = cache.putIfAbsent(key, built)
      if (prev != null) { built.unpersist(false); prev } else built
    }
  }
}
