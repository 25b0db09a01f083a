package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.app.Pipeline
import graft.block.Blocking
import graft.model.DedupConfig
import graft.sig.Signatures

/** Per-blocking-pass candidate volume + bucket skew report (dev tool). */
object PassStats {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(60000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = DedupConfig()
    val images = spark.read.parquet(s"/tmp/graft_bench_input_$n")
    val feats = Pipeline.features(images, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    feats.count()

    def report(name: String, keyed: org.apache.spark.sql.DataFrame): Unit = {
      val st = Blocking.bucketStats(keyed, cfg.maxBucketSize).head()
      val pairs = Blocking.pairsFromKeys(keyed, Some(cfg.maxBucketSize)).count()
      println(s"[pass] $name pairs=$pairs buckets=${st.getLong(0)} dropped=${st.getLong(1)} " +
        s"pairsDropped=${st.getLong(2)} maxBucket=${st.getLong(3)}")
    }

    val sig = Signatures.minHashFromIntHashesCol(col("shs"), cfg)
    report("lsh", feats.select(col("id"),
      explode(Signatures.bandHashKeysCol(sig, cfg.bands)).as("key")))
    report("simhash", feats.select(col("id"),
      explode(Blocking.packedBitBlockKeys(col("simhash"), cfg.simhashBits / cfg.simhashBandBits, cfg.simhashBits, 1L)).as("key")))
    report("phash", feats.select(col("id"),
      explode(Blocking.packedBitBlockKeys(col("phash"), cfg.phashBlocks, 64, 2L)).as("key")))
    val sub = Blocking.substringPairs(feats, "id", "norm", cfg.shingleK + 3, Some(cfg.maxBucketSize))
    println(s"[pass] substring pairs=${sub.count()}")
    val exact = Blocking.starPairsFromKeys(feats.select(col("id"), col("chash").as("key")))
    println(s"[pass] exact pairs=${exact.count()}")
    val all = Pipeline.candidates(feats, cfg)
    println(s"[pass] union-dedup pairs=${all.count()}")
    spark.stop()
  }
}
