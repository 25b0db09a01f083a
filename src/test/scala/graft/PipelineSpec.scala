package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.app.Pipeline
import graft.gen.ImageGen
import graft.model.{Classification, DedupConfig}
import graft.sig.Signatures

/** End-to-end pipeline tests against the naive in-memory oracle
  * (FIXTURES.md §3, BASELINE.json north_rule: dup-pair recall >= 0.99 at
  * identical shingle/signature config) plus the per-row invariants
  * (decoded-pixel PSNR >= 40 dB for lossy, caption equality).
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("pipeline-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val cfg: DedupConfig = DedupConfig()
  val n = 1000L
  val seed = 42L

  // ------------------------------------- naive oracle (shared, main scope)

  import graft.gen.PipeOracle
  type OFeat = PipeOracle.OFeat

  def oracleFeatures(recs: Seq[ImageGen.GenRecord]): Seq[OFeat] =
    PipeOracle.oracleFeatures(recs, cfg)

  def oracleDuplicate(a: OFeat, b: OFeat): Boolean =
    PipeOracle.oracleDuplicate(a, b, cfg)

  def unionFind(ids: Seq[String], dupPairs: Seq[(String, String)]): Map[String, String] =
    PipeOracle.unionFind(ids, dupPairs)

  def intraPairs(assign: Map[String, String]): Set[(String, String)] =
    assign.groupBy(_._2).values.flatMap { m =>
      val ids = m.keys.toSeq.sorted
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
    }.toSet

  lazy val gen: Seq[ImageGen.GenRecord] =
    (0L until n).map(i => ImageGen.record(seed, i, n))

  lazy val oracleAssign: Map[String, String] = {
    val feats = oracleFeatures(gen)
    val pairs = for {
      i <- feats.indices; j <- i + 1 until feats.length
      if oracleDuplicate(feats(i), feats(j))
    } yield (feats(i).id, feats(j).id)
    unionFind(feats.map(_.id), pairs)
  }

  lazy val pipelineOut = {
    val images = ImageGen.asImages(ImageGen.generate(spark, n, seed, 8))
    val df = images.toDF()
    val feats = Pipeline.features(df, cfg).cache()
    val cands = Pipeline.candidates(feats, cfg)
    val scored = Pipeline.classified(feats, cands, cfg).cache()
    val assign0 = Pipeline.cluster(feats, scored)
    val refined = Pipeline.refine(assign0, feats, scored, cfg)
    val canon = Pipeline.fuse(images.toDF(), refined)
    (assign0, refined, canon, scored)
  }

  // ----------------------------------------------------------------- tests

  test("generator is deterministic and PSNR invariant holds per row") {
    val r1 = ImageGen.record(seed, 7L, n)
    val r2 = ImageGen.record(seed, 7L, n)
    assert(r1.caption == r2.caption && r1.bytes.sameElements(r2.bytes))
    gen.take(60).foreach { r =>
      val (w, h, px) = ImageGen.decode(r.bytes)
      assert(w == r.w && h == r.h, s"${r.image_id} dims")
      val orig = ImageGen.pixels(seed,
        if (r.gold_cluster == r.image_id) r.image_id.drop(3).toLong
        else r.gold_cluster.drop(3).toLong, w, h)
      val p = ImageGen.psnr(orig, px)
      if (r.fmt == "jpg") assert(p >= 40.0, s"${r.image_id} fmt=jpg psnr=$p")
      else assert(p == Double.PositiveInfinity, s"${r.image_id} fmt=${r.fmt} lossless psnr=$p")
    }
  }

  test("pipeline dup-pair recall vs naive oracle >= 0.99 (north_rule)") {
    val oraclePairs = intraPairs(oracleAssign)
    val got = pipelineOut._1.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val gotPairs = intraPairs(got)
    val recall = (gotPairs & oraclePairs).size.toDouble / math.max(oraclePairs.size, 1)
    val precision = (gotPairs & oraclePairs).size.toDouble / math.max(gotPairs.size, 1)
    info(s"oracle pairs=${oraclePairs.size} pipeline pairs=${gotPairs.size} " +
      s"recall=$recall precision=$precision")
    assert(recall >= 0.99, s"recall $recall below 0.99")
    assert(precision >= 0.95, s"precision $precision suspiciously low")
  }

  test("gold-cluster recall: planted duplicates are found") {
    val goldPairs = intraPairs(gen.map(r => r.image_id -> r.gold_cluster).toMap)
    val got = pipelineOut._1.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val gotPairs = intraPairs(got)
    val recall = (gotPairs & goldPairs).size.toDouble / math.max(goldPairs.size, 1)
    info(s"gold pairs=${goldPairs.size} found=${(gotPairs & goldPairs).size} recall=$recall")
    assert(recall >= 0.95, s"gold recall $recall")
  }

  test("recall holds at a second corpus size (n=3000): capture is not tuned to one n") {
    // The bit-block passes only GUARANTEE capture at Hamming <= 2 (simhash)
    // / <= 1 (phash); pairs in the 3..hammingThreshold band rely on the
    // cross-pass union (Model.scala capture contract). That coverage is
    // measured, so gate it at more than one corpus size — bucket occupancy
    // and cross-pass overlap both shift with n, and a retune that only
    // watches n=1000 could silently trade away the band.
    val n2 = 3000L
    val gen2 = (0L until n2).map(i => ImageGen.record(seed, i, n2))
    val feats2 = oracleFeatures(gen2)
    val oPairs = {
      val buf = Seq.newBuilder[(String, String)]
      for (i <- feats2.indices; j <- i + 1 until feats2.length)
        if (oracleDuplicate(feats2(i), feats2(j))) buf += ((feats2(i).id, feats2(j).id))
      buf.result()
    }
    val oracle2 = intraPairs(unionFind(feats2.map(_.id), oPairs))

    val df = ImageGen.asImages(ImageGen.generate(spark, n2, seed, 8)).toDF()
    val f = Pipeline.features(df, cfg).cache()
    f.count()
    val scored = Pipeline.classified(f, Pipeline.candidates(f, cfg), cfg).cache()
    val direct = scored.where(org.apache.spark.sql.functions.col("classification") ===
        Classification.Duplicate)
      .select("id1", "id2")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .map(p => if (p._1 < p._2) p else p.swap).toSet
    val assign = Pipeline.cluster(f, scored)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val gotPairs = intraPairs(assign)
    val recall = (gotPairs & oracle2).size.toDouble / math.max(oracle2.size, 1)
    val precision = (gotPairs & oracle2).size.toDouble / math.max(gotPairs.size, 1)
    val directRecall = (direct & oPairs.toSet).size.toDouble / math.max(oPairs.size, 1)
    info(f"n=$n2: oracle=${oracle2.size} got=${gotPairs.size} recall=$recall%.4f " +
      f"precision=$precision%.4f direct-capture=$directRecall%.4f")
    assert(recall >= 0.99, s"n=$n2 recall $recall below 0.99")
    assert(precision >= 0.95, s"n=$n2 precision $precision suspiciously low")
    f.unpersist(); scored.unpersist()
  }

  test("refine only splits, never merges (SURVEY.md §7.1.5)") {
    val before = pipelineOut._1.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val after = pipelineOut._2.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(before.keySet == after.keySet, "refine must preserve the record set")
    // every refined cluster is a subset of a TC cluster
    after.groupBy(_._2).values.foreach { m =>
      val tcClusters = m.keys.map(before).toSet
      assert(tcClusters.size == 1, s"refined cluster spans TC clusters: $tcClusters")
    }
  }

  test("fusion: every cluster yields one canonical; caption from members; singletons pass through") {
    val canon = pipelineOut._3.collect()
    val assign = pipelineOut._2.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon.length == assign.values.toSet.size)
    val capByIds = gen.map(r => r.image_id -> r.caption).toMap
    val members = assign.groupBy(_._2)
    canon.foreach { c =>
      val ms = members(c.cluster_id).keys.toSeq
      assert(ms.contains(c.image_id))
      assert(c.image_id == ms.min, "canonical id must be min member id")
      assert(ms.map(capByIds).contains(c.caption), "caption must come from a member")
      assert(c.fuse_errors.isEmpty, s"unexpected fusion errors: ${c.fuse_errors}")
    }
    val singleton = canon.filter(_.n_members == 1)
    singleton.take(20).foreach { c =>
      assert(c.caption == capByIds(c.image_id))
    }
  }

  test("classification cascade emits lineage explanations") {
    val byRule = pipelineOut._4.groupBy("explanation").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    info(s"rule firing counts: $byRule")
    assert(byRule.contains("exact-bytes"))
    assert(byRule.contains("weighted-default"))
    assert(byRule.keys.forall(Set("exact-bytes", "substring", "disjoint", "weighted-default")))
  }
}
