package graft.gen

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic "video" table for the frame-sample operator.
  *
  * No AV codec library ships in this container, so the container format is
  * a DELIBERATE STUB standing in for a real demuxer (the brief's sanctioned
  * shape: fake the codec, make the Spark-side plumbing — schema,
  * partitioning, batch iteration — real): a video is a 16-byte header
  * (magic 'GVID', w, h, n_frames as big-endian ints) followed by n_frames
  * raw 8-bit grayscale frames of w*h bytes each. Every byte derives from
  * (seed, video index, frame, pixel) via splitmix, so any frame is
  * reproducible in isolation and the per-frame oracle metadata can be
  * emitted without storing frames twice.
  */
object VideoGen {

  val Magic = 0x47564944 // "GVID"

  final case class VideoRecord(video_id: String, bytes: Array[Byte],
                               w: Int, h: Int, n_frames: Int)
  final case class FrameMeta(video_id: String, frame_idx: Int, luma_sum: Long)

  private def dims(seed: Long, i: Long): (Int, Int, Int) = {
    val w = 16 + (ImageGen.mix(seed, i, 301) & 0xF).toInt      // 16..31
    val h = 12 + (ImageGen.mix(seed, i, 302) & 0x7).toInt      // 12..19
    val f = 8 + ((ImageGen.mix(seed, i, 303) >>> 8) % 17).toInt // 8..24 frames
    (w, h, f)
  }

  /** One frame's pixel byte: a slow per-frame drift over a per-video
    * gradient plus seeded noise — enough frame-to-frame variation that
    * sampling bugs (wrong stride, off-by-one frame offsets) change sums.
    */
  private def pixel(seed: Long, i: Long, frame: Int, w: Int, x: Int, y: Int): Byte = {
    val base = 96 + ((x * 64 / w) + frame * 3) % 128
    val noise = (ImageGen.mix(seed, i, 5000L + frame.toLong * 65536L + y.toLong * w + x) & 0xF).toInt
    ((base + noise) & 0xFF).toByte
  }

  def record(seed: Long, i: Long): VideoRecord = {
    val (w, h, f) = dims(seed, i)
    val bytes = new Array[Byte](16 + f * w * h)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(Magic); bb.putInt(w); bb.putInt(h); bb.putInt(f)
    var fr = 0
    while (fr < f) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { bb.put(pixel(seed, i, fr, w, x, y)); x += 1 }
        y += 1
      }
      fr += 1
    }
    VideoRecord(f"vid$i%08d", bytes, w, h, f)
  }

  /** The oracle's per-frame truth, computed WITHOUT touching the encoded
    * bytes (straight from the pixel function) — the query must reproduce
    * it from the decoded container.
    */
  def frameMeta(seed: Long, i: Long): Seq[FrameMeta] = {
    val (w, h, f) = dims(seed, i)
    (0 until f).map { fr =>
      var s = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { s += pixel(seed, i, fr, w, x, y) & 0xFF; x += 1 }
        y += 1
      }
      FrameMeta(f"vid$i%08d", fr, s)
    }
  }

  def generate(spark: SparkSession, n: Long, seed: Long = 11L,
               partitions: Int = 8): Dataset[VideoRecord] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).mapPartitions(_.map(i => record(seed, i)))
  }

  // ------------------------------------------- corpus with planted dupes

  /** Which frame range of the base video a duplicate re-posts: exact
    * repost / leading trim / trailing trim (the classic clipped-repost
    * shapes). f >= 8 by [[dims]], so a trim always leaves >= 6 frames.
    */
  private def dupSlice(seed: Long, i: Long, f: Int): (Int, Int) =
    ((ImageGen.mix(seed, i, 311) >>> 8) % 3).toInt match {
      case 0 => (0, f)     // exact repost
      case 1 => (2, f)     // leading frames trimmed
      case _ => (0, f - 2) // trailing frames trimmed
    }

  /** Corpus row: indices [0, nOrig) are the originals of [[record]];
    * indices >= nOrig are planted near-duplicates — a seeded base video's
    * frames re-containered over a [[dupSlice]] range under a new id.
    */
  def recordCorpus(seed: Long, i: Long, nOrig: Long): VideoRecord = {
    if (i < nOrig) record(seed, i)
    else {
      val base = (ImageGen.mix(seed, i, 310) >>> 8) % nOrig
      val (w, h, f) = dims(seed, base)
      val (from, until) = dupSlice(seed, i, f)
      val nf = until - from
      val bytes = new Array[Byte](16 + nf * w * h)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.putInt(Magic); bb.putInt(w); bb.putInt(h); bb.putInt(nf)
      var fr = from
      while (fr < until) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { bb.put(pixel(seed, base, fr, w, x, y)); x += 1 }
          y += 1
        }
        fr += 1
      }
      VideoRecord(f"vid$i%08d", bytes, w, h, nf)
    }
  }

  def generateCorpus(spark: SparkSession, n: Long, nOrig: Long, seed: Long = 11L,
                     partitions: Int = 8): Dataset[VideoRecord] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions)
      .mapPartitions(_.map(i => recordCorpus(seed, i, nOrig)))
  }

  /** Per-frame truth for the corpus (originals + duplicates), computed from
    * the pixel function alone — duplicates carry the base's luma sums over
    * their slice, re-indexed from 0, exactly what decoding their container
    * must reproduce.
    */
  def frameMetaCorpus(seed: Long, i: Long, nOrig: Long): Seq[FrameMeta] = {
    if (i < nOrig) frameMeta(seed, i)
    else {
      val base = (ImageGen.mix(seed, i, 310) >>> 8) % nOrig
      val (_, _, f) = dims(seed, base)
      val (from, until) = dupSlice(seed, i, f)
      frameMeta(seed, base).slice(from, until).zipWithIndex.map {
        case (m, idx) => FrameMeta(f"vid$i%08d", idx, m.luma_sum)
      }
    }
  }

  def generateCorpusMeta(spark: SparkSession, n: Long, nOrig: Long, seed: Long = 11L,
                         partitions: Int = 8): Dataset[FrameMeta] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).flatMap(i => frameMetaCorpus(seed, i, nOrig))
  }

  def generateMeta(spark: SparkSession, n: Long, seed: Long = 11L,
                   partitions: Int = 8): Dataset[FrameMeta] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).flatMap(i => frameMeta(seed, i))
  }
}
