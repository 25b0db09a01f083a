package graft.gen

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic audio table for the audio feature-extract
  * operator. Like [[VideoGen]], the container is a DELIBERATE STUB for a
  * real decoder (no AV libs ship in this container): a 16-byte header
  * (magic 'GAUD', sample_rate, n_samples, reserved int) followed by
  * n_samples of 16-bit signed little-endian mono PCM. Samples are a
  * two-tone sine mixture plus seeded noise — deterministic per
  * (seed, clip index, sample), so the oracle's per-clip truth is computed
  * straight from the sample function without touching the encoded bytes.
  */
object AudioGen {

  val Magic = 0x47415544 // "GAUD"

  final case class AudioRecord(audio_id: String, bytes: Array[Byte],
                               sample_rate: Int, n_samples: Int)
  final case class ClipMeta(audio_id: String, sample_rate: Int, n_samples: Int,
                            sum_abs: Long, peak: Int, zero_crossings: Long)

  private def shape(seed: Long, i: Long): (Int, Int) = {
    val rate = Array(8000, 16000, 22050)(((ImageGen.mix(seed, i, 401) >>> 8) % 3).toInt)
    val n = 2000 + ((ImageGen.mix(seed, i, 402) >>> 8) % 6000).toInt // 2k..8k samples
    (rate, n)
  }

  /** Sample s of clip i: two detuned sines (periods from the mix) plus
    * ±512 seeded noise, clamped to 16-bit range.
    */
  def sample(seed: Long, i: Long, s: Int): Short = {
    val p1 = 40 + (ImageGen.mix(seed, i, 403) & 0x3F).toInt  // 40..103
    val p2 = 200 + (ImageGen.mix(seed, i, 404) & 0xFF).toInt // 200..455
    val a = (9000 * math.sin(2 * math.Pi * s / p1)).toInt
    val b = (6000 * math.sin(2 * math.Pi * s / p2)).toInt
    val noise = (ImageGen.mix(seed, i, 9000L + s) & 0x3FF).toInt - 512
    math.max(-32768, math.min(32767, a + b + noise)).toShort
  }

  def record(seed: Long, i: Long): AudioRecord = {
    val (rate, n) = shape(seed, i)
    val bytes = new Array[Byte](16 + 2 * n)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic); bb.putInt(rate); bb.putInt(n); bb.putInt(0)
    var s = 0
    while (s < n) { bb.putShort(sample(seed, i, s)); s += 1 }
    AudioRecord(f"aud$i%08d", bytes, rate, n)
  }

  /** Oracle truth from the sample function (never the encoded bytes). */
  def clipMeta(seed: Long, i: Long): ClipMeta = {
    val (rate, n) = shape(seed, i)
    var sumAbs = 0L; var peak = 0; var zc = 0L
    var prev = 0
    var s = 0
    while (s < n) {
      val v = sample(seed, i, s).toInt
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      if (s > 0 && ((prev >= 0 && v < 0) || (prev < 0 && v >= 0))) zc += 1
      prev = v
      s += 1
    }
    ClipMeta(f"aud$i%08d", rate, n, sumAbs, peak, zc)
  }

  def generate(spark: SparkSession, n: Long, seed: Long = 13L,
               partitions: Int = 8): Dataset[AudioRecord] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).mapPartitions(_.map(i => record(seed, i)))
  }

  // ------------------------------------------- corpus with planted dupes

  /** Window width (samples) of the audio dedup signature. Planted trims
    * are WINDOW-ALIGNED (like [[VideoGen]]'s frame-aligned trims) so the
    * content signatures of the surviving audio are bit-identical to the
    * base's — the content-addressed property the dedup exploits.
    */
  val SigWin = 500

  /** Which window range of the base clip a duplicate re-posts: exact
    * repost / leading window trimmed / trailing window trimmed. Clips have
    * 2000..8000 samples → 4..16 full windows, so a trim leaves ≥ 3.
    */
  private def dupSpan(seed: Long, i: Long, nSamples: Int): (Int, Int) = {
    val nw = nSamples / SigWin
    ((ImageGen.mix(seed, i, 411) >>> 8) % 3).toInt match {
      case 0 => (0, nw)
      case 1 => (1, nw)
      case _ => (0, nw - 1)
    }
  }

  /** Corpus row: indices [0, nOrig) are the originals of [[record]];
    * indices ≥ nOrig re-container a seeded base clip's samples over a
    * [[dupSpan]] window range under a new id.
    */
  def recordCorpus(seed: Long, i: Long, nOrig: Long): AudioRecord = {
    if (i < nOrig) record(seed, i)
    else {
      val base = (ImageGen.mix(seed, i, 410) >>> 8) % nOrig
      val (rate, nb) = shape(seed, base)
      val (from, until) = dupSpan(seed, i, nb)
      val n = (until - from) * SigWin
      val bytes = new Array[Byte](16 + 2 * n)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(Magic); bb.putInt(rate); bb.putInt(n); bb.putInt(0)
      var s = from * SigWin
      while (s < until * SigWin) { bb.putShort(sample(seed, base, s)); s += 1 }
      AudioRecord(f"aud$i%08d", bytes, rate, n)
    }
  }

  def generateCorpus(spark: SparkSession, n: Long, nOrig: Long, seed: Long = 13L,
                     partitions: Int = 8): Dataset[AudioRecord] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions)
      .mapPartitions(_.map(i => recordCorpus(seed, i, nOrig)))
  }

  final case class WinMeta(audio_id: String, idx: Int, win_sum: Long)

  /** Per-window truth (sum of |sample| over each full [[SigWin]] window)
    * computed from the sample function alone — never the encoded bytes.
    */
  def winMeta(seed: Long, i: Long): Seq[WinMeta] = {
    val (_, n) = shape(seed, i)
    (0 until n / SigWin).map { w =>
      var sum = 0L
      var s = w * SigWin
      while (s < (w + 1) * SigWin) { sum += math.abs(sample(seed, i, s).toInt); s += 1 }
      WinMeta(f"aud$i%08d", w, sum)
    }
  }

  /** Corpus truth: duplicates carry the base's window sums over their
    * span, re-indexed from 0 — exactly what decoding must reproduce.
    */
  def winMetaCorpus(seed: Long, i: Long, nOrig: Long): Seq[WinMeta] = {
    if (i < nOrig) winMeta(seed, i)
    else {
      val base = (ImageGen.mix(seed, i, 410) >>> 8) % nOrig
      val (_, nb) = shape(seed, base)
      val (from, until) = dupSpan(seed, i, nb)
      winMeta(seed, base).slice(from, until).zipWithIndex.map {
        case (m, idx) => WinMeta(f"aud$i%08d", idx, m.win_sum)
      }
    }
  }

  def generateCorpusWinMeta(spark: SparkSession, n: Long, nOrig: Long,
                            seed: Long = 13L,
                            partitions: Int = 8): Dataset[WinMeta] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).flatMap(i => winMetaCorpus(seed, i, nOrig))
  }

  def generateMeta(spark: SparkSession, n: Long, seed: Long = 13L,
                   partitions: Int = 8): Dataset[ClipMeta] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => clipMeta(seed, i))
  }
}
