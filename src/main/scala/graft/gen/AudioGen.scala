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

  def generateMeta(spark: SparkSession, n: Long, seed: Long = 13L,
                   partitions: Int = 8): Dataset[ClipMeta] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => clipMeta(seed, i))
  }
}
