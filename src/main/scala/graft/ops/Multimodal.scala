package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.ImageGen

/** Multimodal (binary-payload) operators: decode / feature-extract /
  * resize-sample over an opaque `bytes` column with typed metadata — the
  * Spark-side plumbing a 100 TB image pipeline needs.
  *
  * Decoding is REAL (JDK ImageIO: png/bmp/jpeg), not stubbed — batched per
  * partition (`mapPartitions`, the JVM analog of `mapInPandas` batch
  * shape), so decoder setup amortizes and the binary column never shuffles:
  * decode happens in the scan stage, only small features leave it.
  */
object Multimodal {

  final case class ImageFeatures(
      image_id: String, fmt: String, w: Int, h: Int,
      decode_ok: Boolean, mean_luma: Double, phash64: Long,
      phash_dct: Long, dhash_grad: Long, pixel_sha: String,
      thumb8: Array[Byte])

  /** Decode + per-image features. Input needs (image_id, bytes, fmt). */
  def decodeFeatures(images: DataFrame): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("image_id"), col("fmt"), col("bytes"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, fmt, bytes) =>
          try {
            val (w, h, px) = ImageGen.decode(bytes)
            var luma = 0.0
            var i = 0
            while (i < px.length) {
              val p = px(i)
              luma += 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
              i += 1
            }
            // 8x8 grayscale thumbnail ("resize" output kept tiny and typed)
            val thumb = new Array[Byte](64)
            val cell = new Array[Double](64)
            val cnt = new Array[Int](64)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = px(y * w + x)
                val g = 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
                val c = (y * 8 / h) * 8 + (x * 8 / w)
                cell(c) += g; cnt(c) += 1
                x += 1
              }
              y += 1
            }
            var c = 0
            while (c < 64) { thumb(c) = (cell(c) / math.max(cnt(c), 1)).toByte; c += 1 }
            ImageFeatures(id, fmt, w, h, decode_ok = true, luma / px.length,
              ImageGen.averageHash(px, w, h), PHash.dctHash64(px, w, h),
              PHash.dHash64(px, w, h), PHash.pixelSha(px, w, h), thumb)
          } catch {
            // NonFatal + IOException only: swallowing OOM/fatal errors as
            // "decode failed" rows would hide real executor trouble
            case e if scala.util.control.NonFatal(e) =>
              ImageFeatures(id, fmt, -1, -1, decode_ok = false, 0.0, 0L, 0L, 0L, "", Array.empty)
          }
        }
      }
  }

  final case class SampledFrame(
      video_id: String, frame_idx: Int, w: Int, h: Int, luma_sum: Long)

  /** Frame sampling over a video-shaped binary column: demux the container
    * (the deterministic [[graft.gen.VideoGen]] stub format — a real
    * pipeline swaps in an FFmpeg-style demuxer here, same signature), keep
    * every `everyN`-th frame, and emit one small typed row per sampled
    * frame. The 100 TB shape is the same as image decode: the binary
    * column is consumed inside `mapPartitions` in the scan stage and never
    * shuffles — only (id, frame_idx, stats) rows leave it, and the output
    * grows by frames/everyN, not by payload bytes. Malformed containers
    * (bad magic / truncated payload) yield no frames rather than garbage
    * sums.
    */
  def frameSample(videos: DataFrame, everyN: Int): Dataset[SampledFrame] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("video_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
          if (bytes.length < 16 || bb.getInt() != graft.gen.VideoGen.Magic) Iterator.empty
          else {
            val w = bb.getInt(); val h = bb.getInt(); val f = bb.getInt()
            val frameBytes = w.toLong * h
            // each dimension must be positive individually (w=h=-1 gives a
            // positive product), and frameBytes must fit the payload BEFORE
            // the f*frameBytes product so the product cannot overflow Long
            // (both factors then bounded by bytes.length <= Int.MaxValue)
            if (w <= 0 || h <= 0 || f < 0 || frameBytes > bytes.length - 16L ||
                16L + f * frameBytes != bytes.length)
              Iterator.empty
            else (0 until f by everyN).iterator.map { fr =>
              var s = 0L
              var p = 16 + fr * frameBytes.toInt
              val end = p + frameBytes.toInt
              while (p < end) { s += bytes(p) & 0xFF; p += 1 }
              SampledFrame(id, fr, w, h, s)
            }
          }
        }
      }
  }

  /** Near-duplicate VIDEO detection over frame signatures — the video
    * analog of document n-gram Jaccard (the clipped-repost / re-container
    * case exact byte hashing misses). Decode each container once
    * ([[frameSample]] stride 1: bytes die in the scan stage), reduce every
    * video to its DISTINCT frame-signature set, inverted-index videos by
    * shared signature (bucket-capped — a degenerate signature like an
    * all-black frame would otherwise pair quadratically), and keep pairs
    * whose signature-set Jaccard clears `threshold`.
    *
    * Scale shape: payload bytes never shuffle — after decode, a video is
    * (id, sig) rows. One exchange each for the per-video distinct, the
    * signature self-join (both sides co-partitioned on sig), and the pair
    * rollup; the per-video counts ride the distinct's partitioning. Trimmed
    * reposts survive because Jaccard over frame SETS degrades gently with
    * clipping ((f-2)/f for a 2-frame trim), while the threshold kills
    * accidental single-frame collisions.
    */
  def videoDupes(videos: DataFrame, threshold: Double, cap: Int): DataFrame = {
    val sigs = frameSample(videos, 1).toDF()
      .select(col("video_id"), col("luma_sum").as("sig")).distinct()
    sigJaccardPairs(sigs, "video_id", threshold, cap)
  }

  /** Capped inverted-index Jaccard over distinct per-item signature sets
    * (`sigs` = (idCol, sig)) — the shared tail of [[videoDupes]] and
    * [[audioDupes]]: bucket-capped signature join, shared-count rollup,
    * Jaccard threshold. Emits (<id>1, <id>2, n_common, n1, n2, jaccard).
    */
  private[graft] def sigJaccardPairs(sigs: DataFrame, idCol: String,
                                     threshold: Double, cap: Int): DataFrame = {
    val id1 = s"${idCol}1"; val id2 = s"${idCol}2"
    val cnt = sigs.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val keyOk = sigs.groupBy(col("sig")).agg(count(lit(1)).as("bn"))
      .where(col("bn").between(2, cap)).select(col("sig"))
    val inter = sigs.join(keyOk, Seq("sig"))
      .select(col("sig"), col(idCol).as(id1))
      .join(sigs.select(col("sig"), col(idCol).as(id2)), Seq("sig"))
      .where(col(id1) < col(id2))
      .groupBy(col(id1), col(id2))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(cnt.select(col(idCol).as(id1), col("n").as("n1")), Seq(id1))
      .join(cnt.select(col(idCol).as(id2), col("n").as("n2")), Seq(id2))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
      .where(col("jaccard") >= threshold)
      .select(col(id1), col(id2), col("n_common"),
        col("n1"), col("n2"), col("jaccard"))
  }

  final case class AudioWindow(audio_id: String, idx: Int, win_sum: Long)

  /** Per-window loudness signatures of the PCM container: sum of |sample|
    * over each full `win`-sample window — the content-addressed audio
    * analog of the per-frame luma signature. Bytes are consumed at the
    * scan; only (id, idx, 8-byte sum) rows leave. Malformed clips drop.
    */
  def audioWindows(audios: DataFrame, win: Int): Dataset[AudioWindow] = {
    val spark = audios.sparkSession
    import spark.implicits._
    audios.select(col("audio_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          if (bytes.length < 16 || bb.getInt() != graft.gen.AudioGen.Magic) Iterator.empty
          else {
            bb.getInt() // rate
            val n = bb.getInt()
            if (n < 0 || 16L + 2L * n != bytes.length) Iterator.empty
            else (0 until n / win).iterator.map { w =>
              var sum = 0L
              var s = w * win
              while (s < (w + 1) * win) {
                sum += math.abs(bb.getShort(16 + 2 * s).toInt)
                s += 1
              }
              AudioWindow(id, w, sum)
            }
          }
        }
      }
  }

  /** Near-duplicate audio detection — the clipped-repost shape over PCM:
    * reduce each clip to its DISTINCT window-loudness signature set
    * ([[audioWindows]]; trims shift window INDICES but signatures are
    * content-addressed, so a trimmed repost keeps most of its set), then
    * the same capped inverted-index Jaccard as [[videoDupes]]. Decode
    * once; clip bytes never shuffle — only (id, sig) rows.
    */
  def audioDupes(audios: DataFrame, threshold: Double, cap: Int,
                 win: Int = graft.gen.AudioGen.SigWin): DataFrame = {
    val sigs = audioWindows(audios, win).toDF()
      .select(col("audio_id"), col("win_sum").as("sig")).distinct()
    sigJaccardPairs(sigs, "audio_id", threshold, cap)
  }

  final case class AudioFeatures(
      audio_id: String, sample_rate: Int, n_samples: Int,
      sum_abs: Long, peak: Int, zero_crossings: Long)

  /** Audio feature extraction over a PCM-shaped binary column: decode the
    * [[graft.gen.AudioGen]] container (stub for a real decoder, same
    * signature) and emit per-clip integer-exact loudness/activity features
    * — sum of |sample| (the integer core of RMS), peak amplitude, and
    * zero-crossing count (the classic cheap voicing/noisiness signal).
    * Same 100 TB shape as the image/video paths: bytes consumed inside
    * `mapPartitions` at the scan, only small typed rows leave the stage.
    * Malformed clips (bad magic / truncated) are dropped.
    */
  def audioFeatures(audios: DataFrame): Dataset[AudioFeatures] = {
    val spark = audios.sparkSession
    import spark.implicits._
    audios.select(col("audio_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          if (bytes.length < 16 || bb.getInt() != graft.gen.AudioGen.Magic) None
          else {
            val rate = bb.getInt(); val n = bb.getInt(); bb.getInt()
            if (n < 0 || 16L + 2L * n != bytes.length) None
            else {
              var sumAbs = 0L; var peak = 0; var zc = 0L
              var prev = 0
              var s = 0
              while (s < n) {
                val v = bb.getShort(16 + 2 * s).toInt
                val a = math.abs(v)
                sumAbs += a
                if (a > peak) peak = a
                if (s > 0 && ((prev >= 0 && v < 0) || (prev < 0 && v >= 0))) zc += 1
                prev = v
                s += 1
              }
              Some(AudioFeatures(id, rate, n, sumAbs, peak, zc))
            }
          }
        }
      }
  }

  /** Exact image deduplication by decoded-pixel content key: one row per
    * distinct pixel content, with the copy count and the minimum image_id
    * as the deterministic representative. The image analog of dd_exact —
    * but keyed on [[PHash.pixelSha]] of the DECODED pixels, so lossless
    * re-encodes (png <-> bmp) collapse too, which byte-hashing misses.
    *
    * 100 TB shape: the sha is computed in the decode scan stage (features
    * already carry it), so the only shuffle is a partial-aggregated
    * groupBy on a 64-char key — the multi-TB binary column never moves.
    */
  def exactPixelDedup(feats: Dataset[ImageFeatures]): DataFrame =
    feats.toDF().where(col("decode_ok"))
      .groupBy(col("pixel_sha"))
      .agg(count(lit(1)).as("n_copies"), min(col("image_id")).as("rep_id"))

  /** Aggregate decode statistics per format — the pipeline health check. */
  def formatStats(feats: Dataset[ImageFeatures]): DataFrame =
    feats.toDF().groupBy(col("fmt")).agg(
      count(lit(1)).as("n"),
      sum(when(col("decode_ok"), 1L).otherwise(0L)).as("n_ok"),
      min(col("w")).as("min_w"), max(col("w")).as("max_w"),
      avg(col("mean_luma")).as("avg_luma"))

  /** Oracle-checkable decode statistics: every column is derived from the
    * DECODED pixels/dimensions, and must reproduce the generator's intended
    * metadata exactly (the DuckDB oracle aggregates the emitted metadata
    * side table) — a real end-to-end decode gate, integer-exact. Luma-style
    * float stats stay in [[formatStats]] (asserted in OpsSpec instead).
    */
  /** Per-quadrant dHash decode stage for partial-duplicate detection
    * ([[graft.ops.PHash.tileDHashes]]): bytes are consumed HERE and only
    * (id, 4 tile hashes, decode_ok) rows flow on — the same
    * never-shuffle-the-binary discipline as [[decodeFeatures]]. Malformed
    * inputs survive as decode_ok = false rows, never task failures.
    */
  def decodeTileHashes(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("image_id"), col("bytes")).as[(String, Array[Byte])]
      .map { case (id, bytes) =>
        try {
          val (w, h, px) = graft.gen.ImageGen.decode(bytes)
          val t = PHash.tileDHashes(px, w, h)
          (id, t(0), t(1), t(2), t(3), true)
        } catch { case scala.util.control.NonFatal(_) => (id, 0L, 0L, 0L, 0L, false) }
      }.toDF("id", "t0", "t1", "t2", "t3", "decode_ok")
  }

  def decodeStats(feats: Dataset[ImageFeatures]): DataFrame =
    feats.toDF().groupBy(col("fmt")).agg(
      count(lit(1)).as("n"),
      sum(when(col("decode_ok"), 1L).otherwise(0L)).as("n_ok"),
      min(col("w")).as("min_w"), max(col("w")).as("max_w"),
      min(col("h")).as("min_h"), max(col("h")).as("max_h"))
}
