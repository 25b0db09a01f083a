package graft.gen

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.ImageRecord
import graft.sig.Signatures

/** Deterministic synthetic image+caption table (FIXTURES.md §1) matching
  * BASELINE.json's input_hint shape: (image_id, bytes, w, h, fmt, caption,
  * phash). Everything derives from (seed, index) so the generator is
  * embarrassingly parallel — `spark.range(n).mapPartitions` — and any row is
  * reproducible in isolation (for the PSNR/caption per-row invariants).
  *
  * Images are real encodings via JDK ImageIO (png/bmp lossless, jpeg lossy
  * at q=0.95); pixels are a smooth two-gradient field plus seeded low-noise —
  * compressible enough that JPEG stays above the 40 dB PSNR invariant.
  *
  * Duplicate injection (gold truth in `gold_cluster`):
  *  - exact: same pixels + caption, new id (ref analog exact_duplicates.csv)
  *  - caption-edit: 1-3 token edits -> MinHash/Jaccard path
  *  - substring: base caption embedded in a longer caption -> substring pass
  *  - lossy: same pixels re-encoded as jpeg, caption lightly edited ->
  *    phash/SimHash path
  * Cluster sizes: mostly pairs/triples via round-robin bases, plus two big
  * clusters (~1/40 of rows each) to hit the refine big-cluster path and the
  * giant-component guard.
  */
object ImageGen {

  final case class GenRecord(
      image_id: String, bytes: Array[Byte], w: Int, h: Int, fmt: String,
      caption: String, phash: Long, gold_cluster: String)

  private val words: Array[String] = Array(
    "amber", "basalt", "cedar", "dune", "ember", "fjord", "garnet", "harbor",
    "iris", "juniper", "krill", "lagoon", "meadow", "nectar", "onyx", "prairie",
    "quartz", "reef", "sable", "tundra", "umber", "violet", "willow", "xenon",
    "yarrow", "zephyr", "cliff", "delta", "grove", "marsh")

  /** Deterministic 64-bit mix of (seed, i, salt) — splitmix64. */
  def mix(seed: Long, i: Long, salt: Long): Long = {
    var z = seed ^ (i * 0x9E3779B97F4A7C15L) ^ (salt * 0xC2B2AE3D27D4EB4FL)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // --------------------------------------------------------------- caption

  def baseCaption(seed: Long, i: Long): String = {
    val n = 8 + (mix(seed, i, 1) & 0x7).toInt * 2 // 8..22 words
    (0 until n).map(j => words(((mix(seed, i, 2 + j) >>> 8) % words.length).toInt))
      .mkString(" ")
  }

  /** 1-3 deterministic token substitutions. */
  def editCaption(caption: String, seed: Long, i: Long): String = {
    val toks = caption.split(" ")
    val edits = 1 + (mix(seed, i, 50) & 1).toInt + (mix(seed, i, 51) & 1).toInt
    (0 until edits).foreach { e =>
      val pos = ((mix(seed, i, 60 + e) >>> 8) % toks.length).toInt
      toks(pos) = words(((mix(seed, i, 70 + e) >>> 8) % words.length).toInt)
    }
    toks.mkString(" ")
  }

  def embedCaption(caption: String, seed: Long, i: Long): String = {
    val pre = (0 until 3).map(j => words(((mix(seed, i, 80 + j) >>> 8) % words.length).toInt))
    val post = (0 until 3).map(j => words(((mix(seed, i, 90 + j) >>> 8) % words.length).toInt))
    (pre :+ caption).mkString(" ") + " " + post.mkString(" ")
  }

  // ---------------------------------------------------------------- pixels

  /** Structurally diverse but JPEG-friendly pixels: per-base signed
    * gradients, a low-frequency sinusoid, and mild seeded noise — enough 8x8
    * structure variation that phashes are high-entropy (as in real corpora),
    * low enough frequency content that q=0.95 JPEG stays above 40 dB PSNR.
    */
  def pixels(seed: Long, base: Long, w: Int, h: Int): Array[Int] = {
    val px = new Array[Int](w * h)
    val gx = (mix(seed, base, 3) % 256).toInt - 128
    val gy = (mix(seed, base, 4) % 256).toInt - 128
    val fx = 1 + ((mix(seed, base, 10) >>> 8) % 3).toInt
    val fy = 1 + ((mix(seed, base, 11) >>> 8) % 3).toInt
    val phase = ((mix(seed, base, 12) >>> 8) % 628).toInt / 100.0
    val amp = 32 + ((mix(seed, base, 13) >>> 8) % 48).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val wave = (amp * math.sin(2 * math.Pi * (fx * x.toDouble / w + fy * y.toDouble / h) + phase)).toInt
        val noise = (mix(seed, base, 1000L + y.toLong * w + x) & 0x7).toInt - 4
        val r = clamp(128 + x * gx / w + wave / 2 + noise)
        val g = clamp(128 + y * gy / h + wave + noise)
        val b = clamp(128 + (x * gx / w + y * gy / h) / 2 - wave / 2 + noise)
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    px
  }

  private def clamp(v: Int): Int = math.max(0, math.min(255, v))

  // ------------------------------------------------------------ encode/decode

  def encode(px: Array[Int], w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    fmt match {
      case "jpg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(0.95f)
        val ios = new MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
        ios.flush(); writer.dispose()
      case f => ImageIO.write(img, f, bos)
    }
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    (w, h, img.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xFFFFFF))
  }

  def psnr(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length)
    var se = 0.0
    var i = 0
    while (i < a.length) {
      var c = 0
      while (c < 3) {
        val d = ((a(i) >> (8 * c)) & 0xFF) - ((b(i) >> (8 * c)) & 0xFF)
        se += d.toDouble * d
        c += 1
      }
      i += 1
    }
    val mse = se / (a.length * 3)
    if (mse == 0) Double.PositiveInfinity else 10 * math.log10(255.0 * 255.0 / mse)
  }

  /** Average-hash: 8x8 grayscale downsample, bit = above mean. Shared by the
    * generator and the oracle (FIXTURES.md §1 phash row).
    */
  def averageHash(px: Array[Int], w: Int, h: Int): Long = {
    val cell = new Array[Double](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val gray = 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
        cell((y * 8 / h) * 8 + (x * 8 / w)) += gray
        x += 1
      }
      y += 1
    }
    val mean = cell.sum / 64
    var out = 0L
    var i = 0
    while (i < 64) { if (cell(i) > mean) out |= (1L << i); i += 1 }
    out
  }

  // ------------------------------------------------------------- generator

  private val fmts = Array("png", "bmp", "jpg")

  /** Build record #i deterministically. Layout for n rows:
    *  - [0, 0.6n): originals (gold cluster = self)
    *  - [0.6n, 0.6n+n/40): dups of base 0 (big cluster A)
    *  - [..., +n/60): dups of base 1 (big cluster B)
    *  - rest: dups of base (mix % 0.6n), type cycling exact/edit/substr/lossy
    */
  def record(seed: Long, i: Long, n: Long): GenRecord = {
    val nOrig = (n * 6 / 10).max(1)
    val bigA = n / 40
    val bigB = n / 60
    val id = f"img$i%010d"
    val w = 32 + (mix(seed, i, 5) & 0x1F).toInt
    val h = 32 + (mix(seed, i, 6) & 0x1F).toInt

    // originals
    if (i < nOrig) {
      val px = pixels(seed, i, w, h)
      val fmt = fmts(((mix(seed, i, 7) >>> 8) % 2).toInt) // originals: png/bmp (lossless)
      GenRecord(id, encode(px, w, h, fmt), w, h, fmt, baseCaption(seed, i),
        averageHash(px, w, h), f"img${i}%010d")
    } else {
      val base: Long =
        if (i < nOrig + bigA) 0L
        else if (i < nOrig + bigA + bigB) 1L
        else (mix(seed, i, 8) >>> 8) % nOrig
      val dupType = ((mix(seed, i, 9) >>> 8) % 4).toInt
      val bw = 32 + (mix(seed, base, 5) & 0x1F).toInt
      val bh = 32 + (mix(seed, base, 6) & 0x1F).toInt
      val px = pixels(seed, base, bw, bh)
      val cap0 = baseCaption(seed, base)
      val (fmt, caption) = dupType match {
        case 0 => ("png", cap0)                          // exact
        case 1 => ("bmp", editCaption(cap0, seed, i))    // caption edits
        case 2 => ("png", embedCaption(cap0, seed, i))   // substring
        case _ => ("jpg", editCaption(cap0, seed, i))    // lossy + edits
      }
      GenRecord(id, encode(px, bw, bh, fmt), bw, bh, fmt, caption,
        averageHash(px, bw, bh), f"img${base}%010d")
    }
  }

  /** Distributed generation: n rows, gold cluster column included. */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               partitions: Int = 32): Dataset[GenRecord] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).mapPartitions(_.map(i => record(seed, i, n)))
  }

  /** Composite (partial-duplicate) record #j for an n-row corpus: a fresh
    * canvas (latent base 1e6+j — disjoint from every full-image latent)
    * whose NW quadrant is copied VERBATIM from original (j mod nOrig),
    * matching that original's canvas dims so quadrant geometry aligns;
    * encoded lossless (png) so decode returns the planted pixels exactly.
    * This is the region-reuse shape (collage / meme / watermarked repost)
    * that tile-level hashing detects and whole-image hashing cannot.
    */
  def compositeRecord(seed: Long, j: Long, n: Long): GenRecord = {
    val nOrig = (n * 6 / 10).max(1)
    val b = j % nOrig
    val bw = 32 + (mix(seed, b, 5) & 0x1F).toInt
    val bh = 32 + (mix(seed, b, 6) & 0x1F).toInt
    val basePx = pixels(seed, b, bw, bh)
    val px = pixels(seed, 1000000L + j, bw, bh)
    val hw = bw / 2; val hh = bh / 2
    var y = 0
    while (y < hh) { System.arraycopy(basePx, y * bw, px, y * bw, hw); y += 1 }
    val id = f"cmp$j%010d"
    GenRecord(id, encode(px, bw, bh, "png"), bw, bh, "png",
      "composite " + baseCaption(seed, 1000000L + j), averageHash(px, bw, bh), id)
  }

  /** nc composite records over the same (seed, n) corpus as [[generate]]. */
  def generateComposites(spark: SparkSession, nc: Long, n: Long, seed: Long = 42L,
                         partitions: Int = 8): Dataset[GenRecord] = {
    import spark.implicits._
    spark.range(0, nc, 1, partitions).mapPartitions(_.map(j => compositeRecord(seed, j, n)))
  }

  def asImages(ds: Dataset[GenRecord]): Dataset[ImageRecord] = {
    import ds.sparkSession.implicits._
    ds.map(r => ImageRecord(r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash))
  }
}
