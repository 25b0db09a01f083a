package graft.ops

/** DCT perceptual hash — the classic pHash construction (Zauner 2010,
  * "Implementation and Benchmarking of Perceptual Image Hash Functions"):
  * box-downsample the grayscale image to 32x32, take the 2D DCT-II, keep
  * the top-left 8x8 low-frequency block, and threshold each AC coefficient
  * against the median of the 63 AC coefficients.
  *
  * Why it earns its place next to [[graft.gen.ImageGen.averageHash]]:
  * low-frequency DCT energy survives JPEG requantization and mild blur,
  * and the construction is invariant to global luma scaling (DCT is
  * linear, so a positive gain scales every coefficient AND their median —
  * comparisons unchanged) and to brightness offset (an additive constant
  * lands entirely in the DC term, which is excluded). The average-hash
  * thresholds raw spatial means, so the same edits flip its bits.
  *
  * Cost: O(w*h) downsample + separable 8xN/8x8 DCT ≈ 2*8*32*32 ≈ 16k
  * multiply-adds per image — decode-stage cost, computed in the same
  * mapPartitions batch as ImageIO ([[Multimodal.decodeFeatures]]), so
  * nothing extra shuffles at 100 TB: the binary column still never leaves
  * the scan stage.
  *
  * Bit layout: bit (v*8+u) of the result covers DCT coefficient (u,v) in
  * the 8x8 block; bit 0 (the DC position) is always 0 — hamming distances
  * therefore range over the 63 AC bits.
  */
object PHash {
  private val N = 32

  /** DCT-II basis, basis(u)(x) = cos((2x+1) * u * pi / (2N)). */
  private val basis: Array[Array[Double]] =
    Array.tabulate(8, N)((u, x) => math.cos((2 * x + 1) * u * math.Pi / (2.0 * N)))

  /** Difference hash (dHash, Krawetz 2013 "Kind of Like That"): box-
    * downsample the grayscale image to a 9x8 grid and set bit (y*8+x) iff
    * the cell right of (x,y) is brighter than (x,y) — 8 horizontal
    * gradient signs per row, 64 bits total.
    *
    * It complements [[dctHash64]]: dHash keys on the SIGN of local spatial
    * gradients (robust to global luma/contrast changes, sensitive to
    * content rearrangement), pHash on low-frequency spectral energy
    * (robust to requantization/blur). Real pipelines run both and union
    * the candidate pairs — different near-duplicate geometries survive
    * different hashes. Same decode-stage cost profile: O(w*h) downsample
    * computed inside the scan's mapPartitions batch, nothing extra
    * shuffles.
    */
  def dHash64(px: Array[Int], w: Int, h: Int): Long = {
    val cols = 9; val rows = 8
    val cell = new Array[Double](cols * rows)
    val cnt = new Array[Int](cols * rows)
    var y = 0
    while (y < h) {
      val cy = y * rows / h
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val gray = 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
        val c = cy * cols + (x * cols / w)
        cell(c) += gray; cnt(c) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < cols * rows) { if (cnt(i) > 0) cell(i) /= cnt(i); i += 1 }
    var out = 0L
    var cy = 0
    while (cy < rows) {
      var cx = 0
      while (cx < cols - 1) {
        if (cell(cy * cols + cx + 1) > cell(cy * cols + cx))
          out |= (1L << (cy * 8 + cx))
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Per-quadrant dHashes (NW, NE, SW, SE) — region-level perceptual keys
    * for PARTIAL-duplicate detection (collage/meme/screenshot region
    * reuse): a copied quadrant keeps its tile hash bit-for-bit even when
    * the rest of the canvas is entirely different content, which any
    * whole-image hash averages away. The per-tile hash is the same
    * [[dHash64]] gradient geometry, so tile matching composes with the
    * existing pigeonhole bit-block blocking unchanged — one pass per tile
    * index, Hamming verify per tile.
    */
  def tileDHashes(px: Array[Int], w: Int, h: Int): Array[Long] = {
    val hw = w / 2; val hh = h / 2
    def sub(x0: Int, y0: Int, sw: Int, sh: Int): Long = {
      val s = new Array[Int](sw * sh)
      var y = 0
      while (y < sh) {
        System.arraycopy(px, (y0 + y) * w + x0, s, y * sw, sw)
        y += 1
      }
      dHash64(s, sw, sh)
    }
    Array(sub(0, 0, hw, hh), sub(hw, 0, w - hw, hh),
      sub(0, hh, hw, h - hh), sub(hw, hh, w - hw, h - hh))
  }

  /** Canonical content key of DECODED pixels: SHA-256 over (w, h, packed
    * 24-bit RGB rows) as lowercase hex. Two images get the same key iff
    * they decode to identical pixels — so it collapses exact copies AND
    * lossless re-encodes (png <-> bmp of the same pixels), which byte-level
    * hashing misses, while never collapsing lossy re-encodes.
    */
  def pixelSha(px: Array[Int], w: Int, h: Int): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hdr = java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array()
    md.update(hdr)
    val buf = new Array[Byte](px.length * 3)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      buf(3 * i) = ((p >> 16) & 0xFF).toByte
      buf(3 * i + 1) = ((p >> 8) & 0xFF).toByte
      buf(3 * i + 2) = (p & 0xFF).toByte
      i += 1
    }
    md.update(buf)
    md.digest().map(b => f"$b%02x").mkString
  }

  def dctHash64(px: Array[Int], w: Int, h: Int): Long = {
    // 1. grayscale box-downsample to 32x32 (same cell mapping as the
    //    8x8 average-hash, at 32x32 resolution)
    val g = new Array[Double](N * N)
    val cnt = new Array[Int](N * N)
    var y = 0
    while (y < h) {
      val cy = y * N / h
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val gray = 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
        val c = cy * N + (x * N / w)
        g(c) += gray; cnt(c) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < N * N) { if (cnt(i) > 0) g(i) /= cnt(i); i += 1 }

    // 2. separable 2D DCT-II, only the 8 lowest frequencies per axis:
    //    t(y,u) = sum_x g(y,x) basis(u)(x);  F(u,v) = sum_y t(y,u) basis(v)(y)
    val t = new Array[Double](N * 8)
    y = 0
    while (y < N) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        val b = basis(u)
        var x = 0
        while (x < N) { acc += g(y * N + x) * b(x); x += 1 }
        t(y * 8 + u) = acc
        u += 1
      }
      y += 1
    }
    val f = new Array[Double](64)
    var v = 0
    while (v < 8) {
      val b = basis(v)
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < N) { acc += t(yy * 8 + u) * b(yy); yy += 1 }
        f(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }

    // 3. median of the 63 AC coefficients; bit set iff coeff > median.
    //    63 values -> the median is element 31 of the sorted copy: a true
    //    middle element, so bits split ~31/32 — maximally informative.
    val ac = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var out = 0L
    i = 1
    while (i < 64) { if (f(i) > med) out |= (1L << i); i += 1 }
    out
  }
}
