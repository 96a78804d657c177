package graft.similarity

import graft.util.Hashing

/** Pure embedding kernels for similarity search (training-data ops beyond the
  * reference — SURVEY.md §2 graft additions). Deterministic functions of
  * (vector, config): no clock, no unseeded randomness, so signatures and
  * bucket keys are invariant under row order and partitioning, exactly like
  * the MinHash tier (graft.signatures.MinHasher).
  */
object EmbeddingKernels {

  /** L2-normalize to doubles; the zero vector stays zero. */
  def normalize(v: Array[Float]): Array[Double] = {
    val out = new Array[Double](v.length)
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) return out
    i = 0
    while (i < v.length) { out(i) = v(i) / n; i += 1 }
    out
  }

  def dot(a: Array[Double], b: Array[Double]): Double = {
    // Mismatched dimensions are a DATA error (mixed encoder versions, a
    // truncated row): a silent prefix-dot would be a plausible-but-wrong
    // similarity flowing into knn ranks and near-dup verify thresholds.
    require(a.length == b.length,
      s"embedding dimension mismatch: ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cosine of two raw float vectors (normalizes internally). */
  def cosine(a: Array[Float], b: Array[Float]): Double =
    dot(normalize(a), normalize(b))

  /** Deterministic random hyperplanes: `bits` rows of `dim` ~N(0,1)-ish
    * components (sum of 4 uniforms, Irwin–Hall — good enough for sign LSH),
    * derived from SplitMix64(seed). Pure in (dim, bits, seed). */
  def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val planes = new Array[Array[Double]](bits)
    var s = seed ^ 0x51a7e5eedL
    var b = 0
    while (b < bits) {
      val row = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var k = 0
        while (k < 4) {
          s = Hashing.splitMix64(s)
          // map to (-0.5, 0.5): unsigned top 53 bits as uniform [0,1)
          acc += ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5
          k += 1
        }
        row(i) = acc
        i += 1
      }
      planes(b) = row
      b += 1
    }
    planes
  }

  /** One 64-bit bucket key per LSH band: the band's `rowsPerBand` sign bits
    * folded with the band index (same key-shape as MinHasher.bandHashes so
    * the candidate-join machinery is shared). bits = bands * rowsPerBand may
    * exceed 64 — signs are never packed into one word. */
  def signBandKeys(
      unit: Array[Double],
      planes: Array[Array[Double]],
      bands: Int
  ): Array[Long] = {
    val bits = planes.length
    val rows = bits / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0x9e3779b9L + b
      var r = 0
      while (r < rows) {
        val s = if (dot(unit, planes(b * rows + r)) >= 0) 1L else 0L
        key = graft.util.Hashing.hashLong(s, key)
        r += 1
      }
      out(b) = key
      b += 1
    }
    out
  }
}
