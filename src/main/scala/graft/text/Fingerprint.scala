package graft.text

import graft.util.Hashing

/** Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003): rolling-hash every char k-gram, then keep the minimum hash
  * of each sliding window of w consecutive k-gram hashes (rightmost-min
  * rule). The selected set is a deterministic, position-independent
  * fingerprint: any shared substring of length >= k + w - 1 guarantees a
  * shared selected hash.
  *
  * The copy-detection analog of the reference's prefix-checksum cheap tier
  * (/root/reference/src/process_matches.rs:255-264): a sublinear sketch that
  * over-approximates containment, refined by exact tiers afterwards.
  */
object Fingerprint {

  final val DefaultK = 8
  final val DefaultW = 16

  /** Polynomial rolling hashes of every k-gram (base 1000003, mod 2^64). */
  def kgramHashes(s: String, k: Int): Array[Long] = {
    val n = s.length
    if (n < k) {
      return if (n == 0) Array.empty else Array(Hashing.hashString(s, 0xf17e5eedL))
    }
    val base = 1000003L
    var pow = 1L // base^(k-1)
    var i = 1
    while (i < k) { pow *= base; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * base + s.charAt(i); i += 1 }
    out(0) = mix(h)
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * pow) * base + s.charAt(i)
      out(i - k + 1) = mix(h)
      i += 1
    }
    out
  }

  /** Finalizer so raw polynomial states are well-spread before comparing. */
  @inline private def mix(h: Long): Long = Hashing.splitMix64(h)

  /** Winnowing selection: distinct sorted minima of each w-window
    * (unsigned comparison throughout — the short-input path must agree with
    * the windowed path or the shared-substring guarantee breaks at the
    * length boundary). */
  def winnow(hashes: Array[Long], w: Int): Array[Long] = {
    if (hashes.isEmpty) return Array.empty
    if (hashes.length <= w) {
      var m = hashes(0)
      var i = 1
      while (i < hashes.length) {
        if (java.lang.Long.compareUnsigned(hashes(i), m) <= 0) m = hashes(i)
        i += 1
      }
      return Array(m)
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start + w <= hashes.length) {
      var minIdx = start
      var i = start + 1
      while (i < start + w) {
        // rightmost minimum for robustness (paper's rule)
        if (java.lang.Long.compareUnsigned(hashes(i), hashes(minIdx)) <= 0) minIdx = i
        i += 1
      }
      sel.add(hashes(minIdx))
      start += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** The full fingerprint set of a text. */
  def fingerprints(s: String, k: Int = DefaultK, w: Int = DefaultW): Array[Long] =
    winnow(kgramHashes(s, k), w)

  /** Single 64-bit digest of the fingerprint set (order-sensitive fold of
    * the sorted set => deterministic). */
  def fingerprint64(s: String, k: Int = DefaultK, w: Int = DefaultW): Long = {
    val fp = fingerprints(s, k, w)
    Hashing.hashLongs(fp, 0, fp.length, 0xf17e5eedL)
  }

  /** Jaccard over two fingerprint sets (containment estimate). */
  def fingerprintJaccard(a: Array[Long], b: Array[Long]): Double =
    graft.signatures.MinHasher.jaccardSorted(a, b)
}
