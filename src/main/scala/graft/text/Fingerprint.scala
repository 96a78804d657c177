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
    * length boundary).
    *
    * O(n) monotonic index deque (each index is pushed and popped at most
    * once), allocation-free in the hot loop — this is a per-document kernel,
    * so the constant factor matters at corpus scale. Rightmost-minimum rule
    * (the paper's robust-winnowing tie-break) falls out of popping EQUAL
    * values from the deque back: the newest of equal minima always wins.
    * Output order/dedup matches the previous TreeSet exactly: distinct
    * values, SIGNED ascending (the downstream merge in jaccardSorted and
    * the order-sensitive fingerprint64 fold both key on this order). */
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
    val n = hashes.length
    val deque = new Array[Int](w) // ring buffer of candidate indices
    var head = 0 // logical positions; index = pos % w
    var tail = 0 // exclusive
    val sel = new Array[Long](n - w + 1) // one selection per window, pre-dedup
    var nSel = 0
    var i = 0
    while (i < n) {
      val v = hashes(i)
      // evict the front if it fell out of window [i-w+1, i] BEFORE pushing:
      // keeps the live span <= w-1 pre-push, so the ring never overflows
      if (tail > head && deque(head % w) <= i - w) head += 1
      // pop back while back value >= v (equal pops too -> rightmost min)
      while (tail > head && java.lang.Long.compareUnsigned(hashes(deque((tail - 1) % w)), v) >= 0)
        tail -= 1
      deque(tail % w) = i; tail += 1
      if (i >= w - 1) {
        val m = hashes(deque(head % w))
        // consecutive windows usually share their minimum: cheap pre-dedup
        if (nSel == 0 || sel(nSel - 1) != m) { sel(nSel) = m; nSel += 1 }
      }
      i += 1
    }
    java.util.Arrays.sort(sel, 0, nSel) // signed order, as TreeSet produced
    var j = 0
    var k = 1
    while (k < nSel) {
      if (sel(k) != sel(j)) { j += 1; sel(j) = sel(k) }
      k += 1
    }
    java.util.Arrays.copyOfRange(sel, 0, j + 1)
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
