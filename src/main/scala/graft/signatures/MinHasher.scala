package graft.signatures

import graft.util.Hashing

/** Pure signature kernels (ST1). Deterministic functions of (text, config) —
  * no state, no clock — so signatures are invariant under row order and
  * partitioning (tested at local[2] vs local[8]).
  *
  * Role analog: the reference's cheap-probabilistic-filter tier
  * (4 KiB prefix blake3, /root/reference/src/process_matches.rs:35,255-264)
  * generalized to near-dup text: k-token-shingle set -> MinHash signature ->
  * LSH band keys, plus a SimHash fingerprint for a Hamming-distance check.
  */
object MinHasher {

  final val ShingleSeed = 0x5ca1ab1eL
  final val TokenSeed = 0x7ea7L

  /** Distinct hashes of k-token shingles, sorted ascending (a set).
    * Tokens are maximal runs of non-whitespace; each token is xxh64-hashed,
    * then a shingle hash is the order-sensitive fold of its k token hashes.
    * Texts with fewer than k tokens contribute a single whole-text shingle
    * so short docs still participate.
    */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val tok = tokenHashes(text)
    if (tok.length == 0) return Array(Hashing.hashString("", ShingleSeed))
    if (tok.length < k) {
      return Array(Hashing.hashLongs(tok, 0, tok.length, ShingleSeed))
    }
    // primitive sort + in-place dedupe (no boxed TreeSet on the hot path)
    val raw = new Array[Long](tok.length - k + 1)
    var i = 0
    while (i + k <= tok.length) {
      raw(i) = Hashing.hashLongs(tok, i, i + k, ShingleSeed)
      i += 1
    }
    java.util.Arrays.sort(raw)
    var w = 1
    var r = 1
    while (r < raw.length) {
      if (raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    if (w == raw.length) raw else java.util.Arrays.copyOf(raw, w)
  }

  /** xxh64 of each whitespace-separated token's UTF-8 bytes, in order. */
  def tokenHashes(text: String): Array[Long] = {
    var arr = new Array[Long](64)
    var m = 0
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        if (m == arr.length) arr = java.util.Arrays.copyOf(arr, m * 2)
        arr(m) = Hashing.hashString(text.substring(start, i), TokenSeed)
        m += 1
      }
    }
    if (m == arr.length) arr else java.util.Arrays.copyOf(arr, m)
  }

  /** Per-permutation (a, b) parameters from SplitMix64(seed); a forced odd. */
  def permParams(numPerm: Int, seed: Long): (Array[Long], Array[Long]) = {
    val a = new Array[Long](numPerm)
    val b = new Array[Long](numPerm)
    var s = seed
    var i = 0
    while (i < numPerm) {
      s += 1; a(i) = Hashing.splitMix64(s) | 1L
      s += 1; b(i) = Hashing.splitMix64(s)
      i += 1
    }
    (a, b)
  }

  /** MinHash signature: sig(i) = min over shingles s of (a_i*s + b_i),
    * unsigned 64-bit comparison. */
  def minhash(shingles: Array[Long], a: Array[Long], b: Array[Long]): Array[Long] = {
    val p = a.length
    val sig = new Array[Long](p)
    var i = 0
    while (i < p) {
      val ai = a(i); val bi = b(i)
      var best = -1L // unsigned max
      var j = 0
      while (j < shingles.length) {
        val h = ai * shingles(j) + bi
        if (java.lang.Long.compareUnsigned(h, best) < 0) best = h
        j += 1
      }
      sig(i) = best
      i += 1
    }
    sig
  }

  /** 64-bit SimHash: unweighted bit-vote over the distinct shingle hashes.
    * Bit j of the result is 1 iff more shingles have bit j set than not;
    * exact ties resolve to 0 (deterministic).
    *
    * Accumulation is bit-sliced (carry-save adders over eight 64-bit
    * planes, flushed every 255 shingles): all 64 bit positions advance in
    * ~16 word ops per shingle instead of a 64-iteration branchy vote loop
    * — exact same counts, ~8x less work on the dominant ST1 kernel. */
  def simhash(shingles: Array[Long]): Long = {
    val ones = new Array[Int](64) // exact per-bit ones count
    val n = shingles.length
    var idx = 0
    while (idx < n) {
      val end = math.min(idx + 255, n) // 8 planes hold counts up to 255
      var c0 = 0L; var c1 = 0L; var c2 = 0L; var c3 = 0L
      var c4 = 0L; var c5 = 0L; var c6 = 0L; var c7 = 0L
      while (idx < end) {
        var h = shingles(idx)
        var carry = c0 & h; c0 ^= h; h = carry
        carry = c1 & h; c1 ^= h; h = carry
        carry = c2 & h; c2 ^= h; h = carry
        carry = c3 & h; c3 ^= h; h = carry
        carry = c4 & h; c4 ^= h; h = carry
        carry = c5 & h; c5 ^= h; h = carry
        carry = c6 & h; c6 ^= h; h = carry
        c7 ^= h
        idx += 1
      }
      var bit = 0
      while (bit < 64) {
        ones(bit) += ((((c0 >>> bit) & 1L)
          + (((c1 >>> bit) & 1L) << 1)
          + (((c2 >>> bit) & 1L) << 2)
          + (((c3 >>> bit) & 1L) << 3)
          + (((c4 >>> bit) & 1L) << 4)
          + (((c5 >>> bit) & 1L) << 5)
          + (((c6 >>> bit) & 1L) << 6)
          + (((c7 >>> bit) & 1L) << 7)).toInt)
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      // vote = ones - zeros = 2*ones - n; set the bit iff vote > 0
      if (2 * ones(bit) > n) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** One 64-bit key per LSH band: fold of the band's rows, seeded by the
    * band index so identical row-slices in different bands cannot collide
    * into one join key. */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    // Mirror GraftConfig's divisibility contract here too: callers
    // bypassing the config (direct kernel use) would otherwise silently
    // drop the trailing sig.length % bands positions from every band —
    // and bands > sig.length would give rows = 0, making EVERY document
    // share the identical per-band keys (all-pairs ST2 blowup).
    require(bands > 0 && sig.length >= bands && sig.length % bands == 0,
      s"signature length ${sig.length} must be a positive multiple of bands=$bands")
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      out(b) = Hashing.hashLongs(sig, b * rows, (b + 1) * rows, seed = 0x9e3779b9L + b)
      b += 1
    }
    out
  }

  /** Exact Jaccard of two sorted distinct hash arrays (merge scan). */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = a.length.toLong + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** MinHash Jaccard estimate (fraction of agreeing signature positions).
    * Signatures must come from the SAME numPerm config: comparing different
    * lengths is a data error (e.g. state written under an older config),
    * not a definable estimate. */
  def estimateJaccard(sigA: Array[Long], sigB: Array[Long]): Double = {
    require(sigA.length == sigB.length && sigA.length > 0,
      s"signature length mismatch or empty: ${sigA.length} vs ${sigB.length}")
    var agree = 0
    var i = 0
    while (i < sigA.length) { if (sigA(i) == sigB(i)) agree += 1; i += 1 }
    agree.toDouble / sigA.length
  }
}
