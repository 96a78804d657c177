package graft

import graft.signatures.MinHasher
import graft.verify.Lcs

/** Temporary kernel microbenchmark. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = 1000
    val toks = (0 until 1100).map(i => s"tok${i * 7 % 997}")
    val a = toks.mkString(" ")
    val b = (toks.take(500) ++ Seq("zzz") ++ toks.drop(501)).mkString(" ")
    val sa = MinHasher.shingleHashes(a, 5); val sb = MinHasher.shingleHashes(b, 5)
    // warm every timed kernel past C2 thresholds; accumulate into a sink so
    // nothing is dead-code-eliminated
    val (pa, pb) = MinHasher.permParams(128, 42L)
    var sink = 0L
    (1 to 15000).foreach { _ =>
      sink ^= MinHasher.shingleHashes(a, 5).length
      sink ^= java.lang.Double.doubleToLongBits(MinHasher.jaccardSorted(sa, sb))
      sink ^= MinHasher.simhash(sa)
      sink ^= MinHasher.minhash(sa, pa, pb)(0)
    }
    (1 to 500).foreach(_ => sink ^= java.lang.Double.doubleToLongBits(Lcs.lcsRatio(a, b)))

    var t0 = System.nanoTime()
    (1 to n).foreach(_ => sink ^= MinHasher.shingleHashes(a, 5).length)
    println(f"shingles: ${(System.nanoTime()-t0)/1e6/n}%.3f ms/doc")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => sink ^= java.lang.Double.doubleToLongBits(MinHasher.jaccardSorted(sa, sb)))
    println(f"jaccard: ${(System.nanoTime()-t0)/1e6/n}%.3f ms/pair")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => sink ^= java.lang.Double.doubleToLongBits(Lcs.lcsRatio(a, b)))
    println(f"lcs(${a.length} chars): ${(System.nanoTime()-t0)/1e6/n}%.3f ms/pair")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => sink ^= MinHasher.simhash(sa))
    println(f"simhash: ${(System.nanoTime()-t0)/1e6/n}%.3f ms/doc")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => sink ^= MinHasher.minhash(sa, pa, pb)(0))
    println(f"minhash128: ${(System.nanoTime()-t0)/1e6/n}%.3f ms/doc")

    // winnow: the O(n) monotonic-deque kernel vs the boxed-TreeSet +
    // O(n*w) window-rescan implementation it replaced (round 5) — the
    // before-side lives here so the delta stays measurable.
    val wk = graft.text.Fingerprint.kgramHashes(a, graft.text.Fingerprint.DefaultK)
    val w = graft.text.Fingerprint.DefaultW
    def winnowTreeSet(hashes: Array[Long], w: Int): Array[Long] = {
      if (hashes.isEmpty) return Array.empty
      val sel = new java.util.TreeSet[java.lang.Long]()
      if (hashes.length <= w) {
        var m = hashes(0); var i = 1
        while (i < hashes.length) {
          if (java.lang.Long.compareUnsigned(hashes(i), m) <= 0) m = hashes(i)
          i += 1
        }
        sel.add(m)
      } else {
        var i = 0
        while (i + w <= hashes.length) {
          var m = hashes(i); var j = i + 1
          while (j < i + w) {
            if (java.lang.Long.compareUnsigned(hashes(j), m) <= 0) m = hashes(j)
            j += 1
          }
          sel.add(m); i += 1
        }
      }
      val out = new Array[Long](sel.size())
      val it = sel.iterator(); var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
    require(java.util.Arrays.equals(
      graft.text.Fingerprint.winnow(wk, w), winnowTreeSet(wk, w)))
    (1 to 5000).foreach { _ =>
      sink ^= graft.text.Fingerprint.winnow(wk, w).length
      sink ^= winnowTreeSet(wk, w).length
    }
    t0 = System.nanoTime()
    (1 to n).foreach(_ => sink ^= graft.text.Fingerprint.winnow(wk, w).length)
    println(f"winnow deque (${wk.length} grams, w=$w): ${(System.nanoTime()-t0)/1e6/n}%.3f ms/doc")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => sink ^= winnowTreeSet(wk, w).length)
    println(f"winnow treeset (${wk.length} grams, w=$w): ${(System.nanoTime()-t0)/1e6/n}%.3f ms/doc")
    if (sink == 42L) println("sink") // consume
  }
}
