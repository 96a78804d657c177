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
    if (sink == 42L) println("sink") // consume
  }
}
