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
    // warmup
    (1 to 200).foreach { _ => Lcs.lcsRatio(a, b); MinHasher.shingleHashes(a, 5) }
    var t0 = System.nanoTime()
    (1 to n).foreach(_ => MinHasher.shingleHashes(a, 5))
    println(f"shingles: ${(System.nanoTime()-t0)/1e6/n}%.3f ms/doc")
    val sa = MinHasher.shingleHashes(a, 5); val sb = MinHasher.shingleHashes(b, 5)
    t0 = System.nanoTime()
    (1 to n).foreach(_ => MinHasher.jaccardSorted(sa, sb))
    println(f"jaccard: ${(System.nanoTime()-t0)/1e6/n}%.3f ms/pair")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => Lcs.lcsRatio(a, b))
    println(f"lcs(${a.length} chars): ${(System.nanoTime()-t0)/1e6/n}%.3f ms/pair")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => MinHasher.simhash(sa))
    println(f"simhash: ${(System.nanoTime()-t0)/1e6/n}%.3f ms/doc")
  }
}
