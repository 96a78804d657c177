package graft

import graft.signatures.MinHasher

class MinHasherSpec extends SparkSpec {

  private def randText(rnd: scala.util.Random, n: Int): Array[String] =
    Array.fill(n)(s"w${rnd.nextInt(500)}")

  test("shingle hashes are a deterministic sorted set") {
    val t = "a b c d e f g h i j"
    val s1 = MinHasher.shingleHashes(t, 5)
    val s2 = MinHasher.shingleHashes(t, 5)
    assert(s1.toSeq == s2.toSeq)
    assert(s1.toSeq == s1.sorted.toSeq)
    assert(s1.length == 6) // 10 tokens, k=5 -> 6 shingles (all distinct here)
  }

  test("short texts fall back to a whole-text shingle") {
    assert(MinHasher.shingleHashes("one two", 5).length == 1)
    assert(MinHasher.shingleHashes("", 5).length == 1)
    // and equal short texts agree
    assert(MinHasher.shingleHashes("one two", 5).toSeq ==
      MinHasher.shingleHashes("one  two", 5).toSeq) // ws-insensitive tokens
  }

  test("minhash estimates Jaccard within 4 sigma (numPerm=128)") {
    val rnd = new scala.util.Random(123)
    val (a, b) = MinHasher.permParams(128, 42L)
    (1 to 20).foreach { _ =>
      val n = 150 + rnd.nextInt(100)
      val base = randText(rnd, n)
      val edits = rnd.nextInt(4) // 0..3 token replacements
      val other = base.clone()
      (1 to edits).foreach(e => other(rnd.nextInt(n)) = s"z$e${rnd.nextInt(1000)}")
      val sa = MinHasher.shingleHashes(base.mkString(" "), 5)
      val sb = MinHasher.shingleHashes(other.mkString(" "), 5)
      val trueJ = MinHasher.jaccardSorted(sa, sb)
      val est = MinHasher.estimateJaccard(
        MinHasher.minhash(sa, a, b), MinHasher.minhash(sb, a, b))
      val sigma = math.sqrt(trueJ * (1 - trueJ) / 128).max(0.01)
      assert(math.abs(est - trueJ) <= 4 * sigma,
        s"est=$est trueJ=$trueJ sigma=$sigma")
    }
  }

  test("identical texts have identical signatures and simhash") {
    val t = (1 to 200).map(i => s"tok$i").mkString(" ")
    val (a, b) = MinHasher.permParams(128, 42L)
    val s1 = MinHasher.shingleHashes(t, 5)
    val s2 = MinHasher.shingleHashes(t, 5)
    assert(MinHasher.minhash(s1, a, b).toSeq == MinHasher.minhash(s2, a, b).toSeq)
    assert(MinHasher.simhash(s1) == MinHasher.simhash(s2))
    assert(MinHasher.bandHashes(MinHasher.minhash(s1, a, b), 32).toSeq ==
      MinHasher.bandHashes(MinHasher.minhash(s2, a, b), 32).toSeq)
  }

  test("near-identical texts share most band hashes; unrelated share none") {
    val rnd = new scala.util.Random(7)
    val (a, b) = MinHasher.permParams(128, 42L)
    val base = randText(rnd, 200)
    val near = base.clone(); near(17) = "zzchanged"
    val far = randText(rnd, 200)
    def bandsOf(t: Array[String]) =
      MinHasher.bandHashes(MinHasher.minhash(MinHasher.shingleHashes(t.mkString(" "), 5), a, b), 32).toSet
    val bb = bandsOf(base)
    assert((bb intersect bandsOf(near)).nonEmpty)
    assert((bb intersect bandsOf(far)).isEmpty)
  }

  test("bit-sliced simhash equals the naive per-bit vote exactly") {
    // reference implementation: the straightforward 64-iteration vote loop
    def naive(shingles: Array[Long]): Long = {
      val votes = new Array[Int](64)
      shingles.foreach { h =>
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val rnd = new scala.util.Random(7)
    // sizes straddle the 255-shingle carry-save block boundary, plus ties
    // (even counts) and empty-adjacent cases
    for (size <- Seq(1, 2, 3, 254, 255, 256, 510, 511, 1000); trial <- 1 to 3) {
      val shingles = Array.fill(size)(rnd.nextLong())
      assert(MinHasher.simhash(shingles) == naive(shingles), s"size=$size trial=$trial")
    }
  }

  test("simhash hamming distance separates near from far") {
    val rnd = new scala.util.Random(11)
    val base = randText(rnd, 200)
    val near = base.clone(); near(3) = "zx"; near(99) = "zy"
    val far = randText(rnd, 200)
    def sh(t: Array[String]) = MinHasher.simhash(MinHasher.shingleHashes(t.mkString(" "), 5))
    val hNear = java.lang.Long.bitCount(sh(base) ^ sh(near))
    val hFar = java.lang.Long.bitCount(sh(base) ^ sh(far))
    assert(hNear <= 6, s"near hamming $hNear")
    assert(hFar > 10, s"far hamming $hFar")
  }
}
