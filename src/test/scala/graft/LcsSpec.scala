package graft

import graft.verify.Lcs

class LcsSpec extends SparkSpec {

  private def bruteLcs(a: String, b: String): Int = {
    // O(n*m) DP over common suffix lengths
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    var best = 0
    for (i <- 1 to a.length; j <- 1 to b.length) {
      if (a.charAt(i - 1) == b.charAt(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    }
    best
  }

  test("known answers") {
    assert(Lcs.lcsLength("abcdef", "zabcy") == 3) // "abc"
    assert(Lcs.lcsLength("abab", "baba") == 3)
    assert(Lcs.lcsLength("xyz", "abc") == 0)
    assert(Lcs.lcsLength("same", "same") == 4)
    assert(Lcs.lcsLength("", "abc") == 0)
  }

  test("matches brute-force oracle on random strings") {
    val rnd = new scala.util.Random(99)
    (1 to 200).foreach { _ =>
      val a = (1 to (1 + rnd.nextInt(60))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val b = (1 to (1 + rnd.nextInt(60))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      assert(Lcs.lcsLength(a, b) == bruteLcs(a, b), s"a=$a b=$b")
    }
  }

  test("ratio is lcs over min length") {
    assert(Lcs.lcsRatio("abcd", "abzz") == 0.5)
    assert(Lcs.lcsRatio("same text here", "same text here") == 1.0)
  }
}
