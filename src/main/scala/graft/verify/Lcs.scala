package graft.verify

/** Longest-common-substring via a suffix automaton of the shorter string —
  * O(|a| + |b|) time, O(|a|) states. The ST3 "expensive exact tier", the
  * near-dup analog of the reference's full-content hash stage
  * (/root/reference/src/process_matches.rs:267-288): only runs on pairs that
  * survived the cheap probabilistic tiers.
  */
object Lcs {

  /** Deterministic cap: only the first `MaxChars` chars of each side are
    * considered (web pages beyond this are decided by Jaccard/Hamming). */
  final val MaxChars = 20000

  def lcsLength(a0: String, b0: String): Int = {
    if (a0.isEmpty || b0.isEmpty) return 0
    var a = if (a0.length > MaxChars) a0.substring(0, MaxChars) else a0
    var b = if (b0.length > MaxChars) b0.substring(0, MaxChars) else b0
    if (a.length > b.length) { val t = a; a = b; b = t } // automaton on shorter
    val sam = new SuffixAutomaton(a)
    sam.longestMatch(b)
  }

  /** lcs_len / min(len_a, len_b) over the capped strings. */
  def lcsRatio(a: String, b: String): Double = {
    val la = math.min(a.length, MaxChars)
    val lb = math.min(b.length, MaxChars)
    val m = math.min(la, lb)
    if (m == 0) return 0.0
    lcsLength(a, b).toDouble / m
  }

  private final class SuffixAutomaton(s: String) {
    private val maxStates = 2 * s.length + 5
    private val len = new Array[Int](maxStates)
    private val link = new Array[Int](maxStates)
    private val trans = new Array[java.util.HashMap[Character, Integer]](maxStates)
    private var last = 0
    private var size = 1
    link(0) = -1
    trans(0) = new java.util.HashMap[Character, Integer]()

    s.foreach(extend)

    private def extend(c: Char): Unit = {
      val cur = size; size += 1
      len(cur) = len(last) + 1
      trans(cur) = new java.util.HashMap[Character, Integer]()
      var p = last
      while (p != -1 && !trans(p).containsKey(c)) {
        trans(p).put(c, cur)
        p = link(p)
      }
      if (p == -1) {
        link(cur) = 0
      } else {
        val q = trans(p).get(c)
        if (len(p) + 1 == len(q)) {
          link(cur) = q
        } else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          trans(clone) = new java.util.HashMap[Character, Integer](trans(q))
          while (p != -1 && trans(p).get(c) == q) {
            trans(p).put(c, clone)
            p = link(p)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
    }

    /** Longest substring of `b` that is a substring of `s`. */
    def longestMatch(b: String): Int = {
      var v = 0; var l = 0; var best = 0
      var i = 0
      while (i < b.length) {
        val c = b.charAt(i)
        while (v != 0 && !trans(v).containsKey(c)) {
          v = link(v); l = len(v)
        }
        if (trans(v).containsKey(c)) {
          v = trans(v).get(c); l += 1
        } else { // v == 0 with no transition on c: restart
          v = 0; l = 0
        }
        if (l > best) best = l
        i += 1
      }
      best
    }
  }
}
