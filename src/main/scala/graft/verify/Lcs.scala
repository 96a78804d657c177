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

  /** Transitions are per-state parallel primitive arrays (chars + targets)
    * with linear scan — states have low out-degree on natural text, and this
    * avoids the boxed-HashMap allocation that dominated the original hot
    * loop (verify is the pipeline's CPU-bound stage). */
  private final class SuffixAutomaton(s: String) {
    private val maxStates = 2 * s.length + 5
    private val len = new Array[Int](maxStates)
    private val link = new Array[Int](maxStates)
    private val tChars = new Array[Array[Char]](maxStates)
    private val tTo = new Array[Array[Int]](maxStates)
    private val tN = new Array[Int](maxStates)
    private var last = 0
    private var size = 1
    link(0) = -1

    private def find(st: Int, c: Char): Int = {
      val cs = tChars(st)
      if (cs == null) return -1
      var i = 0
      val n = tN(st)
      while (i < n) {
        if (cs(i) == c) return tTo(st)(i)
        i += 1
      }
      -1
    }

    private def putT(st: Int, c: Char, to: Int): Unit = {
      val cs = tChars(st)
      val n = tN(st)
      var i = 0
      while (i < n) {
        if (cs(i) == c) { tTo(st)(i) = to; return }
        i += 1
      }
      if (cs == null || n == cs.length) {
        val newCap = if (cs == null) 4 else cs.length * 2
        val nc = new Array[Char](newCap); val nt = new Array[Int](newCap)
        if (cs != null) { System.arraycopy(cs, 0, nc, 0, n); System.arraycopy(tTo(st), 0, nt, 0, n) }
        tChars(st) = nc; tTo(st) = nt
      }
      tChars(st)(n) = c; tTo(st)(n) = to; tN(st) = n + 1
    }

    private def copyTrans(from: Int, to: Int): Unit = {
      val n = tN(from)
      if (n > 0) {
        tChars(to) = java.util.Arrays.copyOf(tChars(from), math.max(n, 4))
        tTo(to) = java.util.Arrays.copyOf(tTo(from), math.max(n, 4))
        tN(to) = n
      }
    }

    { var i = 0; while (i < s.length) { extend(s.charAt(i)); i += 1 } }

    private def extend(c: Char): Unit = {
      val cur = size; size += 1
      len(cur) = len(last) + 1
      var p = last
      while (p != -1 && find(p, c) == -1) {
        putT(p, c, cur)
        p = link(p)
      }
      if (p == -1) {
        link(cur) = 0
      } else {
        val q = find(p, c)
        if (len(p) + 1 == len(q)) {
          link(cur) = q
        } else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          copyTrans(q, clone)
          while (p != -1 && find(p, c) == q) {
            putT(p, c, clone)
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
        var nxt = find(v, c)
        while (v != 0 && nxt == -1) {
          v = link(v); l = len(v)
          nxt = find(v, c)
        }
        if (nxt != -1) {
          v = nxt; l += 1
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
