package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (lang-ID, quality
  * scoring, token counting) built from codegen'd builtin functions only —
  * no UDFs, no custom expressions — so they stay inside whole-stage codegen
  * and push down around the scan.
  *
  * All scores are integers (counts or permille ratios): end-to-end
  * deterministic and safely comparable against an ANSI-SQL oracle without
  * float-hash hazards.
  */
object TextAnalysis {

  /** Language marker words (tiny public stopword seeds). Order is the
    * deterministic tie-break priority. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "con", "del"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "mit", "von", "nicht"),
    "fr" -> Seq("le", "les", "des", "une", "est", "pour", "dans", "sur", "pas")
  )

  private val CjkPattern = "[\\x{4e00}-\\x{9fff}]"

  // regexp_count, not size(regexp_extract_all(...)): identical integer
  // semantics, but the extract_all form materializes one UTF8String per
  // match (per CHARACTER for the per-char classes) purely as GC garbage on
  // the quality-scoring hot path.
  private def countMatches(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern)).cast("long")

  /** Integer division on positive longs (Spark's `/` returns double; the
    * double detour is exact here: quotients of longs this size are >= 1e-6
    * away from the nearest integer unless exactly integral). */
  private def idiv(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  def markerPattern(words: Seq[String]): String =
    words.mkString("\\b(", "|", ")\\b")

  /** Per-language marker-hit count columns, in declaration order. */
  def markerCounts(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, words) =>
      lang -> countMatches(lower(text), markerPattern(words))
    }

  /** n-gram-heuristic language id:
    *  1. CJK-dominant text (> 20% CJK chars) -> "zh";
    *  2. else the language with the most marker-word hits (ties resolve to
    *     the earlier language in LangMarkers order);
    *  3. no hits at all -> "und".
    * Deterministic, pure-Column, ANSI-SQL-expressible (oracle mirrors it). */
  def langId(text: Column): Column = {
    val counts = markerCounts(text)
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val cjkDominant =
      countMatches(text, CjkPattern) * 5 > length(text).cast("long")
    val pick = counts.reverse.foldLeft(lit("und")) { case (acc, (lang, cnt)) =>
      when(cnt === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(cjkDominant, lit("zh")).otherwise(pick)
  }

  /** Whitespace token count (runs of non-space; matches split-on-space). */
  def wsTokenCount(text: Column): Column =
    countMatches(text, "[^ ]+").as("n_tokens")

  /** BPE-ish pre-tokenizer count: letter runs | digit runs | single
    * non-alnum-non-space symbols (the GPT-2-style coarse split). */
  def bpeTokenCount(text: Column): Column =
    countMatches(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]").as("n_bpe_tokens")

  // The three ratio formulas exist ONCE: qualityFeatures reports them and
  // qualityPass gates on them, so they can never drift apart (the `quality`
  // driver query emits features and the gate side by side).
  private def alphaPermille(text: Column): Column = {
    val nChars = length(text).cast("long")
    when(nChars > 0, idiv(countMatches(text, "[A-Za-z]") * 1000L, nChars)).otherwise(0L)
  }
  private def stopPermille(text: Column): Column = {
    val nTok = countMatches(text, "[^ ]+")
    when(nTok > 0,
      idiv(countMatches(lower(text), markerPattern(LangMarkers.head._2)) * 1000L, nTok))
      .otherwise(0L)
  }
  private def charsPerTokenE3(text: Column): Column = {
    val nTok = countMatches(text, "[^ ]+")
    when(nTok > 0, idiv(length(text).cast("long") * 1000L, nTok)).otherwise(0L)
  }

  /** Quality-scoring feature struct, all integer-valued:
    * counts plus permille ratios (x1000 integer division). */
  def qualityFeatures(text: Column): Seq[Column] = {
    val nChars = length(text).cast("long")
    val nAlpha = countMatches(text, "[A-Za-z]")
    val nDigit = countMatches(text, "[0-9]")
    val nPunct = countMatches(text, "[!-/:-@\\[-`{-~]")
    val nTok = countMatches(text, "[^ ]+")
    val nStop = countMatches(lower(text), markerPattern(LangMarkers.head._2))
    Seq(
      nChars.as("n_chars"),
      nAlpha.as("n_alpha"),
      nDigit.as("n_digit"),
      nPunct.as("n_punct"),
      nTok.as("n_tokens"),
      nStop.as("n_stop"),
      alphaPermille(text).as("alpha_permille"),
      stopPermille(text).as("stop_permille"),
      charsPerTokenE3(text).as("chars_per_token_e3")
    )
  }

  /** Winnowing selection (Schleimer et al. 2003) re-expressed entirely in
    * builtin higher-order functions so the SAME algorithm is
    * ANSI-SQL-expressible and the selection logic itself can be
    * hash-checked against a DuckDB oracle (the codegen'd rolling-hash
    * kernel in [[graft.text.Fingerprint]] / `winnow_fp` keeps the
    * production fast path; this is its oracle-checkable twin).
    *
    * Gram hash = first 15 hex chars of md5(k-gram) as a 60-bit long (md5 is
    * the one hash both engines compute identically); selection = min of
    * each w-window of consecutive gram hashes, distinct, sorted — the same
    * position-independent fingerprint set semantics as
    * [[Fingerprint.winnow]] (ties collapse by value, so the
    * rightmost-vs-leftmost min rule cannot change the selected SET).
    * Texts shorter than k hash whole; gram counts <= w select one min;
    * EMPTY text selects nothing (kgramHashes('') is empty — without the
    * guard the twin would emit md5('') where the kernel emits zero rows). */
  def sqlWinnowSelect(text: Column,
      k: Int = Fingerprint.DefaultK, w: Int = Fingerprint.DefaultW): Column = {
    def gramHash(g: Column): Column =
      conv(substring(md5(g), 1, 15), 16, 10).cast("long")
    val hs = when(length(text) === 0, array().cast("array<long>"))
      .when(length(text) < k, array(gramHash(text)))
      .otherwise(transform(sequence(lit(1), length(text) - lit(k - 1)),
        i => gramHash(text.substr(i, lit(k)))))
    // Let-binding via a 1-element outer transform: `hs` is evaluated ONCE
    // per row and bound to the lambda variable `h`. Inlining `hs` directly
    // into the window loop would re-evaluate the whole gram-hash array
    // inside every window's `slice` — O(grams^2) md5 calls per row
    // (measured: 20+ CPU-minutes on one sf0.1 partition vs seconds here).
    val sel = flatten(transform(array(hs), h =>
      when(size(h) === 0, array().cast("array<long>")) // empty text: no min
        .when(size(h) <= w, array(array_min(h)))
        .otherwise(transform(sequence(lit(0), size(h) - lit(w)),
          j => array_min(slice(h, j + lit(1), lit(w)))))))
    array_sort(array_distinct(sel))
  }

  /** Distinct k-token shingle set (the ST3 verify metric's shingles as
    * literal strings instead of hashes): builtin functions only, so exact
    * n-gram Jaccard is computable in-plan AND mirrored by an ANSI oracle
    * (DuckDB list_intersect), with no hash-collision caveat. */
  def shingleSet(text: Column, k: Int = 5): Column = {
    val toks = filter(split(text, "\\s+"), t => t =!= "")
    // Same let-binding trick as sqlWinnowSelect: bind the token array once
    // instead of re-splitting the text inside every shingle's `slice`.
    flatten(transform(array(toks), t =>
      array_distinct(transform(
        sequence(lit(1), greatest(size(t) - lit(k - 1), lit(1))),
        i => concat_ws(" ", slice(t, i, lit(k)))))))
  }

  /** Exact n-gram Jaccard between two shingle-set columns, quantized to
    * 1e4 (integer floor => oracle-safe; the double detour is exact at
    * these magnitudes). */
  def jaccardE4(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("long")
    val union = size(sa).cast("long") + size(sb).cast("long") - inter
    when(union > 0, idiv(inter * 10000L, union)).otherwise(10000L)
  }

  /** Composite quality gate: enough text, mostly alphabetic, has stopwords,
    * sane token lengths. Integer thresholds => oracle-safe. */
  def qualityPass(text: Column,
      minChars: Long = 80, minAlphaPermille: Long = 600,
      minStopPermille: Long = 10, maxCharsPerTokenE3: Long = 20000): Column =
    (length(text).cast("long") >= minChars) &&
      (alphaPermille(text) >= minAlphaPermille) &&
      (stopPermille(text) >= minStopPermille) &&
      (charsPerTokenE3(text) <= maxCharsPerTokenE3)
}
