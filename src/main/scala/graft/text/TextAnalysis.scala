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

  private def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

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
      when(nChars > 0, idiv(nAlpha * 1000L, nChars)).otherwise(0L).as("alpha_permille"),
      when(nTok > 0, idiv(nStop * 1000L, nTok)).otherwise(0L).as("stop_permille"),
      when(nTok > 0, idiv(nChars * 1000L, nTok)).otherwise(0L).as("chars_per_token_e3")
    )
  }

  /** Composite quality gate: enough text, mostly alphabetic, has stopwords,
    * sane token lengths. Integer thresholds => oracle-safe. */
  def qualityPass(text: Column,
      minChars: Long = 80, minAlphaPermille: Long = 600,
      minStopPermille: Long = 10, maxCharsPerTokenE3: Long = 20000): Column = {
    val nChars = length(text).cast("long")
    val alphaP = when(nChars > 0, idiv(countMatches(text, "[A-Za-z]") * 1000L, nChars)).otherwise(0L)
    val nTok = countMatches(text, "[^ ]+")
    val stopP = when(nTok > 0,
      idiv(countMatches(lower(text), markerPattern(LangMarkers.head._2)) * 1000L, nTok)).otherwise(0L)
    val cpt = when(nTok > 0, idiv(nChars * 1000L, nTok)).otherwise(0L)
    (nChars >= minChars) && (alphaP >= minAlphaPermille) &&
      (stopP >= minStopPermille) && (cpt <= maxCharsPerTokenE3)
  }
}
