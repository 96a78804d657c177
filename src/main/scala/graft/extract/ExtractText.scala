package graft.extract

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

/** Deterministic, total HTML -> text extractor (ST0).
  *
  * Role analog: the reference's bytes<->OS-string codecs + path reassembly
  * (reference: /root/reference/src/types.rs:225-318, file_data.rs:46-54) —
  * the one place where raw binary becomes canonical text. The per-row
  * invariant (BASELINE.json input_hint) is that extraction is byte-identical
  * per url across runs and parallelism levels; everything here is a fixed
  * algorithm with no locale, clock, or platform dependence.
  *
  * Algorithm (documented so it is reproducible):
  *  1. Charset: ASCII-scan the first 1024 bytes for `charset=<token>`
  *     (inside a meta tag or not — first match wins). Recognized: utf-8,
  *     iso-8859-1/latin1/windows-1252 (as ISO-8859-1), us-ascii. Anything
  *     else (or no declaration) decodes as UTF-8. Malformed sequences decode
  *     to U+FFFD (deterministic replacement).
  *  2. Strip `<!-- -->` comments, `<script>`/`<style>` elements wholesale.
  *  3. Every remaining tag is a word boundary (becomes whitespace).
  *  4. Decode entities: amp, lt, gt, quot, apos, nbsp (-> U+00A0) and
  *     numeric `&#NNN;` / `&#xHH;` including supplementary-plane code
  *     points (emitted as surrogate pairs). Lone-surrogate code points and
  *     unrecognized entities pass through literally.
  *  5. Normalize: runs of ASCII whitespace collapse to a single space;
  *     leading/trailing whitespace dropped. (Non-ASCII whitespace such as
  *     U+00A0 is content, not separator.)
  */
object ExtractText {

  private val Iso88591 = StandardCharsets.ISO_8859_1

  /** Never throws; null/empty input yields "". */
  def apply(html: Array[Byte]): String = {
    if (html == null || html.isEmpty) return ""
    val decoded = decode(html, detectCharset(html))
    stripAndNormalize(decoded)
  }

  private[extract] def detectCharset(html: Array[Byte]): Charset = {
    val n = math.min(html.length, 1024)
    val needle = "charset="
    var i = 0
    while (i <= n - needle.length) {
      var j = 0
      while (j < needle.length &&
             lower(html(i + j)) == needle.charAt(j)) j += 1
      if (j == needle.length) {
        var k = i + needle.length
        // optional quote
        if (k < n && (html(k) == '"' || html(k) == '\'')) k += 1
        val sb = new StringBuilder
        var c = if (k < n) lower(html(k)) else ' '
        while (k < n && (c.isLetterOrDigit || c == '-' || c == '_')) {
          sb.append(c); k += 1
          c = if (k < n) lower(html(k)) else ' '
        }
        return charsetFor(sb.toString)
      }
      i += 1
    }
    StandardCharsets.UTF_8
  }

  private def lower(b: Byte): Char = {
    val c = (b & 0xff).toChar
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  }

  private def charsetFor(name: String): Charset = name match {
    case "utf-8" | "utf8"                              => StandardCharsets.UTF_8
    case "iso-8859-1" | "latin1" | "windows-1252"      => Iso88591
    case "us-ascii" | "ascii"                          => StandardCharsets.US_ASCII
    case _                                             => StandardCharsets.UTF_8
  }

  private def decode(bytes: Array[Byte], cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(ByteBuffer.wrap(bytes)).toString
  }

  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  private[extract] def stripAndNormalize(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var pendingSpace = false
    var i = 0

    @inline def emit(c: Char): Unit = {
      if (pendingSpace && sb.length() > 0) sb.append(' ')
      pendingSpace = false
      sb.append(c)
    }

    def startsWithIgnoreCase(at: Int, lit: String): Boolean = {
      if (at + lit.length > n) return false
      var j = 0
      while (j < lit.length) {
        val c = s.charAt(at + j)
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        if (lc != lit.charAt(j)) return false
        j += 1
      }
      true
    }

    /** Index just past the closing `>` of `</name ... >` at/after `from`. */
    def skipElement(from: Int, name: String): Int = {
      val close = "</" + name
      var k = from
      while (k < n) {
        // the tag NAME must end here (next char is '>', whitespace, or
        // '/'), mirroring the open-tag side's !isLetter guard — otherwise
        // '</scripted>' would close a <script> element mid-content
        if (s.charAt(k) == '<' && startsWithIgnoreCase(k, close) && {
              val after = k + close.length
              after >= n || s.charAt(after) == '>' ||
                isAsciiWs(s.charAt(after)) || s.charAt(after) == '/'
            }) {
          var m = k + close.length
          while (m < n && s.charAt(m) != '>') m += 1
          return math.min(m + 1, n)
        }
        k += 1
      }
      n
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (startsWithIgnoreCase(i, "<!--")) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (startsWithIgnoreCase(i, "<script") &&
                   (i + 7 >= n || !s.charAt(i + 7).isLetter)) {
          i = skipElement(i + 7, "script")
        } else if (startsWithIgnoreCase(i, "<style") &&
                   (i + 6 >= n || !s.charAt(i + 6).isLetter)) {
          i = skipElement(i + 6, "style")
        } else {
          var k = i + 1
          while (k < n && s.charAt(k) != '>') k += 1
          i = math.min(k + 1, n)
        }
        pendingSpace = true
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = s.substring(i + 1, semi)
          decodeEntity(body) match {
            // Decoded ASCII whitespace (&#32; &#10; &#9; &#13;) IS
            // whitespace: it joins step-5 normalization ('a&#32;&#32;b' ->
            // 'a b', leading '&#10;' dropped) instead of smuggling literal
            // spaces/newlines past it — otherwise the ws-token and
            // shingle tokenizations of one document could diverge. nbsp
            // (U+00A0) is non-ASCII and deliberately stays content.
            case Some(str) if str.length == 1 && isAsciiWs(str.charAt(0)) =>
              pendingSpace = true
              i = semi + 1
            case Some(str) =>
              // first char goes through emit (pending-space handling);
              // a low surrogate of a supplementary pair appends directly
              emit(str.charAt(0))
              var p = 1
              while (p < str.length) { sb.append(str.charAt(p)); p += 1 }
              i = semi + 1
            case None => emit('&'); i += 1
          }
        } else { emit('&'); i += 1 }
      } else if (isAsciiWs(c)) {
        pendingSpace = true
        i += 1
      } else {
        emit(c)
        i += 1
      }
    }
    sb.toString
  }

  private def decodeEntity(body: String): Option[String] = body match {
    case "amp"  => Some("&")
    case "lt"   => Some("<")
    case "gt"   => Some(">")
    case "quot" => Some("\"")
    case "apos" => Some("'")
    case "nbsp" => Some("\u00a0") // content, not separator (header step 5)
    case _ if body.startsWith("#x") || body.startsWith("#X") =>
      codePoint(body.substring(2), 16)
    case _ if body.startsWith("#") =>
      codePoint(body.substring(1), 10)
    case _ => None
  }

  /** Valid scalar code points only: BMP non-surrogates directly,
    * supplementary planes as surrogate pairs; lone surrogates and
    * out-of-range values are rejected (entity passes through literally). */
  private def codePoint(digits: String, radix: Int): Option[String] =
    try {
      val cp = Integer.parseInt(digits, radix)
      if (cp >= 0 && cp <= 0x10ffff &&
          !(cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE))
        Some(new String(Character.toChars(cp)))
      else None
    } catch { case _: NumberFormatException => None }

  /** Render `text` back to html such that `apply(render(text)) == text`
    * byte-identically, with per-host deterministic boilerplate. Used by the
    * fixture generator (FIXTURES.md §1) and the extractor invariant test. */
  def render(text: String, host: String): Array[Byte] = {
    val escaped = text
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val html =
      s"""<!DOCTYPE html>
         |<html><head><meta charset="utf-8"><meta name="host" content="$host"><title></title>
         |<style>body { margin: 0; }</style>
         |<script>var host = "$host";</script>
         |</head><body>
         |<!-- boilerplate for $host -->
         |<div class="main"><p>$escaped</p></div>
         |</body></html>""".stripMargin
    html.getBytes(StandardCharsets.UTF_8)
  }
}
