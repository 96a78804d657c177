package graft

import java.nio.charset.StandardCharsets

import graft.extract.ExtractText

/** The per-row invariant (BASELINE.json input_hint): extraction is a
  * deterministic, total function and render/extract round-trips
  * byte-identically. Mirrors the reference's codec round-trip tests
  * (/root/reference/src/types.rs:320-352). */
class ExtractTextSpec extends SparkSpec {

  test("render/extract round-trips byte-identically") {
    val texts = Seq(
      "first",
      "plain words separated by spaces",
      "escaped & < > chars in content",
      "unicode héllo düplicate 日本語 emoji ©",
      "a" * 5000
    )
    texts.foreach { t =>
      val html = ExtractText.render(t, "host1.example")
      assert(ExtractText(html) == t, s"round-trip failed for '$t'")
    }
  }

  test("strips tags, scripts, styles, comments; normalizes whitespace") {
    val html =
      """<html><head><script>var x = "<div>not text</div>";</script>
        |<style>p { color: red }</style></head>
        |<body><!-- comment -->
        |<p>hello   <b>bold</b>
        |world</p></body></html>""".stripMargin.getBytes(StandardCharsets.UTF_8)
    assert(ExtractText(html) == "hello bold world")
  }

  test("decodes entities") {
    val html = "<p>a &amp; b &lt;c&gt; &quot;d&quot; &#65; &#x42; &unknown; &amp</p>"
      .getBytes(StandardCharsets.UTF_8)
    assert(ExtractText(html) == "a & b <c> \"d\" A B &unknown; &amp")
  }

  test("nbsp decodes to U+00A0 (content, not separator)") {
    // the documented invariant: &nbsp; is content — it neither collapses
    // with adjacent ASCII whitespace nor doubles into two spaces
    assert(ExtractText("<p>a&nbsp;b</p>".getBytes(StandardCharsets.UTF_8)) == "a b")
    assert(ExtractText("<p>a&nbsp; b</p>".getBytes(StandardCharsets.UTF_8)) == "a  b")
    assert(ExtractText("<p>a &nbsp;b</p>".getBytes(StandardCharsets.UTF_8)) == "a  b")
    assert(ExtractText("<p>&nbsp;&nbsp;</p>".getBytes(StandardCharsets.UTF_8)) == "  ")
  }

  test("numeric references to ASCII whitespace join normalization, not content") {
    // &#32;/&#10;/&#9;/&#13; decode to WHITESPACE and must behave exactly
    // like literal whitespace under step-5 normalization — otherwise
    // 'a&#32;&#32;b' would carry two real spaces past the collapse and the
    // ws-token vs shingle tokenizations of one document would diverge
    assert(ExtractText("<p>a&#32;&#32;b</p>".getBytes(StandardCharsets.UTF_8)) == "a b")
    assert(ExtractText("<p>&#10;hi</p>".getBytes(StandardCharsets.UTF_8)) == "hi")
    assert(ExtractText("<p>a&#9;b&#13;c</p>".getBytes(StandardCharsets.UTF_8)) == "a b c")
    assert(ExtractText("<p>a &#32; b</p>".getBytes(StandardCharsets.UTF_8)) == "a b")
  }

  test("script close-tag name must end at the tag boundary") {
    // '</scripted>' is NOT a </script> close tag; '</script >' and
    // '</script/>' are (name followed by whitespace, '/', or '>')
    assert(ExtractText("<script>if (x</scripted>) y()</script>rest"
      .getBytes(StandardCharsets.UTF_8)) == "rest")
    assert(ExtractText("<script>var x = 1</script >after"
      .getBytes(StandardCharsets.UTF_8)) == "after")
    assert(ExtractText("<style>p{}</styles>q{}</style>tail"
      .getBytes(StandardCharsets.UTF_8)) == "tail")
  }

  test("supplementary-plane numeric entities decode as surrogate pairs") {
    val grin = new String(Character.toChars(0x1f600))
    assert(ExtractText("<p>x &#x1F600; y</p>".getBytes(StandardCharsets.UTF_8)) == s"x $grin y")
    assert(ExtractText("<p>x &#128512; y</p>".getBytes(StandardCharsets.UTF_8)) == s"x $grin y")
    // lone surrogates and out-of-range code points pass through literally
    assert(ExtractText("<p>&#xD800;</p>".getBytes(StandardCharsets.UTF_8)) == "&#xD800;")
    assert(ExtractText("<p>&#x110000;</p>".getBytes(StandardCharsets.UTF_8)) == "&#x110000;")
  }

  test("charset sniffing: latin1 meta") {
    val text = "café crème"
    val html = (s"""<meta charset="iso-8859-1"><p>$text</p>""")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(ExtractText(html) == text)
  }

  test("truncated structures: unterminated comment/script/tag/entity stay total") {
    def x(s: String) = ExtractText(s.getBytes(StandardCharsets.UTF_8))
    // unterminated comment / script / style swallow to end-of-input
    assert(x("before<!-- never closed") == "before")
    assert(x("a<script>var x = 1") == "a")
    assert(x("a<style>p {") == "a")
    // unterminated tag at end-of-input
    assert(x("text<div class=") == "text")
    // '&' without a ';' within 12 chars stays literal (no entity decode)
    assert(x("<p>fish &amp chips</p>") == "fish &amp chips")
    assert(x("<p>t &thisentityistoolong; u</p>") == "t &thisentityistoolong; u")
    // empty / malformed numeric entities pass through literally
    assert(x("<p>&#x;</p>") == "&#x;")
    assert(x("<p>&#;</p>") == "&#;")
    assert(x("<p>&bogus;</p>") == "&bogus;")
    // unknown charset declarations fall back to utf-8
    assert(x("""<meta charset="klingon"><p>héllo</p>""") == "héllo")
  }

  test("total on arbitrary bytes (never throws, always deterministic)") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(bytes)
      val a = ExtractText(bytes)
      val b = ExtractText(bytes.clone())
      assert(a == b)
    }
    assert(ExtractText(null) == "")
    assert(ExtractText(Array.emptyByteArray) == "")
  }

  test("expression yields same result as the pure function") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq("one two", "three & four <b>", "").map(t =>
      (t, ExtractText.render(t, "h.example")))
    val got = rows.toDF("t", "html")
      .select(col("t"), graft.functions.GraftFunctions.extractText(col("html")).as("x"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}
