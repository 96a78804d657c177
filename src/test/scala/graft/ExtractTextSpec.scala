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
