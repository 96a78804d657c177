package graft

import org.apache.spark.sql.functions._

import graft.web.UrlCanon

class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlCanon.canonicalUrl(col("u"))).head().getString(0)

  private val cases = Seq(
    // case + default port + www + tracking param + fragment, all at once
    "https://WWW.Example.COM:443/a/b/?x=1&utm_source=t#f" -> "https://example.com/a/b?x=1",
    // scheme-matched default port only
    "http://example.com:80/index.html" -> "http://example.com/",
    "http://example.com:443/a" -> "http://example.com:443/a", // 443 not http's default
    "http://example.com:8080/a" -> "http://example.com:8080/a",
    // empty path -> "/"
    "https://example.com" -> "https://example.com/",
    // params sorted byte-lexicographically, duplicates kept
    "HTTPS://A.B/p?b=2&a=1&a=0" -> "https://a.b/p?a=0&a=1&b=2",
    // all-tracking query drops the "?" entirely
    "https://a.b/p?utm_campaign=x&gclid=1&fbclid=2&ref=3" -> "https://a.b/p",
    // "refresh" must not be swallowed by the "ref" rule (name-anchored)
    "https://a.b/p?refresh=1" -> "https://a.b/p?refresh=1",
    // index.htm / index.html stripping, root and nested
    "https://a.b/dir/index.htm" -> "https://a.b/dir",
    "https://a.b/index.html" -> "https://a.b/",
    "https://a.b/" -> "https://a.b/",
    // slash-then-index ordering: these join the same groups as above
    "https://a.b/dir/index.html/" -> "https://a.b/dir",
    "https://a.b/dir//" -> "https://a.b/dir",
    "https://a.b/index.html/index.html" -> "https://a.b/",
    // fragment dropped, empty query dropped
    "https://a.b/p#sec" -> "https://a.b/p",
    "https://a.b/p?" -> "https://a.b/p",
    // userinfo is lower-cased with the authority, not parsed further
    "ftp://User@Host/a" -> "ftp://user@host/a",
    // non-URL input passes through untouched
    "not-a-url" -> "not-a-url",
    "/relative/path?x=1" -> "/relative/path?x=1",
  )

  test("canonicalization rules (case, ports, www, fragments, params, index)") {
    for ((in, want) <- cases)
      assert(canon(in) == want, s"canon($in)")
  }

  test("canonicalization is idempotent") {
    for ((in, _) <- cases) {
      val once = canon(in)
      assert(canon(once) == once, s"canon^2($in)")
    }
  }

  test("the four synthetic doc_id variants collapse to one canonical url") {
    // Same synthesis the url_canon_groups query runs (shared helper).
    val df = spark.range(0, 40).toDF("doc_id")
    val groups = df.select(UrlCanon.canonicalUrl(UrlCanon.docIdVariantUrl(col("doc_id"))).as("canon"))
      .groupBy("canon").count().collect()
    assert(groups.length == 10)
    assert(groups.forall(_.getLong(1) == 4L))
    assert(groups.map(_.getString(0)).sorted.head == "https://host0.example/d/0/0?a=1&b=2")
  }
}
