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
    // index segments reached through DOUBLED slashes (the one-pattern rule:
    // the old strip-slashes-then-strip-index form left '/dir/' here)
    "https://a.b/dir//index.html" -> "https://a.b/dir",
    "https://a.b//index.html" -> "https://a.b/",
    "https://a.b/index.htm//index.html" -> "https://a.b/",
    "https://a.b/dir/index.html//index.htm/" -> "https://a.b/dir",
    // fragment dropped, empty query dropped
    "https://a.b/p#sec" -> "https://a.b/p",
    "https://a.b/p?" -> "https://a.b/p",
    // userinfo keeps its case (RFC 3986 §3.2.1); only host:port lowers
    "ftp://User@Host/a" -> "ftp://User@host/a",
    "https://A:Pw@WWW.Ex.COM:443/a" -> "https://A:Pw@ex.com/a",
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

  test("canonicalization is idempotent on seeded random URL shapes") {
    // Structured fuzz: random draws over every rule's trigger dimensions
    // (case, www, ports, path depth, trailing slashes, index segments,
    // params incl. tracking names, fragments). Deterministic seed.
    val rng = new scala.util.Random(20260818L)
    def pick[T](xs: Seq[T]): T = xs(rng.nextInt(xs.length))
    val urls = (1 to 300).map { _ =>
      val scheme = pick(Seq("http", "https", "HTTP", "HTTPS", "ftp"))
      val userinfo = pick(Seq("", "", "", "User@", "a:Pw@"))
      val www = pick(Seq("", "www.", "WWW."))
      val host = pick(Seq("a.b", "Example.COM", "HOST7.example"))
      val port = pick(Seq("", ":80", ":443", ":8080"))
      val segs = (0 until rng.nextInt(4)).map(_ => pick(Seq("d", "x9", "Index", "p_q")))
      val tail = pick(Seq("", "/", "//", "/index.html", "/index.htm", "/index.html/",
        "//index.html", "/index.htm//index.html", "/index.html//"))
      val params = (0 until rng.nextInt(4)).map(_ =>
        pick(Seq("a=1", "b=2", "utm_source=t", "gclid=z", "ref=r", "refresh=1", "")))
      val query = if (params.isEmpty && rng.nextBoolean()) "" else "?" + params.mkString("&")
      val frag = pick(Seq("", "#f", "#frag/with?q"))
      s"$scheme://$userinfo$www$host$port${segs.map("/" + _).mkString}$tail$query$frag"
    }
    val df = urls.toDF("u")
    val once = df.select(UrlCanon.canonicalUrl(col("u")).as("c1"))
    val twice = once.select(col("c1"), UrlCanon.canonicalUrl(col("c1")).as("c2"))
      .where(col("c1") =!= col("c2"))
    val bad = twice.collect()
    assert(bad.isEmpty, s"non-idempotent canon on: ${bad.take(5).mkString("; ")}")
    // canonical outputs never retain the stripped artifacts (fragments,
    // dangling '?', trailing index segments, tracking params; default
    // ports only for their OWN scheme — ftp legitimately keeps :80/:443)
    val arts = once.where(col("c1").rlike(
      "#|\\?$|/index\\.html?$|[&?](utm_|gclid|fbclid|ref=)") ||
      col("c1").rlike("^http://[^/]*:80/") || col("c1").rlike("^https://[^/]*:443/"))
      .collect()
    assert(arts.isEmpty, s"stripped artifact survived: ${arts.take(5).mkString("; ")}")
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
