package graft.web

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-scale analogue of the reference's
  * filesystem-path canonicalization before identity grouping
  * (/root/reference/src/process_matches.rs:116-124 canonicalizes every
  * scanned directory so two spellings of one location dedup as one).
  * For Common-Crawl-style corpora the same first tier applies to urls:
  * canonical-url equality collapses re-crawls of one page *before* any
  * content hashing, and it is the cheapest dedup tier of all (a pure
  * narrow map + one hash-partitioned groupBy, no content reads).
  *
  * Built entirely from builtin string/array expressions — no UDF — so the
  * whole canonicalization is ONE narrow Catalyst projection over the scan
  * AND is expressible verbatim in ANSI SQL (the DuckDB oracle recomputes
  * it independently). The scalar steps (regexp, lower, concat) are
  * whole-stage-codegen'd; the query-param filter/sort use higher-order
  * functions, which Spark evaluates as CodegenFallback — still vectorized
  * columnar input, still zero shuffles (PlanSpec gates the plan shape).
  *
  * Steps (conservative, order matters):
  *   1. scheme and host lower-cased (RFC 3986 §6.2.2.1 case normalization);
  *      userinfo (anything before the last `@` of the authority) is
  *      case-SENSITIVE per RFC 3986 §3.2.1 and passes through unchanged
  *   2. default port stripped (:80 for http, :443 for https)
  *   3. leading `www.` stripped from the host
  *   4. fragment dropped (never sent to the server)
  *   5. empty path -> "/"; any trailing run of `/index.html` / `/index.htm`
  *      segments (each reachable through one OR MORE slashes) plus trailing
  *      slashes is stripped in ONE anchored pattern; an emptied path -> "/".
  *      One pattern instead of strip-slashes-then-strip-index because the
  *      two-step form was not idempotent across a doubled slash
  *      (`/dir//index.html` -> `/dir/` -> re-canon `/dir`): the single
  *      anchored pattern — repeated `(/+index\.html?)` groups, then a
  *      trailing slash-run — eats `//index.html`,
  *      `/index.html//index.html`, and `/dir/index.html/` alike, so the
  *      output can never end in a slash (unless root) nor in an index
  *      segment, and canon∘canon=canon holds
  *   6. tracking query params dropped (utm_*, gclid, fbclid, ref),
  *      remaining params sorted byte-lexicographically, rejoined; an
  *      empty result drops the "?" entirely
  *
  * Anything not matching `scheme://...` is returned unchanged (opaque
  * ids, relative refs): canonicalization must never invent structure.
  */
object UrlCanon {

  /** Tracking-param pattern: a param whose NAME matches, with or without
    * a value. Anchored; shared verbatim with the oracle SQL. */
  val TrackingParam = "^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    // userinfo (through the LAST '@', greedy) is case-sensitive and kept
    // verbatim; only the host:port tail is lower-cased.
    val userinfo = regexp_extract(auth, "^(.*@)", 1)
    val hostport = lower(regexp_replace(auth, "^.*@", ""))
    val dePorted = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = regexp_replace(dePorted, "^www\\.", "")
    val rawPath = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // One anchored pattern: trailing (slash-run + index segment) repeats,
    // then trailing slashes — idempotent even across doubled slashes.
    val deIndexed = regexp_replace(rawPath, "(/+index\\.html?)*/*$", "")
    val path = when(deIndexed === "", lit("/")).otherwise(deIndexed)
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParam)))
    val qstr = array_join(params, "&")
    when(scheme === "", url) // not scheme://... -> opaque, unchanged
      .otherwise(concat(scheme, lit("://"), userinfo, host, path,
        when(qstr === "", lit("")).otherwise(concat(lit("?"), qstr))))
  }

  /** Deterministic 4-way spelled-variant url for a doc id — fixture for the
    * `url_canon_groups` oracle query and its spec (one shared definition so
    * the spec gates the same synthesis the query runs; the DuckDB twin in
    * SparkEntry.oracleSql is the intentional second copy). Four consecutive
    * doc ids form one canonical group: every variant canonicalizes to
    * `https://host{g%97}.example/d/{g}/0?a=1&b=2` where g = id - id%4. */
  def docIdVariantUrl(docId: Column): Column = {
    val g = docId - pmod(docId, lit(4))
    val h = pmod(g, lit(97)).cast("string")
    val gs = g.cast("string")
    val v = pmod(docId, lit(4))
    when(v === 0, concat(lit("https://host"), h, lit(".example/d/"), gs, lit("/0?b=2&a=1")))
      .when(v === 1, concat(lit("HTTPS://HOST"), h, lit(".EXAMPLE:443/d/"), gs, lit("/0?utm_source=feed&b=2&a=1#frag")))
      .when(v === 2, concat(lit("https://www.host"), h, lit(".example/d/"), gs, lit("/0/index.html?a=1&b=2&gclid=zz")))
      .otherwise(concat(lit("https://host"), h, lit(".example:443/d/"), gs, lit("/0/?b=2&utm_campaign=x&a=1")))
  }

  /** The same canonicalization as an ANSI-SQL scalar over column `c`,
    * for DuckDB oracles. Kept as a string template so every rule lives
    * in ONE file next to its Spark twin. */
  def oracleSqlExpr(c: String): String = {
    val scheme = s"lower(regexp_extract($c, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    val auth = s"regexp_extract($c, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)"
    val userinfo = s"regexp_extract($auth, '^(.*@)', 1)"
    val hostport = s"lower(regexp_replace($auth, '^.*@', ''))"
    val dePorted =
      s"""CASE WHEN $scheme = 'http' THEN regexp_replace($hostport, ':80$$', '')
         |     WHEN $scheme = 'https' THEN regexp_replace($hostport, ':443$$', '')
         |     ELSE $hostport END""".stripMargin
    val host = s"regexp_replace($dePorted, '^www\\.', '')"
    val rawPath = s"regexp_extract($c, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    val deIndexed =
      s"regexp_replace($rawPath, '(/+index\\.html?)*/*$$', '')"
    val path = s"CASE WHEN $deIndexed = '' THEN '/' ELSE $deIndexed END"
    val query = s"regexp_extract($c, '^[^#?]*\\?([^#]*)', 1)"
    // coalesce: DuckDB's array_to_string over an EMPTY list yields NULL
    // (Spark's array_join yields ''), and NULL would poison the concat.
    val qstr =
      s"""coalesce(array_to_string(list_sort(list_filter(str_split($query, '&'),
         |  p -> p <> '' AND NOT regexp_matches(p, '$TrackingParam'))), '&'), '')""".stripMargin
    s"""CASE WHEN $scheme = '' THEN $c
       |ELSE $scheme || '://' || $userinfo || $host || $path ||
       |  (CASE WHEN $qstr = '' THEN '' ELSE '?' || $qstr END) END""".stripMargin
  }
}
