package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.PagesGen
import graft.model.GraftConfig

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries fall in two groups:
  *  - SQL-expressible operators (exact-hash grouping, filters, aggregations,
  *    fingerprints): DuckDB oracle provided in `oracleSql`, running against
  *    the same parquet tables in sfDir;
  *  - pipeline stages whose semantics aren't ANSI-SQL (MinHash/LSH/CC):
  *    no oracle entry -> driver records a rows-only check; their correctness
  *    gate is the planted-truth recall suite in `sbt -batch test`.
  */
object SparkEntry {

  val cfg: GraftConfig = GraftConfig()

  /** Flagship: full near-dup pipeline over a deterministic synthetic pages
    * corpus (all planted unit types), returning the cluster report. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PagesGen.pages(spark, PagesGen.Spec(nUnits = 150))
    val r = Pipeline.run(spark, pages, cfg)
    r.report
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A6/A2: exact-identity stats over the corpus (hash aggregation)
    "exact_dup_stats" -> ((s, dir) =>
      docs(s, dir).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"))),

    // ---- A2+F3: group-by-content-hash with singleton suppression, over the
    // expanded pages corpus (exact-dup groups planted by doc_id % 10)
    "exact_dup_groups" -> ((s, dir) =>
      PagesGen.fromDocuments(s, dir)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 1)
        .orderBy("h")),

    // ---- A5: redundant-bytes metric per exact group
    "redundant_bytes" -> ((s, dir) =>
      PagesGen.fromDocuments(s, dir)
        .groupBy(md5(col("text")).as("h"))
        .agg(((count(lit(1)) - 1) * min(octet_length(col("text")))).as("redundant"),
          count(lit(1)).as("cnt"))
        .where(col("cnt") > 1)
        .select("h", "redundant")
        .orderBy("h")),

    // ---- F1: size-range filter (min/max length analog)
    "length_filter" -> ((s, dir) =>
      docs(s, dir)
        .where(col("n_chars").between(100, 400))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")),

    // ---- A6: group-by language with counts + summed length
    "lang_stats" -> ((s, dir) =>
      docs(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")),

    // ---- source dimension stats
    "source_stats" -> ((s, dir) =>
      docs(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("source")),

    // ---- X1-analog: whitespace token counting (training-data op)
    "token_counts" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
            .cast("long").as("n_tokens"))
        .orderBy("doc_id")),

    // ---- X2-analog: prefix fingerprint (cheap hash tier / doc fingerprint)
    "doc_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), md5(substring(col("text"), 1, 128)).as("fp"))
        .orderBy("doc_id")),

    // ---- text-quality scoring: alphabetic mass (training-data op)
    "alpha_counts" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("n_alpha"))
        .orderBy("doc_id")),

    // ---- full pipeline: flat cluster report (MinHash/LSH/CC; rows-only)
    "pipeline_clusters" -> ((s, dir) => {
      val r = Pipeline.run(s, PagesGen.fromDocuments(s, dir), cfg)
      r.report
    }),

    // ---- ST0 exact-identity group-size histogram: extract stage vs pure SQL
    "exact_group_sizes" -> ((s, dir) => {
      Pipeline.extract(PagesGen.fromDocuments(s, dir), cfg)
        .groupBy("exact_hash")
        .agg(count(lit(1)).as("n_members"))
        .where(col("n_members") > 1)
        .groupBy("n_members")
        .agg(count(lit(1)).as("n_groups"))
        .orderBy("n_members")
    })
  )

  /** DuckDB-dialect oracles over the same parquet tables in sfDir.
    * `pages` reconstruction mirrors PagesGen.fromDocuments exactly. */
  private val pagesCte: String =
    """WITH pages AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM documents WHERE doc_id % 10 IN (0,1)
      |  UNION ALL SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL SELECT doc_id, text || ' zqnear' || CAST(doc_id AS VARCHAR) || 'x' FROM documents WHERE doc_id % 10 = 2
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "exact_dup_stats" ->
      "SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct FROM documents",
    "exact_dup_groups" ->
      s"""$pagesCte
         |SELECT md5(text) AS h, count(*) AS cnt FROM pages
         |GROUP BY md5(text) HAVING count(*) > 1 ORDER BY h""".stripMargin,
    "redundant_bytes" ->
      s"""$pagesCte
         |SELECT md5(text) AS h,
         |       CAST((count(*) - 1) * min(strlen(text)) AS BIGINT) AS redundant
         |FROM pages GROUP BY md5(text) HAVING count(*) > 1 ORDER BY h""".stripMargin,
    "length_filter" ->
      "SELECT doc_id, n_chars FROM documents WHERE n_chars BETWEEN 100 AND 400 ORDER BY doc_id",
    "lang_stats" ->
      """SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "source_stats" ->
      "SELECT source, count(*) AS cnt FROM documents GROUP BY source ORDER BY source",
    "token_counts" ->
      """SELECT doc_id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      "SELECT doc_id, md5(substr(text, 1, 128)) AS fp FROM documents ORDER BY doc_id",
    "alpha_counts" ->
      """SELECT doc_id,
        |  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha
        |FROM documents ORDER BY doc_id""".stripMargin,
    "exact_group_sizes" ->
      s"""$pagesCte,
         |g AS (
         |  SELECT md5(text) AS h, count(*) AS cnt FROM pages
         |  WHERE length(text) BETWEEN 8 AND 100000000
         |  GROUP BY md5(text) HAVING count(*) > 1
         |)
         |SELECT CAST(cnt AS BIGINT) AS n_members, count(*) AS n_groups
         |FROM g GROUP BY cnt ORDER BY n_members""".stripMargin
  )
}
