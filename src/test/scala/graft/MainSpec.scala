package graft

import java.nio.file.Files

import graft.fixtures.PagesGen

/** The spark-submit entrypoint (graft.Main): CLI parsing, output layout,
  * and checkpointed re-run over a real (tiny) pages corpus. */
class MainSpec extends SparkSpec {

  test("parse maps every flag onto GraftConfig") {
    val a = Main.parse(Seq(
      "--input", "/in", "--output", "/out", "--checkpoint", "/ck",
      "--shingle-k", "7", "--num-perm", "64", "--bands", "16",
      "--min-jaccard", "0.7", "--max-hamming", "5", "--min-lcs-ratio", "0.4",
      "--min-size", "16", "--max-size", "9999", "--exclude", "\\.pdf$",
      "--max-band-group", "500", "--canonicalize-urls", "--simhash-tier",
      "--hide-fully-exact"))
    a.input shouldBe Some("/in")
    a.output shouldBe Some("/out")
    a.checkpoint shouldBe Some("/ck")
    a.cfg.shingleK shouldBe 7
    a.cfg.numPerm shouldBe 64
    a.cfg.bands shouldBe 16
    a.cfg.minJaccard shouldBe 0.7
    a.cfg.maxHamming shouldBe 5
    a.cfg.minLcsRatio shouldBe 0.4
    a.cfg.minLen shouldBe 16
    a.cfg.maxLen shouldBe 9999
    a.cfg.excludeUrlRegex shouldBe Some("\\.pdf$")
    a.cfg.maxBandGroup shouldBe 500
    a.cfg.canonicalizeUrls shouldBe true
    a.cfg.simhashTier shouldBe true
    a.cfg.showFullyExact shouldBe false
  }

  test("parse rejects missing output, missing input, and input+table together") {
    an[IllegalArgumentException] should be thrownBy Main.parse(Seq("--input", "/in"))
    an[IllegalArgumentException] should be thrownBy Main.parse(Seq("--output", "/out"))
    an[IllegalArgumentException] should be thrownBy
      Main.parse(Seq("--input", "/in", "--table", "t", "--output", "/out"))
    an[IllegalArgumentException] should be thrownBy
      Main.parse(Seq("--input", "/in", "--output", "/out", "--bogus"))
    // A value-taking flag stranded as the LAST arg hits the same loud
    // fallback (the ::v::t pattern can't match), not a silent drop.
    val e = intercept[IllegalArgumentException] {
      Main.parse(Seq("--input", "/in", "--output", "/out", "--exclude"))
    }
    e.getMessage should include("--exclude")
    e.getMessage should include("usage:")
  }

  test("--help prints usage and returns without starting a session") {
    noException should be thrownBy Main.main(Array("--help"))
    noException should be thrownBy Main.main(Array("-h"))
  }

  test("-h as an option VALUE stays a value, never a help hijack") {
    // "-h" is a legal (if odd) url-exclusion regex; a whole-argv help scan
    // would silently turn this valid job into a usage printout + exit 0.
    val parsed = Main.parse(Seq("--input", "/in", "--output", "/out", "--exclude", "-h"))
    parsed.cfg.excludeUrlRegex shouldBe Some("-h")
    a[Main.HelpRequested] should be thrownBy
      Main.parse(Seq("--input", "/in", "--help", "--output", "/out"))
  }

  test("malformed numeric flag values fail with flag name + usage, not a bare NumberFormatException") {
    val e = intercept[IllegalArgumentException] {
      Main.parse(Seq("--input", "/in", "--output", "/out", "--shingle-k", "five"))
    }
    e.getMessage should include("--shingle-k")
    e.getMessage should include("usage:")
    val e2 = intercept[IllegalArgumentException] {
      Main.parse(Seq("--input", "/in", "--output", "/out", "--min-jaccard", "high"))
    }
    e2.getMessage should include("--min-jaccard")
  }

  test("--table input reads a catalog table and matches the --input run") {
    val dir = Files.createTempDirectory("graft-main-table").toString
    val inPath = s"$dir/pages"
    PagesGen.pages(spark, PagesGen.Spec(nUnits = 30))
      .write.mode("overwrite").parquet(inPath)
    // spark.read.table resolves temp views through the same catalog path an
    // Iceberg table would arrive by (spark-submit --conf spark.sql.catalog...).
    spark.read.parquet(inPath).createOrReplaceTempView("graft_pages_v")
    Main.run(spark, Main.parse(Seq(
      "--table", "graft_pages_v", "--output", s"$dir/outT")))
    Main.run(spark, Main.parse(Seq(
      "--input", inPath, "--output", s"$dir/outI")))
    val byTable = spark.read.parquet(s"$dir/outT/report")
      .select("cluster_id", "url", "canonical").orderBy("url").collect()
    val byPath = spark.read.parquet(s"$dir/outI/report")
      .select("cluster_id", "url", "canonical").orderBy("url").collect()
    byTable.length should be > 0
    byTable shouldBe byPath
  }

  test("end-to-end run writes report, canonical_map, reference_json, metrics; re-run resumes") {
    val dir = Files.createTempDirectory("graft-main").toString
    val inPath = s"$dir/pages"
    PagesGen.pages(spark, PagesGen.Spec(nUnits = 40))
      .write.mode("overwrite").parquet(inPath)

    val argv = Seq("--input", inPath, "--output", s"$dir/out",
      "--checkpoint", s"$dir/ck")
    Main.run(spark, Main.parse(argv))

    val report = spark.read.parquet(s"$dir/out/report")
    val expected = Pipeline.run(spark,
      spark.read.parquet(inPath), graft.model.GraftConfig())
    report.count() shouldBe expected.report.count()
    report.count() should be > 0L

    // pointer table: one row per non-canonical member of every cluster
    val cmap = spark.read.parquet(s"$dir/out/canonical_map")
    cmap.columns.toSeq shouldBe Seq("url", "canonical_url")
    val nClusters = expected.report.select("cluster_id").distinct().count()
    cmap.count() shouldBe expected.report.count() - nClusters

    // nested reference-parity JSON: one object per cluster, all parseable
    import spark.implicits._
    val jsonLines = spark.read.text(s"$dir/out/reference_json").as[String].collect()
    jsonLines.length shouldBe nClusters
    all(jsonLines) should (startWith("{") and include("\"duplicates\""))

    // per-stage metrics with the committed snapshot ids
    val metrics = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out/metrics.json")))
    Seq("st0_extracted", "st1_signatures", "st2_candidates",
      "st3_verified", "st4_clusters", "st5_report")
      .foreach(st => metrics should include(st))

    // second run under the same checkpoint RESUMES (loads every committed
    // stage — wall_ms 0 markers in metrics) and reproduces the outputs
    // (fresh output dir: Spark's session-level file index caches the first
    // run's part files, so overwriting in place would poison the re-read)
    val argv2 = Seq("--input", inPath, "--output", s"$dir/out2",
      "--checkpoint", s"$dir/ck")
    Main.run(spark, Main.parse(argv2))
    val metrics2 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out2/metrics.json")))
    metrics2 should include("\"wall_ms\":0")
    spark.read.parquet(s"$dir/out2/report").count() shouldBe report.count()

    // a DIFFERENT input against the SAME checkpoint dir must NOT resume —
    // the snapshot key folds in the input locator, so the old corpus's
    // stages are invisible and every stage recomputes (no wall_ms 0 rows)
    val inPathB = s"$dir/pagesB"
    PagesGen.pages(spark, PagesGen.Spec(nUnits = 25, unitOffset = 1000))
      .write.mode("overwrite").parquet(inPathB)
    Main.run(spark, Main.parse(Seq("--input", inPathB,
      "--output", s"$dir/out3", "--checkpoint", s"$dir/ck")))
    val metrics3 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out3/metrics.json")))
    metrics3 should not include "\"wall_ms\":0"
    spark.read.parquet(s"$dir/out3/report").count() should not be report.count()
  }
}
