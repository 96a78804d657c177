package graft

import java.nio.file.Files

import graft.model.GraftConfig

/** Golden-JSON parity with the reference's DuplicateGroup serialization
  * (/root/reference/src/duplicate_group.rs:123-149: golden string
  * {"duplicates":[["a/x","b/x"]],"redundant_bytes":1}) on the
  * reference-shaped 3/4/3 corpus, plus SQL-function registration via
  * SparkSessionExtensions and the distributed JSON sink (S5). */
class GoldenJsonSpec extends SparkSpec {
  import spark.implicits._

  private def tinyClusters() = {
    val rows = Seq(
      ("https://ex/a/a", "first"), ("https://ex/a/b", "first"), ("https://ex/c", "first"),
      ("https://ex/b", "next"), ("https://ex/d", "next"), ("https://ex/f", "next"), ("https://ex/g", "next"),
      ("https://ex/h", "third"), ("https://ex/i", "third"), ("https://ex/j", "third")
    ).map { case (u, t) => (u, new java.sql.Timestamp(0L), null.asInstanceOf[Array[Byte]], t, "en") }
    val tiny = rows.toDF("url", "warc_ts", "html", "text", "lang")
    Pipeline.run(spark, tiny, GraftConfig(minLen = 1)).clusters
  }

  test("referenceJson emits the reference's exact serialization shape") {
    val got = Pipeline.referenceJson(tinyClusters()).collect().sorted
    val want = Array(
      """{"duplicates":[["https://ex/a/a","https://ex/a/b","https://ex/c"]],"redundant_bytes":10}""",
      """{"duplicates":[["https://ex/b","https://ex/d","https://ex/f","https://ex/g"]],"redundant_bytes":12}""",
      """{"duplicates":[["https://ex/h","https://ex/i","https://ex/j"]],"redundant_bytes":10}"""
    ).sorted
    assert(got.toSeq == want.toSeq, s"got:\n${got.mkString("\n")}")
  }

  test("S5 distributed JSON sink round-trips") {
    val dir = Files.createTempDirectory("graft-json").toString + "/out"
    Pipeline.referenceJson(tinyClusters()).write.text(dir)
    val back = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(back.length == 3 && back.forall(_.startsWith("""{"duplicates":[[""")))
  }

  test("SQL functions registered into the session registry") {
    // getOrCreate inside one JVM returns the existing session, so the
    // spark.sql.extensions path can't be exercised here; register() installs
    // the same definition list directly (fresh session state via newSession).
    val s3 = spark.newSession()
    GraftExtensions.register(s3)
    locally {
      val html = graft.extract.ExtractText.render("hello world", "h.example")
      import s3.implicits._
      val one = Seq((html, "the quick brown fox jumps over the lazy dog")).toDF("html", "text")
      one.createOrReplaceTempView("t")
      val row = s3.sql(
        """SELECT extract_text(html) AS x, fingerprint64(text) AS fp,
          |       doc_signature(text).simhash AS sh,
          |       dot_product(l2_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))),
          |                   l2_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))) AS d
          |FROM t""".stripMargin).head()
      assert(row.getAs[String]("x") == "hello world")
      assert(row.getAs[Long]("fp") ==
        graft.text.Fingerprint.fingerprint64("the quick brown fox jumps over the lazy dog"))
      assert(math.abs(row.getAs[Double]("d") - 1.0) < 1e-12)
    }
    // wrong-typed arguments fail ANALYSIS (checkInputDataTypes), not
    // codegen/eval with a mid-query ClassCastException
    intercept[org.apache.spark.sql.AnalysisException] {
      s3.sql("SELECT fingerprint64(42)").head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      s3.sql("SELECT l2_normalize(array(1.0, 2.0))").head() // double, not float
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      s3.sql("SELECT extract_text('not binary')").head()
    }
    // the parent session's registry is untouched (session isolation)
    intercept[Exception] { spark.sql("SELECT fingerprint64('x')").head() }
    // wrong ARITY fails with the function's name and usage in the message
    // (round-5 review: args.head/args(1) used to leak a bare
    // NoSuchElementException / IndexOutOfBoundsException)
    val e1 = intercept[Exception] { s3.sql("SELECT fingerprint64()").head() }
    assert(e1.getMessage.contains("fingerprint64") && e1.getMessage.contains("expected 1"),
      s"unhelpful arity error: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      s3.sql("SELECT dot_product(array(CAST(1.0 AS DOUBLE)))").head()
    }
    assert(e2.getMessage.contains("dot_product") && e2.getMessage.contains("expected 2"),
      s"unhelpful arity error: ${e2.getMessage}")
  }
}
