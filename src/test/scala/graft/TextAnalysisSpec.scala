package graft

import org.apache.spark.sql.functions._

import graft.text.{Fingerprint, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).head().get(0)

  test("langId picks the language with most marker hits") {
    assert(one("The cat and the dog sat in the sun", TextAnalysis.langId(col("text"))) == "en")
    assert(one("el perro y la casa de los amigos con una mesa", TextAnalysis.langId(col("text"))) == "es")
    assert(one("der hund und die katze ist ein tier mit von", TextAnalysis.langId(col("text"))) == "de")
    assert(one("le chat est dans les maisons pour une fete", TextAnalysis.langId(col("text"))) == "fr")
    assert(one("qqq zzz xxx", TextAnalysis.langId(col("text"))) == "und")
    // documented tie-break: equal marker hits resolve to the EARLIER
    // language in LangMarkers order (en before es here: 2 hits each)
    assert(one("the la the la", TextAnalysis.langId(col("text"))) == "en")
  }

  test("langId detects CJK-dominant text as zh") {
    assert(one("中文文本处理", TextAnalysis.langId(col("text"))) == "zh")
    // CJK below 20% stays non-zh
    assert(one("the the the and of to in is that 中", TextAnalysis.langId(col("text"))) == "en")
  }

  test("token counts: whitespace and BPE-ish") {
    assert(one("a bb  ccc", TextAnalysis.wsTokenCount(col("text"))) == 3L)
    // "don't stop-2x" -> [don]['][t][stop][-][2][x] = 7
    assert(one("don't stop-2x", TextAnalysis.bpeTokenCount(col("text"))) == 7L)
  }

  test("quality features are exact integer counts") {
    val row = Seq("The cat, 42 dogs!").toDF("text")
      .select(TextAnalysis.qualityFeatures(col("text")): _*).head()
    assert(row.getAs[Long]("n_chars") == 17L)
    assert(row.getAs[Long]("n_alpha") == 10L) // Thecatdogs
    assert(row.getAs[Long]("n_digit") == 2L)
    assert(row.getAs[Long]("n_punct") == 2L) // , !
    assert(row.getAs[Long]("n_tokens") == 4L)
    assert(row.getAs[Long]("n_stop") == 1L) // the
    assert(row.getAs[Long]("alpha_permille") == 10L * 1000 / 17)
  }

  test("qualityPass gates short / non-alpha / stopword-free text") {
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog and runs off into the woods to find food for the winter", // pass
      "short", // too short
      "1234567890 " * 10, // no alpha
      ("lorem ipsum dolor sit amet " * 5) + "qq" // no en stopwords
    )
    val got = texts.toDF("text")
      .select(TextAnalysis.qualityPass(col("text")).as("ok")).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, false, false, false))
  }

  // ------------------------------------------------------------ fingerprints

  test("winnowing guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    val k = Fingerprint.DefaultK; val w = Fingerprint.DefaultW
    val shared = "x" + ("abcdefgh" * 4) + "y" // len 34 >= k+w-1 = 23
    val a = "PREFIX-ONE " + shared + " SUFFIX-A"
    val b = "totally other beginning " + shared + " and end B"
    val fa = Fingerprint.fingerprints(a, k, w).toSet
    val fb = Fingerprint.fingerprints(b, k, w).toSet
    assert(fa.intersect(fb).nonEmpty)
  }

  test("fingerprints are deterministic and discriminative") {
    val t1 = "the quick brown fox jumps over the lazy dog"
    val t2 = "pack my box with five dozen liquor jugs today"
    assert(Fingerprint.fingerprints(t1).sameElements(Fingerprint.fingerprints(t1)))
    assert(Fingerprint.fingerprint64(t1) == Fingerprint.fingerprint64(t1))
    assert(Fingerprint.fingerprint64(t1) != Fingerprint.fingerprint64(t2))
    assert(Fingerprint.fingerprintJaccard(
      Fingerprint.fingerprints(t1), Fingerprint.fingerprints(t2)) < 0.2)
  }

  test("fingerprint edge cases: empty and shorter-than-k text") {
    assert(Fingerprint.fingerprints("").isEmpty)
    val short = Fingerprint.fingerprints("abc") // < k chars
    assert(short.length == 1)
  }

  test("sqlWinnowSelect: shared-substring guarantee and selection shape") {
    // Winnowing guarantee on the SQL-expressible twin: any shared substring
    // of length >= k + w - 1 (= 23) forces a shared selected hash, while
    // gram-disjoint texts share nothing (md5 gram hashes collide w.p. 2^-60).
    val shared = "GUARANTEED-SHARED-BLOCK-0123456789abcdef" // 40 chars
    val t1 = s"alpha bravo charlie delta $shared echo foxtrot"
    val t2 = s"zulu yankee $shared xray whiskey victor uniform"
    val t3 = "completely different text with no overlap at all here"
    val rows = Seq(("a", t1), ("b", t2), ("c", t3)).toDF("id", "text")
      .select(col("id"), TextAnalysis.sqlWinnowSelect(col("text")).as("sel"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(rows("a").intersect(rows("b")).nonEmpty, "guarantee violated")
    assert(rows("a").intersect(rows("c")).isEmpty)
    assert(rows("b").intersect(rows("c")).isEmpty)
    // sorted-distinct shape, and the short-text path selects exactly one
    val sel = Seq(("s", "tiny")).toDF("id", "text")
      .select(TextAnalysis.sqlWinnowSelect(col("text"))).head().getSeq[Long](0)
    assert(sel.length == 1)
    val a = rows("a").toSeq.sorted
    assert(a == a.distinct.sorted)
  }

  test("sqlWinnowSelect matches an independent reference model on random text") {
    // Straight-line reference model of the md5-gram winnowing semantics
    // (k=8, w=16): gram hash = first 15 hex chars of md5 as a long;
    // selection = distinct sorted minima of each 16-window.
    def refModel(s: String, k: Int = 8, w: Int = 16): Seq[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(g: String): Long = {
        val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16)
      }
      val hs =
        if (s.length < k) Array(h(s))
        else (0 to s.length - k).map(i => h(s.substring(i, i + k))).toArray
      val sel =
        if (hs.length <= w) Seq(hs.min)
        else (0 to hs.length - w).map(j => hs.slice(j, j + w).min)
      sel.distinct.sorted
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "ab cd"
    val texts = (1 to 24).map { i =>
      val n = 1 + rnd.nextInt(120)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "tiny" :+ "exactly8" :+ ("x" * 23)
    val got = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "text")
      .select(col("i"), TextAnalysis.sqlWinnowSelect(col("text")).as("sel"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == refModel(t), s"mismatch on text #$i '${t.take(20)}…'")
    }
  }

  test("shingleSet + jaccardE4: exact n-gram Jaccard, integer-quantized") {
    def j(a: String, b: String): Long =
      Seq((a, b)).toDF("a", "b")
        .select(TextAnalysis.jaccardE4(
          TextAnalysis.shingleSet(col("a")), TextAnalysis.shingleSet(col("b"))))
        .head().getLong(0)
    assert(j("a b c d e f", "a b c d e f") == 10000L)
    assert(j("a b c d e f", "q r s t u v") == 0L)
    // 7 tokens -> 3 shingles; appending one token adds one shingle:
    // |A|=3, |B|=4, |A∩B|=3 -> 3/4 = 7500
    assert(j("a b c d e f g", "a b c d e f g h") == 7500L)
    // fewer than k tokens: single whole-text shingle
    assert(j("a b", "a b") == 10000L)
    assert(j("a b", "a c") == 0L)
  }

  test("fingerprint expression matches the kernel") {
    import graft.functions.TextFunctions._
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs")
    val got = texts.toDF("text")
      .select(col("text"), fingerprint64(col("text")).as("fp"), winnowFingerprint(col("text")).as("set"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == Fingerprint.fingerprint64(r.getString(0)))
      assert(r.getSeq[Long](2).toArray.sameElements(Fingerprint.fingerprints(r.getString(0))))
    }
  }
}
