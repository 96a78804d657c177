package graft

import org.apache.spark.sql.SparkSession

import graft.fixtures.PagesGen

/** Per-round benchmark main (driver contract): times every SparkEntry query
  * at local[N] (N = SPARK_GRAFT_CPUS, default 32) and prints ONE JSON line.
  *
  * Also emits the north-rule scaling evidence: the full near-dup pipeline
  * over an identical deterministic corpus at local[8] and local[32]
  * (the sandbox stand-in for N- vs 4N-executor runs — no real cluster is
  * available), reporting docs/sec at both levels and
  * efficiency = (throughput@32 / throughput@8) / 4.
  */
object Bench {

  private def session(cpus: Int): SparkSession =
    graft.util.LocalSession(cpus, s"graft-bench-$cpus")

  /** One timed full-pipeline run over nUnits synthetic pages (tokensScale=4:
    * web-page-sized texts so compute dominates fixed per-job overhead) in a
    * fresh session. A warm-up run absorbs class-load and codegen cost. */
  /** Stage-cache policy for the timed pipeline runs: which stages are
    * lazily checkpointed (SelectiveCacheIO). "*" = all (the default IO). */
  private def benchIO: graft.checkpoint.TableIO = {
    val cached = sys.env.getOrElse("SPARK_GRAFT_BENCH_CACHE", "*")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // Serialized+compressed stage caches by default: measured -7% wall at
    // local[32] (bandwidth-bound) and neutral at local[8] (BASELINE.md).
    val level = sys.env.get("SPARK_GRAFT_CACHE_LEVEL")
      .orElse(Some("MEMORY_AND_DISK_SER"))
      .filter(_ != "DEFAULT")
      .map(org.apache.spark.storage.StorageLevel.fromString)
    new graft.checkpoint.SelectiveCacheIO(cached, level)
  }

  private def pipelineRunOnce(spark: SparkSession, nUnits: Long): (Long, Double) = {
    // tokensScale=6 ≈ 4 KB extracted text per page (typical web page).
    // After the bit-sliced SimHash kernel, smaller docs leave local[8]
    // under-utilized relative to the fixed floor; 6 keeps the run
    // compute-representative at both levels (A/Bs in BASELINE.md).
    val tokensScale = sys.env.getOrElse("SPARK_GRAFT_TOKENS_SCALE", "6").toInt
    val spec = PagesGen.Spec(nUnits = nUnits, tokensScale = tokensScale)
    val io = benchIO
    Pipeline.run(spark, PagesGen.pages(spark, spec.copy(nUnits = 60)), SparkEntry.cfg, io)
      .report.count() // warm-up
    val pages = PagesGen.pages(spark, spec)
    val docs = pages.count()
    val t0 = System.nanoTime()
    Pipeline.run(spark, pages, SparkEntry.cfg, io).report.count()
    (docs, (System.nanoTime() - t0) / 1e9)
  }

  /** One timed signature-stage run (ST1 only) over pre-materialized distinct
    * contents: a pure narrow map over the MinHash/SimHash/band kernels — the
    * dominant cluster-wide cost at 100 TB and the cleanest probe of compute
    * scaling (no shuffle, no materialization in the timed window). */
  private def sigRunOnce(spark: SparkSession, nUnits: Long): (Long, Double) = {
    import org.apache.spark.sql.functions.{bit_count, col, sum}
    val contents = PagesGen.syntheticContents(spark, nUnits, tokensScale = 4)
      .localCheckpoint(true) // materialized before timing
    val docs = contents.count()
    // warm-up (JIT of the kernels)
    Pipeline.signatures(contents.limit(2000), SparkEntry.cfg)
      .agg(sum(bit_count(col("simhash")))).collect()
    val t0 = System.nanoTime()
    Pipeline.signatures(contents, SparkEntry.cfg)
      .agg(sum(bit_count(col("simhash")))).collect() // forces the expr, no overflow
    (docs, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Pipeline scaling corpus: sized so parallel compute dominates the
    // ~3-6 s serial floor (driver planning + AQE rounds + shuffle-stage
    // scheduling) the way production minutes-long stages would.
    // 120k units (158.4k docs) is the measured sweet spot: large enough
    // that compute dominates the ~3-4 s serial floor, below the local[32]
    // cache-write bandwidth knee this VM shows at ~200k+ docs (BASELINE.md).
    val scalingUnits = sys.env.getOrElse("SPARK_GRAFT_SCALE_UNITS", "120000").toLong
    // Signature-stage corpus (independent knob; 1 unit = 1 distinct doc via
    // PagesGen.syntheticContents): sized so the timed narrow map dominates
    // the fixed per-job latency. 2M docs after the bit-sliced SimHash
    // kernel (2x stage throughput): halving the per-doc compute halves the
    // arithmetic intensity, so the corpus must grow ~5x for the same
    // overhead-amortization the 400k corpus gave the old kernel.
    val sigUnits = sys.env.getOrElse("SPARK_GRAFT_SIG_UNITS", "2000000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    def emit(json: String, preliminary: Boolean = false): Unit = {
      // Three delivery paths so the driver can machine-parse the result
      // even when a logger swallows or prefixes stdout lines: a
      // sentinel-prefixed copy, a file in the repo root, and — last on
      // stdout, with showSuccess := false suppressing sbt's footer — the
      // bare JSON line. The bare line prints for the preliminary emission
      // too: if the (long) scaling section is killed by a harness timeout,
      // the queries-only JSON is still the final stdout line. The
      // preliminary emission carries a DISTINCT sentinel so a
      // first-sentinel-match parser cannot mistake it for the final result.
      val sentinel = if (preliminary) "GRAFT_BENCH_JSON_PARTIAL" else "GRAFT_BENCH_JSON"
      println(s"$sentinel $json")
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get("BENCH.json"),
          (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch { case e: Exception => System.err.println(s"[bench] BENCH.json write failed: $e") }
      println(json)
    }

    // ---- per-query timings FIRST (fast; emitted immediately as a
    // preliminary result so a harness kill mid-scaling loses nothing).
    // Interleaved min-of-N (default 3), mirroring the scaling loop: the
    // sandbox VM has multi-second hypervisor-steal episodes (BASELINE.md),
    // and a single-shot timing lands whole bursts on whichever queries were
    // running — min over interleaved repetitions is the noise-robust
    // estimator of a query's true cost. A failed query is not retried.
    val doQueries = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") == "1"
    val queryReps = sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "3").toInt
    // Queries whose best time is still >= heavyThreshold after the base reps
    // get extra interleaved reps: one choppy VM window spanning 3 adjacent
    // reps produced round-3's phantom "regressions" on exactly the >=2 s
    // queries; more, later-in-time reps give the min a clean window to land.
    val heavyReps = sys.env.getOrElse("SPARK_GRAFT_HEAVY_REPS", "3").toInt
    val heavyThreshold = sys.env.getOrElse("SPARK_GRAFT_HEAVY_THRESHOLD", "1.5").toDouble
    val spark = session(cpus)
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    // Optional anchored-regex name filter for isolating individual queries
    // (diagnostics only; the driver runs with no filter).
    val queryFilter = sys.env.get("SPARK_GRAFT_QUERY_FILTER").map(_.r)
    val names = (if (doQueries) SparkEntry.queries.toSeq.sortBy(_._1) else Nil)
      .filter { case (n, _) => queryFilter.forall(_.matches(n)) }
    val qBest = scala.collection.mutable.LinkedHashMap[String, Double]()
    val qReps = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    def runQuery(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, rep: Int): Unit = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        qReps(name) = qReps.getOrElse(name, Nil) :+ sec
        qBest(name) = math.min(qBest.getOrElse(name, Double.MaxValue), sec)
      } catch { case e: Throwable =>
        failed += name
        // Record the failed attempt's elapsed time only when no successful
        // rep exists — a later-rep failure must not clobber a valid min.
        if (!qBest.contains(name)) qBest(name) = (System.nanoTime() - t0) / 1e9
        System.err.println(s"[bench] $name FAILED (rep $rep): ${e.getMessage}")
      }
    }
    for (rep <- 1 to queryReps; (name, fn) <- names if !failed.contains(name))
      runQuery(name, fn, rep)
    val heavy = names.filter { case (n, _) =>
      !failed.contains(n) && qBest.getOrElse(n, 0.0) >= heavyThreshold }
    for (rep <- 1 to heavyReps; (name, fn) <- heavy if !failed.contains(name))
      runQuery(name, fn, queryReps + rep)
    spark.stop()
    val results = names.map { case (name, _) => name -> qBest.getOrElse(name, 0.0) }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map(n => "\"" + n + "\"").mkString(""","failed":[""", ",", "]")
    // Per-rep spreads for the heavy queries: makes a VM-noise episode
    // visible in the artifact itself (a clean min with one 3x outlier rep
    // reads as noise; uniformly slow reps read as a real regression).
    val qRepsJson =
      if (heavy.isEmpty) ""
      else heavy.map { case (n, _) =>
        "\"" + n + "\":" + qReps.getOrElse(n, Nil).map(s => f"$s%.2f").mkString("[", ",", "]")
      }.mkString(""","query_rep_secs":{""", ",", "}")
    def fullJson(scalingJson: String): String =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"$failedJson$qRepsJson$scalingJson}"""
    if (doScaling) emit(fullJson(""), preliminary = true) // queries only

    // ---- scaling evidence: same job, same input, local[N] then local[4N]
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    var scalingJson = ""
    if (doScaling) {
      // 6 interleaved reps per level (was 4): three rounds of A/Bs show the
      // clean-window efficiency is ~0.6 but a single choppy VM window can
      // span several adjacent reps; more reps give the per-level min more
      // independent chances to land in a clean window (~+100 s bench wall).
      val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "6").toInt
      // Interleave levels across repetitions (fresh session each) and take
      // the per-level minimum: the sandbox VM has multi-second noise
      // episodes, and interleaving keeps one episode from biasing a level.
      // ALL rep times are kept and emitted (rep_secs) so a noise episode is
      // visible in the artifact itself, not just in the builder's notes.
      val repSecs = scala.collection.mutable.Map[Int, List[Double]]().withDefaultValue(Nil)
      var docs = 0L
      for (_ <- 1 to reps; n <- levels) {
        val s = session(n)
        val (d, sec) = pipelineRunOnce(s, scalingUnits)
        s.stop()
        docs = d
        repSecs(n) = repSecs(n) :+ sec
      }
      val best = levels.map(n => n -> repSecs(n).min).toMap
      val (n0, n1) = (levels.head, levels.last)
      val (sec0, sec1) = (best(n0), best(n1))
      val eff = ((docs / sec1) / (docs / sec0)) / (n1.toDouble / n0)
      val per = levels.map { n =>
        val rs = repSecs(n).map(s => f"$s%.2f").mkString("[", ",", "]")
        f""""local${n}":{"sec":${best(n)}%.2f,"docs_per_sec":${docs / best(n)}%.1f,"rep_secs":$rs}""" }.mkString(",")

      // signature-stage (narrow map) scaling: interleaved, min per level.
      // Separate rep knob: the 2M-doc sig runs are long, and min-of-3
      // bounds the bench wall while the cheaper pipeline runs keep 6.
      val sigReps = sys.env.getOrElse("SPARK_GRAFT_SIG_REPS", "3").toInt
      val sigRepSecs = scala.collection.mutable.Map[Int, List[Double]]().withDefaultValue(Nil)
      var sigDocs = 0L
      for (_ <- 1 to sigReps; n <- levels) {
        val s = session(n)
        val (d, sec) = sigRunOnce(s, sigUnits)
        s.stop()
        sigDocs = d
        sigRepSecs(n) = sigRepSecs(n) :+ sec
      }
      val sigBest = levels.map(n => n -> sigRepSecs(n).min).toMap
      val sigEff = ((sigDocs / sigBest(n1)) / (sigDocs / sigBest(n0))) / (n1.toDouble / n0)
      val sigPer = levels.map { n =>
        val rs = sigRepSecs(n).map(s => f"$s%.2f").mkString("[", ",", "]")
        f""""local${n}":{"sec":${sigBest(n)}%.2f,"docs_per_sec":${sigDocs / sigBest(n)}%.1f,"rep_secs":$rs}""" }.mkString(",")

      scalingJson =
        f""","scaling":{"docs":$docs,$per,"efficiency_${n0}_to_${n1}":$eff%.3f,""" +
        f""""throughput_docs_per_sec":{"local$n0":${docs / sec0}%.1f,"local$n1":${docs / sec1}%.1f},""" +
        f""""sig_stage":{"docs":$sigDocs,$sigPer,"efficiency_${n0}_to_${n1}":$sigEff%.3f,""" +
        f""""throughput_docs_per_sec":{"local$n0":${sigDocs / sigBest(n0)}%.1f,"local$n1":${sigDocs / sigBest(n1)}%.1f}}}"""
    }

    emit(fullJson(scalingJson))
  }
}
