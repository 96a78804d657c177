package graft

import org.apache.spark.sql.functions._

import graft.fixtures.PagesGen
import graft.model.GraftConfig
import graft.streaming.IncrementalDedup
import graft.streaming.IncrementalDedup.StateDirs

/** Diagnostic main: measures the incremental mode's central scale claim —
  * per-batch wall stays O(batch + affected dup-graph) while durable state
  * grows linearly with the stream — by feeding N synthetic batches into
  * `IncrementalDedup.processBatch` against one state root and timing each.
  *
  * Batch composition (all deterministic, no external data):
  *   - `unitsPerBatch` FRESH units (batch b covers the disjoint unit range
  *     [(b-1)*U, b*U), so every batch brings genuinely new urls and content
  *     with their own in-batch dup structure);
  *   - plus `crossFrac` of the PREVIOUS batch's units re-published under
  *     new urls (url + "#rc<b>"). With crossMode=url the text is identical,
  *     so the republication is an IDENTITY-level cross-batch event: the new
  *     url binds to the already-stored node (no new content, no new edge) —
  *     this measures the binding/recluster path. With crossMode=near the
  *     republished text gains one trailing token (shingle-Jaccard
  *     (n-4)/(n-3) vs the stored doc — ≥ 0.99 at PagesGen's 120-300-token
  *     texts, far above every gate: the probe exercises the tier's
  *     MECHANICS and cost, not borderline-threshold behavior; html dropped
  *     so the mutated text is what extraction sees), making every
  *     republication NEW
  *     content that must be discovered through the durable band index and
  *     pass the cross-batch verify tier — est-gates when texts are not
  *     retained (edges_est_only grows), full ST3 when cfg.incRetainTexts
  *     is on (edges_est_only stays 0). This is the probe for the
  *     retain-texts trade: state bytes vs verify semantics.
  *
  * Per batch it prints wall seconds plus state row counts read AFTER the
  * clock stops (reading state is not part of the claim being measured).
  * If per-batch wall tracked total accumulated state, the line to watch
  * would grow ~linearly in b; the O(batch) claim predicts a flat line with
  * one spike when file-count compaction triggers.
  *
  * Usage: runMain graft.IncrementalProbe [cpus] [batches] [unitsPerBatch]
  *                                       [root] [tokensScale] [crossFrac]
  *                                       [retainTexts 0|1] [crossMode url|near]
  */
object IncrementalProbe {

  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val batches = if (args.length > 1) args(1).toInt else 8
    val unitsPerBatch = if (args.length > 2) args(2).toLong else 50000L
    val root = if (args.length > 3) args(3) else "/dev/shm/graft-inc-probe"
    val tokensScale = if (args.length > 4) args(4).toInt else 1
    val crossFrac = if (args.length > 5) args(5).toDouble else 0.1
    val retainArg = if (args.length > 6) args(6) else "0"
    require(retainArg == "0" || retainArg == "1", s"retainTexts must be 0 or 1, got '$retainArg'")
    val retainTexts = retainArg == "1"
    val crossMode = if (args.length > 7) args(7) else "url"
    require(crossMode == "url" || crossMode == "near",
      s"crossMode must be 'url' or 'near', got '$crossMode'")

    val spark = graft.util.LocalSession(cpus, s"graft-inc-probe-$cpus")
    val cfg = GraftConfig(incRetainTexts = retainTexts)
    val dirs = StateDirs(root)

    def batchPages(b: Int) = {
      val fresh = PagesGen.pages(spark,
        PagesGen.Spec(nUnits = unitsPerBatch, tokensScale = tokensScale,
          unitOffset = (b - 1).toLong * unitsPerBatch))
      if (b == 1) fresh
      else {
        val republished0 = PagesGen.pages(spark,
          PagesGen.Spec(nUnits = math.max(1L, (unitsPerBatch * crossFrac).toLong),
            tokensScale = tokensScale,
            unitOffset = (b - 2).toLong * unitsPerBatch))
          .withColumn("url", concat(col("url"), lit(s"#rc$b")))
        val republished =
          if (crossMode != "near") republished0
          else republished0
            .withColumn("html", lit(null).cast("binary")) // extraction reads text
            .withColumn("text", concat_ws(" ", col("text"), lit(s"rcnear$b")))
        fresh.union(republished)
      }
    }

    // warm-up: JIT + codegen caches on a throwaway state root, so batch 1's
    // wall measures the engine, not classloading
    IncrementalDedup.processBatch(
      PagesGen.pages(spark, PagesGen.Spec(nUnits = 60, seed = 7L, tokensScale = tokensScale)),
      cfg, StateDirs(root + "-warmup"), batchId = 1L)

    val walls = (1 to batches).map { b =>
      val pages = batchPages(b)
      val docs = pages.count()
      val t0 = System.nanoTime()
      IncrementalDedup.processBatch(pages, cfg, dirs, batchId = b.toLong)
      val sec = (System.nanoTime() - t0) / 1e9
      // state census AFTER the clock: the claim is about batch work, and
      // these full-state reads are exactly the O(state) scans processBatch
      // is designed to avoid
      val clusters = spark.read.parquet(dirs.clusters).count()
      val edges = spark.read.parquet(dirs.edges).count()
      val members = spark.read.parquet(dirs.members).count()
      val estOnly = spark.read.parquet(dirs.metrics)
        .agg(sum(col("edges_est_only"))).head().getLong(0)
      println(f"PROBE batch=$b%2d docs=$docs%7d wall=$sec%7.2fs " +
        f"state: members=$members%8d edges=$edges%7d live_urls=$clusters%8d " +
        f"est_only=$estOnly%6d")
      sec
    }
    // state-size cost of the retain-texts trade, measured on disk
    def dirBytes(p: String): Long = {
      val d = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(d)) 0L
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_)).map(java.nio.file.Files.size).sum
      }
    }
    val sigBytes = dirBytes(dirs.signatures)
    val textBytes = dirBytes(dirs.texts)
    val json = walls.map(s => f"$s%.2f").mkString("[", ",", "]")
    println(s"""GRAFT_INC_PROBE {"cpus":$cpus,"batches":$batches,""" +
      s""""units_per_batch":$unitsPerBatch,"cross_frac":$crossFrac,""" +
      s""""retain_texts":$retainTexts,"cross_mode":"$crossMode",""" +
      s""""signatures_bytes":$sigBytes,""" +
      s""""texts_bytes":$textBytes,"batch_wall_secs":$json}""")
    spark.stop()
  }
}
