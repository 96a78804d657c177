package graft

import org.apache.spark.sql.SparkSession

import graft.fixtures.PagesGen
import graft.model.GraftConfig

/** Diagnostic: per-stage wall time + row count of the pipeline at one
  * parallelism level. Usage: runMain graft.StageProbe <cpus> <nUnits>
  * [tokensScale]. Not part of the driver contract; used to locate
  * anti-scaling stages. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 8
    val nUnits = if (args.length > 1) args(1).toLong else 40000L
    val tokensScale = if (args.length > 2) args(2).toInt else 1
    val spark = graft.util.LocalSession(cpus, s"graft-stage-probe-$cpus")
    val cfg = GraftConfig()

    def t[A](name: String)(f: => (A, Long)): A = {
      val t0 = System.nanoTime()
      val (r, n) = f
      println(f"PROBE $name%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      r
    }

    // warmup
    Pipeline.run(spark, PagesGen.pages(spark, PagesGen.Spec(60)), cfg).report.count()

    val pages = PagesGen.pages(spark, PagesGen.Spec(nUnits, tokensScale = tokensScale))
    t("gen")(((), pages.count()))
    val extracted = t("extract") {
      val d = Pipeline.extract(pages, cfg).localCheckpoint(false); (d, d.count())
    }
    val contents = t("contents") {
      val d = Pipeline.distinctContents(extracted).localCheckpoint(false); (d, d.count())
    }
    val sigs = t("signatures") {
      val d = Pipeline.signatures(contents, cfg).localCheckpoint(false); (d, d.count())
    }
    val candidates = t("candidates") {
      val d = Pipeline.candidatePairs(sigs, cfg).pairs.localCheckpoint(false); (d, d.count())
    }
    val verified = t("verify") {
      val d = Pipeline.verifyPairs(candidates, contents, cfg).localCheckpoint(false); (d, d.count())
    }
    val clusters = t("cluster") {
      val d = Pipeline.cluster(extracted, verified, cfg).localCheckpoint(false); (d, d.count())
    }
    t("report")(((), Pipeline.report(clusters).count()))
    spark.stop()
  }
}
