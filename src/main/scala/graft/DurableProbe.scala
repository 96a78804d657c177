package graft

import org.apache.spark.sql.SparkSession

import graft.checkpoint.ParquetSnapshotIO
import graft.fixtures.PagesGen
import graft.model.GraftConfig

/** Diagnostic (not part of the driver contract): one full pipeline run under
  * DURABLE per-stage IO (ParquetSnapshotIO) — the kill-resume robustness
  * probe at bench scale. Usage:
  *
  *   runMain graft.DurableProbe <cpus> <nUnits> <rootDir> [tokensScale]
  *
  * Prints one PROBE line per stage (wall ms, rows, LOADED vs COMPUTED) and a
  * total line with the CC iterations executed by this JVM. Protocol for the
  * kill-resume evidence (BASELINE.md): start a run, kill -9 the forked JVM
  * after the st4_cc label store has committed an iteration, re-run with the
  * same arguments — the second run must LOAD st0..st3 from their committed
  * snapshots and resume CC from the committed iteration (fewer iterations
  * executed than a from-scratch run), ending with the same report rows.
  *
  * ccLocalThreshold=0 forces the distributed, per-iteration-committed CC
  * path — the shape a 100 TB dup graph (edges >> any driver) would take —
  * even though the sandbox corpus's edge set would fit the driver-local
  * union-find. */
object DurableProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val nUnits = if (args.length > 1) args(1).toLong else 800000L
    val root = if (args.length > 2) args(2) else "/dev/shm/graft-durable-probe"
    val tokensScale = if (args.length > 3) args(3).toInt else 1
    val spark = graft.util.LocalSession(cpus, s"graft-durable-probe-$cpus")

    val cfg = GraftConfig(ccLocalThreshold = 0L)
    val io = new ParquetSnapshotIO(root, cfg.configHash)
    val pages = PagesGen.pages(spark, PagesGen.Spec(nUnits, tokensScale = tokensScale))
    val nPages = pages.count()
    val t0 = System.nanoTime()
    val res = Pipeline.run(spark, pages, cfg, io)
    val reportRows = res.report.count()
    val wall = (System.nanoTime() - t0) / 1e9
    res.metrics.foreach { m =>
      val how = if (m.wall_ms == 0) "LOADED" else "COMPUTED"
      println(f"PROBE ${m.stage}%-16s $how%-8s wall=${m.wall_ms}%6d ms  rows=${m.rows_out}")
    }
    println(f"PROBE total $wall%.2f s  pages=$nPages  report_rows=$reportRows  " +
      s"cc_iterations_this_jvm=${graft.cluster.ConnectedComponents.lastRunIterations}")
    spark.stop()
  }
}
