package graft.cluster

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative min-label propagation connected components over a DataFrame of
  * undirected edges (ST4). Labels converge to the component-minimum node id,
  * so cluster ids are deterministic (no partition-dependent id generation —
  * SURVEY.md §7.5).
  *
  * Scale notes (100 TB design):
  *  - each iteration is ONE shuffle: neighbor label messages and the node's
  *    own label are unioned and hash-aggregated together, and the
  *    changed-label count rides on the same job via `observe` — there is no
  *    separate convergence-check join+count job (driver sync points are the
  *    Amdahl term in scaling efficiency, so the loop keeps exactly one
  *    action per iteration);
  *  - `localCheckpoint` after every iteration truncates lineage so plan size
  *    and task closures stay O(1) in the iteration count (on a real cluster,
  *    a reliable checkpoint dir / stage table is the durable variant);
  *  - dup-graph components are dense with tiny diameters, so iteration
  *    counts are small (observed 2-4 on web-dup shaped graphs); `maxIter`
  *    is a safety bound only.
  */
object ConnectedComponents {

  /** Edge sets at or below this row count are solved by union-find on the
    * driver (one collect instead of ~2 jobs per label-propagation round).
    * The dup-pair edge set is tiny relative to the corpus, but at 10^12-doc
    * scale it still exceeds any driver, so the distributed loop is the
    * default beyond the threshold. 2M edges = 32 MB collected. */
  final val LocalEdgeThreshold = 2_000_000L

  /** edges: two LongType columns (src, dst), undirected, self-loops ok.
    * Returns (id, cluster_id) for every node that appears in an edge. */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int,
      localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    import spark.implicits._
    val e = edges.toDF("src", "dst").where($"src" =!= $"dst")

    // Fused local path: ONE job. limit(T+1)+collect — if it returned <= T
    // rows the limit was exhaustive and union-find runs on the driver
    // (union-find needs neither dedup nor symmetrization, so the previous
    // distinct-shuffle + count-job + collect-job collapse into one action:
    // driver sync points are the Amdahl term the north rule measures).
    // Beyond T the distributed loop takes over; the <= 2M collected rows
    // (32 MB) are discarded — negligible against a job that big.
    val lim = math.min(localThreshold + 1, Int.MaxValue.toLong).toInt
    val sample = e.as[(Long, Long)].limit(lim).collect()
    if (sample.isEmpty) return spark.emptyDataset[(Long, Long)].toDF("id", "cluster_id")
    if (sample.length <= localThreshold) return runLocal(spark, sample)

    val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select($"src".as("id")).distinct()
      .withColumn("label", $"id")
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), labels("label").as("cand"), lit(false).as("own"))
      val unioned = msgs.union(
        labels.select($"id", $"label".as("cand"), lit(true).as("own")))
      val agg = unioned
        .groupBy("id")
        .agg(min($"cand").as("label"),
          min(when($"own", $"cand")).as("old_label"))
      val obs = Observation(s"cc_iter_$iter")
      val observed = agg.observe(obs,
        sum(when($"label" =!= $"old_label", 1L).otherwise(0L)).as("changed"))
        .select($"id", $"label")
      val next = observed.localCheckpoint(true) // eager: runs the one job
      val changed = obs.get.get("changed") match {
        case Some(n: Long) => n
        case _             => 0L
      }
      labels = next
      converged = changed == 0L
      iter += 1
    }
    labels.select($"id", $"label".as("cluster_id"))
  }

  /** Driver-side union-find over a collected edge array (any orientation,
    * duplicates fine). Produces identical labels to the distributed loop:
    * every node's cluster_id is its component minimum. */
  private def runLocal(spark: SparkSession, pairs: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val idx = new java.util.HashMap[Long, Int]()
    pairs.foreach { case (a, b) =>
      if (!idx.containsKey(a)) idx.put(a, idx.size())
      if (!idx.containsKey(b)) idx.put(b, idx.size())
    }
    val n = idx.size()
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(idx.get(a)), find(idx.get(b)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // component minimum node id as the label
    val ids = new Array[Long](n)
    idx.forEach((k, v) => ids(v) = k)
    val minOf = new java.util.HashMap[Int, java.lang.Long]()
    var i = 0
    while (i < n) {
      val r = find(i)
      val cur = minOf.get(r)
      if (cur == null || ids(i) < cur) minOf.put(r, ids(i))
      i += 1
    }
    val rows = (0 until n).map(j => (ids(j), minOf.get(find(j)).longValue()))
    spark.createDataset(rows).toDF("id", "cluster_id").repartition(spark.sparkContext.defaultParallelism)
  }
}
