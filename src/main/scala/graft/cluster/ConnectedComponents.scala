package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative min-label propagation connected components over a DataFrame of
  * undirected edges (ST4). Labels converge to the component-minimum node id,
  * so cluster ids are deterministic (no partition-dependent id generation —
  * SURVEY.md §7.5).
  *
  * Scale notes (100 TB design):
  *  - each iteration is one shuffle (join on id) + one hash agg; dup-graph
  *    components are dense with tiny diameters, so iteration counts are small
  *    (observed 2-4 on web-dup shaped graphs);
  *  - `localCheckpoint` after every iteration truncates lineage so plan size
  *    and task closures stay O(1) in the iteration count (on a real cluster,
  *    a reliable checkpoint dir / stage table is the durable variant);
  *  - convergence is detected by an observed changed-label count reaching 0,
  *    with `maxIter` as a safety bound.
  */
object ConnectedComponents {

  /** edges: two LongType columns (src, dst), undirected, self-loops ok.
    * Returns (id, cluster_id) for every node that appears in an edge. */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int): DataFrame = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
      .where($"src" =!= $"dst")
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select($"src".as("id")).distinct()
      .withColumn("label", $"id")
      .localCheckpoint(true)

    var iter = 0
    var converged = sym.isEmpty
    while (!converged && iter < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), labels("label"))
      val next = msgs.union(labels)
        .groupBy("id").agg(min($"label").as("label"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), "id")
        .where($"n.label" =!= $"o.label")
        .count()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    labels.select($"id", $"label".as("cluster_id"))
  }
}
