package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.model.GraftConfig
import graft.streaming.IncrementalDedup
import graft.streaming.IncrementalDedup.StateDirs

/** Streaming/incremental mode: micro-batches accumulate signature state;
  * cross-batch near-dups cluster together; state survives across batches
  * (the reference's resume semantics as streaming state, SURVEY §2.9). */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = GraftConfig(minLen = 1)

  private def page(url: String, text: String): (String, Timestamp, Array[Byte], String, String) =
    (url, new Timestamp(0L), null, text, "en")

  private def df(rows: Seq[(String, Timestamp, Array[Byte], String, String)]): DataFrame =
    rows.toDF("url", "warc_ts", "html", "text", "lang")

  private val baseText = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val nearText = (1 to 60).map(i => if (i == 30) "zqx" else s"tok$i").mkString(" ")
  private val otherText = (1 to 60).map(i => s"other$i").mkString(" ")

  test("cross-batch near-dups cluster; exact dups collapse to one node") {
    val root = Files.createTempDirectory("graft-inc").toString
    val dirs = StateDirs(root)

    // batch 1: base + exact copy + unrelated
    IncrementalDedup.processBatch(
      df(Seq(page("u://a", baseText), page("u://a2", baseText), page("u://z", otherText))),
      cfg, dirs)
    val c1 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c1("u://a") == c1("u://a2"), "exact dups in one batch must co-cluster")
    assert(c1("u://a") != c1("u://z"))

    // batch 2: near copy of batch-1 base arrives later
    IncrementalDedup.processBatch(df(Seq(page("u://b", nearText))), cfg, dirs)
    val c2 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c2.keySet == Set("u://a", "u://a2", "u://z", "u://b"))
    assert(c2("u://b") == c2("u://a"), "cross-batch near-dup must join the cluster")
    assert(c2("u://z") != c2("u://a"))

    // signature state holds one row per distinct content (3 contents)
    assert(spark.read.parquet(dirs.signatures).count() == 3)
  }

  test("re-sent content does not duplicate signature state") {
    val root = Files.createTempDirectory("graft-inc2").toString
    val dirs = StateDirs(root)
    IncrementalDedup.processBatch(df(Seq(page("u://a", baseText))), cfg, dirs)
    IncrementalDedup.processBatch(df(Seq(page("u://dup", baseText))), cfg, dirs)
    assert(spark.read.parquet(dirs.signatures).count() == 1, "signature recomputed for known content")
    val c = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c("u://a") == c("u://dup"))
  }

  test("re-crawled url with changed text re-clusters deterministically") {
    val root = Files.createTempDirectory("graft-inc4").toString
    val dirs = StateDirs(root)

    // batch 1: near-dup pair -> one cluster with an edge between their nodes
    IncrementalDedup.processBatch(
      df(Seq(page("u://a", baseText), page("u://b", nearText))), cfg, dirs, batchId = 1L)
    val c1 = spark.read.parquet(dirs.clusters).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).map(t => t._1 -> (t._2, t._3)).toMap
    assert(c1("u://a")._2 == c1("u://b")._2, "near pair must co-cluster")

    // batch 2: u://b re-crawled with COMPLETELY different text
    IncrementalDedup.processBatch(
      df(Seq(page("u://b", otherText))), cfg, dirs, batchId = 2L)
    val c2 = spark.read.parquet(dirs.clusters).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).map(t => t._1 -> (t._2, t._3)).toMap
    assert(c2.keySet == Set("u://a", "u://b"))
    assert(c2("u://b")._1 != c1("u://b")._1, "u://b must bind to its NEW content node")
    assert(c2("u://a")._2 != c2("u://b")._2,
      "stale edge via the dead node must not keep u://b in u://a's cluster")
    // rerunning the (idempotent) resolution on the same state is stable:
    // a third no-op batch leaves assignments identical
    IncrementalDedup.processBatch(
      df(Seq(page("u://b", otherText))), cfg, dirs, batchId = 3L)
    val c3 = spark.read.parquet(dirs.clusters).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).map(t => t._1 -> (t._2, t._3)).toMap
    assert(c3 == c2)
  }

  test("unchanged batches do not rewrite state or clusters") {
    val root = Files.createTempDirectory("graft-inc5").toString
    val dirs = StateDirs(root)
    val batch = df(Seq(page("u://a", baseText), page("u://b", nearText)))
    IncrementalDedup.processBatch(batch, cfg, dirs, batchId = 1L)

    def snapshot(dir: String): Map[String, Long] = {
      val d = java.nio.file.Paths.get(dir)
      import scala.jdk.CollectionConverters._
      Files.walk(d).iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    }
    val before = (snapshot(dirs.clusters), snapshot(dirs.members), snapshot(dirs.signatures))

    // identical batch re-delivered (e.g. replay after a restart): no-op
    IncrementalDedup.processBatch(batch, cfg, dirs, batchId = 2L)
    val after = (snapshot(dirs.clusters), snapshot(dirs.members), snapshot(dirs.signatures))
    assert(after == before, "unchanged batch must not rewrite state or clusters")
  }

  test("recluster is bounded to affected components (untouched clusters carried verbatim)") {
    val root = Files.createTempDirectory("graft-inc7").toString
    val dirs = StateDirs(root)
    val gText = (1 to 60).map(i => s"gee$i").mkString(" ")
    val hText = (1 to 60).map(i => if (i == 30) "zqh" else s"gee$i").mkString(" ")

    // batch 1: two independent near-dup clusters {a,b} and {g,h}
    IncrementalDedup.processBatch(
      df(Seq(page("u://a", baseText), page("u://b", nearText),
        page("u://g", gText), page("u://h", hText))), cfg, dirs, batchId = 1L)
    val c1 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c1("u://a") == c1("u://b") && c1("u://g") == c1("u://h"))
    assert(c1("u://a") != c1("u://g"))

    // sabotage the {g,h} edge in state: if the next batch re-ran CC
    // globally, g and h would fall apart; the bounded recluster must carry
    // their (untouched) cluster rows verbatim instead
    val ghCluster = c1("u://g")
    val edges = spark.read.parquet(dirs.edges).localCheckpoint(true)
    val gNodes = spark.read.parquet(dirs.clusters)
      .where(col("cluster_id") === ghCluster).select("node_id").collect().map(_.getLong(0)).toSet
    val pruned = edges.where(!col("id_a").isin(gNodes.toSeq: _*)).localCheckpoint(true)
    pruned.write.mode("overwrite").parquet(dirs.edges)

    // batch 2 touches only the {a,b} region (new near copy of a)
    val cText = baseText.replace("tok7", "zqc")
    IncrementalDedup.processBatch(df(Seq(page("u://c", cText))), cfg, dirs, batchId = 2L)
    val c2 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c2("u://c") == c2("u://a"), "new near copy must join the touched cluster")
    assert(c2("u://g") == ghCluster && c2("u://h") == ghCluster,
      "untouched cluster was recomputed instead of carried (bounded recluster broken)")
  }

  test("revert to earlier content resurrects the node and re-merges its cluster") {
    val root = Files.createTempDirectory("graft-inc8").toString
    val dirs = StateDirs(root)

    // batch 1: url1 (base) near-dups url2 -> one cluster, edge in state
    IncrementalDedup.processBatch(
      df(Seq(page("u://1", baseText), page("u://2", nearText))), cfg, dirs, batchId = 1L)
    val c1 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(c1("u://1")._2 == c1("u://2")._2)
    val nodeA = c1("u://1")._1

    // batch 2: url1 re-crawls to unrelated content -> split
    IncrementalDedup.processBatch(df(Seq(page("u://1", otherText))), cfg, dirs, batchId = 2L)
    val c2 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(c2("u://1")._2 != c2("u://2")._2)

    // batch 3: url1 REVERTS to the original text — the node resurrects with
    // its pre-existing edge, so url1 and url2 must co-cluster again even
    // though this batch computes no new signatures or edges
    IncrementalDedup.processBatch(df(Seq(page("u://1", baseText))), cfg, dirs, batchId = 3L)
    val c3 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(c3("u://1")._1 == nodeA, "revert must re-bind to the original content node")
    assert(c3("u://1")._2 == c3("u://2")._2,
      "resurrected node's pre-existing edge must re-merge the clusters")
  }

  test("interrupted clusters swap is healed on the next batch (no rebuild)") {
    val root = Files.createTempDirectory("graft-inc9").toString
    val dirs = StateDirs(root)
    IncrementalDedup.processBatch(
      df(Seq(page("u://a", baseText), page("u://b", nearText))), cfg, dirs, batchId = 1L)
    val before = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap

    // simulate a crash in the one bad window of the swap: the clusters
    // table renamed aside, the new table not yet moved in — plus a stale
    // abandoned write dir from the dead attempt
    val target = java.nio.file.Paths.get(dirs.clusters)
    java.nio.file.Files.move(target, java.nio.file.Paths.get(dirs.clusters + ".old"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dirs.clusters + ".tmp-dead"))
    assert(!java.nio.file.Files.exists(target))

    // next batch must heal the swap (restore the aside copy, drop the tmp
    // litter) and process incrementally on top of the restored table
    IncrementalDedup.processBatch(df(Seq(page("u://c", otherText))), cfg, dirs, batchId = 2L)
    val after = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(after("u://a") == before("u://a") && after("u://a") == after("u://b"))
    assert(after.contains("u://c"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dirs.clusters + ".old")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dirs.clusters + ".tmp-dead")))
  }

  test("state compaction bounds file count and per-batch input; outputs unchanged") {
    def fileCount(p: String): Int = {
      import scala.jdk.CollectionConverters._
      if (!Files.exists(java.nio.file.Paths.get(p))) 0
      else Files.list(java.nio.file.Paths.get(p)).iterator().asScala
        .count(Files.isRegularFile(_))
    }
    def runStream(compactThreshold: Int): (String, Map[String, Long]) = {
      val root = Files.createTempDirectory(s"graft-compact$compactThreshold").toString
      val dirs = StateDirs(root)
      val c = cfg.copy(incCompactFileThreshold = compactThreshold)
      // u://flip alternates between two contents every batch (member history
      // churn + dead-node churn); u://near stays a near-dup of baseText
      IncrementalDedup.processBatch(
        df(Seq(page("u://flip", baseText), page("u://near", nearText))), c, dirs, batchId = 0L)
      (1 to 11).foreach { i =>
        val text = if (i % 2 == 1) otherText else baseText
        IncrementalDedup.processBatch(df(Seq(page("u://flip", text))), c, dirs, batchId = i.toLong)
      }
      val clusters = spark.read.parquet(dirs.clusters).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      (root, clusters)
    }

    val (rootC, clustersC) = runStream(compactThreshold = 12)
    val (rootU, clustersU) = runStream(compactThreshold = 0) // disabled
    // cluster outputs are identical with and without compaction
    assert(clustersC == clustersU, "compaction changed cluster assignments")
    // after 12 batches, ends on otherText: flip and near are apart
    assert(clustersC("u://flip") != clustersC("u://near"))

    val dC = StateDirs(rootC); val dU = StateDirs(rootU)
    Seq(dC.members -> dU.members, dC.edges -> dU.edges,
      dC.bandIndex -> dU.bandIndex, dC.signatures -> dU.signatures).foreach {
      case (compacted, uncompacted) =>
        assert(fileCount(compacted) < fileCount(uncompacted),
          s"$compacted: ${fileCount(compacted)} !< ${fileCount(uncompacted)}")
    }
    // per-batch input stays bounded: edge state holds only live-edge rows
    assert(spark.read.parquet(dC.edges).count() <=
      spark.read.parquet(dU.edges).distinct().count())

    // a revert to GC'd content recomputes its signature and still re-merges;
    // threshold=1 forces a compaction at the end of this batch so the final
    // state is exactly the live corpus, independent of earlier compaction
    // timing
    IncrementalDedup.processBatch(df(Seq(page("u://flip", baseText))),
      cfg.copy(incCompactFileThreshold = 1), dC, batchId = 12L)
    val c2 = spark.read.parquet(dC.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c2("u://flip") == c2("u://near"),
      "revert to compacted-away content must re-cluster via signature recompute")
    // member history reduced to the latest binding per url
    assert(spark.read.parquet(dC.members).count() == 2)
    // dead nodes GC'd: exactly the two live contents keep signatures
    val liveNodes = spark.read.parquet(dC.clusters).select("node_id")
      .collect().map(_.getLong(0)).toSet
    val sigNodes = spark.read.parquet(dC.signatures).select("node_id")
      .collect().map(_.getLong(0)).toSeq
    assert(sigNodes.sorted == liveNodes.toSeq.sorted && sigNodes.size == 2,
      s"signatures $sigNodes != live $liveNodes")
    // edge endpoints restricted to live nodes
    val edgeEnds = spark.read.parquet(dC.edges).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(edgeEnds.subsetOf(liveNodes), s"dead edge endpoints: ${edgeEnds -- liveNodes}")
  }

  test("stored-side hot bands are salted, not dropped (cross-batch recall)") {
    val root = Files.createTempDirectory("graft-inc-hot").toString
    val dirs = StateDirs(root)
    // maxBandGroup=3 makes a 6-member stored band HOT; hardMax keeps salting on
    val hotCfg = cfg.copy(maxBandGroup = 3)
    val longBase = (1 to 200).map(i => s"w$i").mkString(" ")
    // 6 near-identical variants: most of their 32 band keys collide, so the
    // stored band index accumulates >3 members per shared band key
    val variants = (1 to 6).map(v => page(s"u://v$v", longBase.replace("w100", s"v$v")))
    IncrementalDedup.processBatch(df(variants), hotCfg, dirs, batchId = 1L)
    val c1 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c1.values.toSet.size == 1, "variants must co-cluster in batch 1")

    // batch 2: a 7th variant arrives alone — no in-batch pairs, so its ONLY
    // path into the cluster is the new-vs-stored band join, and every
    // shared band key is hot on the stored side. A drop-based guard loses
    // it entirely; salting must recover at least one colliding cell.
    IncrementalDedup.processBatch(
      df(Seq(page("u://v7", longBase.replace("w100", "v7")))), hotCfg, dirs, batchId = 2L)
    val c2 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c2("u://v7") == c2("u://v1"),
      "cross-batch near-dup through a hot stored band must still cluster (salted probe)")
  }

  test("batch-vs-incremental parity on a planted corpus; est-only edges counted") {
    // Planted truth: 3 dup groups whose members arrive in DIFFERENT batches
    // (forcing cross-batch, est-only verified edges), plus in-batch pairs
    // (exact-ST3-verified edges) and unrelated singletons. Batch ST3 and the
    // incremental two-tier verify must agree on the final url partition —
    // this is the gate on the documented "cross-batch pairs pass on
    // signature estimates only" permissiveness trade.
    def toks(g: String) = (1 to 60).map(i => s"$g$i").mkString(" ")
    def near(g: String, odd: String) = (1 to 60).map(i => if (i == 30) odd else s"$g$i").mkString(" ")
    val all = Seq(
      // group A: base + near copy (batch 1) + another near copy (batch 2);
      // in-batch pairs must be NEAR copies — exact copies collapse to one
      // node at distinctContents and produce no edge at all
      page("u://a1", toks("aa")), page("u://a2", near("aa", "zq0")), page("u://a3", near("aa", "zq1")),
      // group B: base (batch 1) + near copy (batch 3)
      page("u://b1", toks("bb")), page("u://b2", near("bb", "zq2")),
      // group C: near pair entirely within batch 2
      page("u://c1", toks("cc")), page("u://c2", near("cc", "zq3")),
      // unrelated singletons, one per batch
      page("u://s1", toks("dd")), page("u://s2", toks("ee")), page("u://s3", toks("ff")))
    val byUrl = all.map(p => p._1 -> p).toMap
    val batches = Seq(
      Seq("u://a1", "u://a2", "u://b1", "u://s1"),
      Seq("u://a3", "u://c1", "u://c2", "u://s2"),
      Seq("u://b2", "u://s3")).map(_.map(byUrl))

    def groupsOf(rows: Array[(String, Long)]): Set[Set[String]] =
      rows.groupBy(_._2).values.map(_.map(_._1).toSet).filter(_.size >= 2).toSet

    // one-shot batch pipeline over the full corpus
    val batchGroups = groupsOf(
      Pipeline.run(spark, df(all), cfg).clusters.select("url", "cluster_id")
        .collect().map(r => (r.getString(0), r.getLong(1))))
    assert(batchGroups == Set(Set("u://a1", "u://a2", "u://a3"), Set("u://b1", "u://b2"),
      Set("u://c1", "u://c2")), s"batch pipeline missed the planted truth: $batchGroups")

    // same corpus, incrementally
    val root = Files.createTempDirectory("graft-parity").toString
    val dirs = StateDirs(root)
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalDedup.processBatch(df(b), cfg, dirs, batchId = i.toLong) }
    val incGroups = groupsOf(spark.read.parquet(dirs.clusters).select("url", "cluster_id")
      .collect().map(r => (r.getString(0), r.getLong(1))))
    assert(incGroups == batchGroups,
      s"incremental clustering diverged from batch: $incGroups vs $batchGroups")

    // the metrics table makes the est-only trade auditable: cross-batch
    // edges (a3->a1/a2, b2->b1) were accepted on signature estimates, and
    // in-batch edges (a1-a2, c1-c2) got the exact ST3 pass
    // the edges table's orientation invariant must hold for BOTH verify
    // tiers (remap/compaction rely on it; a reversed cross-batch edge would
    // double-store under re-discovery)
    val edges = spark.read.parquet(dirs.edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty && edges.forall { case (a, b) => a < b },
      s"edges orientation (id_a < id_b) violated: ${edges.filterNot(e => e._1 < e._2).mkString(",")}")

    val m = spark.read.parquet(s"$root/metrics")
    assert(m.columns.toSet == Set("batch_id", "candidates_new", "candidates_cross",
      "edges_exact_verified", "edges_est_only", "committed_ms"))
    val sums = m.agg(org.apache.spark.sql.functions.sum("edges_exact_verified"),
      org.apache.spark.sql.functions.sum("edges_est_only")).collect()(0)
    assert(sums.getLong(0) >= 2, s"expected exact-verified in-batch edges, got ${sums.getLong(0)}")
    assert(sums.getLong(1) >= 2, s"expected est-only cross-batch edges, got ${sums.getLong(1)}")
  }

  test("incRetainTexts: cross-batch pairs get the full ST3 verify (zero est-only)") {
    // Same planted corpus/batching as the parity test, with texts retained:
    // every cross-batch pair now has both texts on hand, so the est tier
    // must never fire and the clustering must equal the batch pipeline's
    // BY THE SAME RULE (full ST3), not merely agree on this corpus.
    def toks(g: String) = (1 to 60).map(i => s"$g$i").mkString(" ")
    def near(g: String, odd: String) = (1 to 60).map(i => if (i == 30) odd else s"$g$i").mkString(" ")
    val all = Seq(
      page("u://a1", toks("aa")), page("u://a2", near("aa", "zq0")), page("u://a3", near("aa", "zq1")),
      page("u://b1", toks("bb")), page("u://b2", near("bb", "zq2")),
      page("u://c1", toks("cc")), page("u://c2", near("cc", "zq3")),
      page("u://s1", toks("dd")), page("u://s2", toks("ee")), page("u://s3", toks("ff")))
    val byUrl = all.map(p => p._1 -> p).toMap
    val batches = Seq(
      Seq("u://a1", "u://a2", "u://b1", "u://s1"),
      Seq("u://a3", "u://c1", "u://c2", "u://s2"),
      Seq("u://b2", "u://s3")).map(_.map(byUrl))
    def groupsOf(rows: Array[(String, Long)]): Set[Set[String]] =
      rows.groupBy(_._2).values.map(_.map(_._1).toSet).filter(_.size >= 2).toSet
    val cfgR = cfg.copy(incRetainTexts = true)

    val root = Files.createTempDirectory("graft-retain").toString
    val dirs = StateDirs(root)
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalDedup.processBatch(df(b), cfgR, dirs, batchId = i.toLong) }
    val incGroups = groupsOf(spark.read.parquet(dirs.clusters).select("url", "cluster_id")
      .collect().map(r => (r.getString(0), r.getLong(1))))
    assert(incGroups == Set(Set("u://a1", "u://a2", "u://a3"), Set("u://b1", "u://b2"),
      Set("u://c1", "u://c2")), s"retain-texts incremental missed the planted truth: $incGroups")
    // the whole point of the knob: nothing was accepted on estimates alone
    val sums = spark.read.parquet(s"$root/metrics")
      .agg(org.apache.spark.sql.functions.sum("edges_exact_verified"),
        org.apache.spark.sql.functions.sum("edges_est_only")).collect()(0)
    assert(sums.getLong(1) == 0, s"est-only edges with texts retained: ${sums.getLong(1)}")
    assert(sums.getLong(0) >= 4, s"expected all edges exact-verified, got ${sums.getLong(0)}")
    // texts state holds one row per distinct content, keyed by node_id
    val texts = spark.read.parquet(dirs.texts)
    assert(texts.columns.toSet == Set("node_id", "text"))
    assert(texts.select("node_id").distinct().count() == texts.count())

    // toggle-on mid-stream: batch 1 without retention, rest with. Cross
    // pairs against the unretained batch-1 nodes must FALL BACK to the est
    // gates (counted), never drop; clusters still match the planted truth.
    val root2 = Files.createTempDirectory("graft-retain-mid").toString
    val dirs2 = StateDirs(root2)
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalDedup.processBatch(df(b),
        if (i == 0) cfg else cfgR, dirs2, batchId = i.toLong) }
    val midGroups = groupsOf(spark.read.parquet(dirs2.clusters).select("url", "cluster_id")
      .collect().map(r => (r.getString(0), r.getLong(1))))
    assert(midGroups == incGroups, s"mid-stream toggle lost clusters: $midGroups")
    val sums2 = spark.read.parquet(s"$root2/metrics")
      .agg(org.apache.spark.sql.functions.sum("edges_est_only")).collect()(0)
    assert(sums2.getLong(0) >= 1,
      "expected est-only fallback edges against pre-toggle (unretained) nodes")
  }

  test("combined census: stored+batch jointly over maxBandGroup salts the cell") {
    import org.apache.spark.sql.functions.{xxhash64, pmod, lit => flit}
    val cfgC = cfg.copy(maxBandGroup = 4)
    // One band key: 3 stored members (cold under a stored-only census) plus
    // 3 batch members -> combined 6 > 4 -> the cell must be salted into
    // ceil(6/4) = 2 cells; an unsalted cold join would emit all 9 pairs.
    val key = 77L
    val stored = Seq(1L, 2L, 3L).map((_, key)).toDF("node_id", "band_key")
    val batch = Seq(11L, 12L, 13L).map((_, key)).toDF("node_id", "band_key")
    val got = IncrementalDedup.crossBatchCandidates(batch, stored, cfgC)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salts = stored.union(batch)
      .withColumn("salt", pmod(xxhash64($"node_id", $"band_key"), flit(2L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = (for {
      n <- Seq(11L, 12L, 13L); s <- Seq(1L, 2L, 3L) if salts(n) == salts(s)
    } yield (math.min(n, s), math.max(n, s))).toSet
    assert(expected.size < 9, "test fixture degenerate: all members hashed to one salt cell")
    assert(got == expected, s"expected salted cells $expected, got $got")
  }

  test("replay duplicates cannot shift a band across the salt/drop thresholds") {
    val cfgC = cfg.copy(maxBandGroup = 8, hardMaxBandGroup = 10)
    val key = 77L
    // True state: 4 distinct stored members. A crashed earlier batch left
    // every historical row duplicated, and a crashed attempt of THIS batch
    // already appended its own 3 rows (bands land before the signature
    // gate in the append-order contract). A raw census would count
    // 8 + 3 stored rows + 3 batch rows = 14 > hardMaxBandGroup = 10 and
    // silently drop the band — permanent recall loss, since these nodes
    // are never re-probed once signatures land. The true combined size is
    // 4 + 3 = 7 <= maxBandGroup: a plain cold join emitting every cross
    // pair, with the batch's own replay rows excluded from the stored side.
    val storedTrue = Seq(1L, 2L, 3L, 4L)
    val stored = (storedTrue ++ storedTrue ++ Seq(11L, 12L, 13L))
      .map((_, key)).toDF("node_id", "band_key")
    val batch = Seq(11L, 12L, 13L).map((_, key)).toDF("node_id", "band_key")
    val got = IncrementalDedup.crossBatchCandidates(batch, stored, cfgC)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for { n <- Seq(11L, 12L, 13L); s <- storedTrue }
      yield (math.min(n, s), math.max(n, s))).toSet
    assert(got == expected, s"expected the full cold cross product $expected, got $got")
  }

  test("simhashTier chunk keys flow into the durable band index") {
    val root = Files.createTempDirectory("graft-inc-sh").toString
    val dirs = StateDirs(root)
    val c = cfg.copy(simhashTier = true)
    IncrementalDedup.processBatch(df(Seq(page("u://a", baseText))), c, dirs, batchId = 1L)
    // 32 MinHash band keys + (maxHamming+1)=4 pigeonhole chunk keys per node:
    // cross-batch probing inherits the tier with no extra state machinery
    assert(spark.read.parquet(dirs.bandIndex).count() == 36)
    // a near copy in a later batch still clusters through the unified index
    IncrementalDedup.processBatch(df(Seq(page("u://b", nearText))), c, dirs, batchId = 2L)
    val cl = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(cl("u://a") == cl("u://b"))
  }

  test("simhashTier toggle on existing state rebuilds the durable band index") {
    val root = Files.createTempDirectory("graft-inc-sh2").toString
    val dirs = StateDirs(root)
    // built MinHash-only
    IncrementalDedup.processBatch(df(Seq(page("u://a", baseText))), cfg, dirs, batchId = 1L)
    assert(spark.read.parquet(dirs.bandIndex).count() == 32)
    // toggle ON: the stored doc's index must gain chunk keys BEFORE the new
    // batch probes it — otherwise pre-toggle docs never get the promised
    // cross-batch Hamming recall
    IncrementalDedup.processBatch(df(Seq(page("u://z", otherText))),
      cfg.copy(simhashTier = true), dirs, batchId = 2L)
    assert(spark.read.parquet(dirs.bandIndex).count() == 72) // 2 docs x 36
    // toggle OFF: chunk keys are removed, not stranded forever
    val gText = (1 to 60).map(i => s"gee$i").mkString(" ")
    IncrementalDedup.processBatch(df(Seq(page("u://g", gText))), cfg, dirs, batchId = 3L)
    assert(spark.read.parquet(dirs.bandIndex).count() == 96) // 3 docs x 32
    // clustering state is untouched by the rebuilds
    val cl = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(cl.keySet == Set("u://a", "u://z", "u://g"))
    assert(Set(cl("u://a"), cl("u://z"), cl("u://g")).size == 3)
  }

  test("signature-config change on existing state is refused; thresholds may move") {
    val root = Files.createTempDirectory("graft-inc-sigcfg").toString
    val dirs = StateDirs(root)
    IncrementalDedup.processBatch(df(Seq(page("u://a", baseText))), cfg, dirs, batchId = 1L)

    // a changed seed would make every new band key silently miss the stored
    // index (permanent cross-batch recall loss) -> refuse loudly
    val e = intercept[IllegalStateException] {
      IncrementalDedup.processBatch(df(Seq(page("u://b", nearText))),
        cfg.copy(seed = 43L), dirs, batchId = 2L)
    }
    assert(e.getMessage.contains("signature config"))
    // a changed permutation count would crash estimateJaccard mid-batch
    intercept[IllegalStateException] {
      IncrementalDedup.processBatch(df(Seq(page("u://b", nearText))),
        cfg.copy(numPerm = 64, bands = 32), dirs, batchId = 2L)
    }
    intercept[IllegalStateException] {
      IncrementalDedup.processBatch(df(Seq(page("u://b", nearText))),
        cfg.copy(shingleK = 4), dirs, batchId = 2L)
    }
    // threshold knobs gate future DECISIONS, not the validity of stored
    // signatures -> allowed, and the stream keeps working
    IncrementalDedup.processBatch(df(Seq(page("u://b", nearText))),
      cfg.copy(minJaccard = 0.75), dirs, batchId = 3L)
    val c = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c("u://a") == c("u://b"), "stream must keep clustering after a threshold change")
  }

  test("maxHamming change with the chunk tier on rebuilds the durable band index") {
    val root = Files.createTempDirectory("graft-inc-chunks").toString
    val dirs = StateDirs(root)
    val tierCfg = cfg.copy(simhashTier = true) // maxHamming=3 -> 4 chunks: 36 keys/doc
    IncrementalDedup.processBatch(df(Seq(page("u://a", baseText))), tierCfg, dirs, batchId = 1L)
    assert(spark.read.parquet(dirs.bandIndex).count() == 36)
    // maxHamming 3 -> 1 redraws every chunk boundary (2 chunks): stored
    // docs' keys must be rebuilt or cross-batch chunk probes silently miss
    IncrementalDedup.processBatch(df(Seq(page("u://z", otherText))),
      tierCfg.copy(maxHamming = 1), dirs, batchId = 2L)
    assert(spark.read.parquet(dirs.bandIndex).count() == 68) // 2 docs x (32+2)
  }

  test("re-published stored content verifies exactly, never by estimate (retain off)") {
    val root = Files.createTempDirectory("graft-inc-repub").toString
    val dirs = StateDirs(root)
    IncrementalDedup.processBatch(df(Seq(page("u://a", baseText))), cfg, dirs, batchId = 1L)
    // batch 2 re-publishes the KNOWN content (new url, same text) and adds a
    // near-dup: the cross pair's both texts are in this very batch, so it
    // must take the full exact ST3 tier — edges_est_only stays 0 — even
    // with incRetainTexts off
    IncrementalDedup.processBatch(
      df(Seq(page("u://a2", baseText), page("u://b", nearText))), cfg, dirs, batchId = 2L)
    val m = spark.read.parquet(dirs.metrics)
      .where(col("batch_id") === 2L).collect()(0)
    assert(m.getAs[Long]("candidates_cross") >= 1L, "cross pair must be generated")
    assert(m.getAs[Long]("edges_est_only") == 0L,
      "re-published content must route to the exact tier, not the estimate")
    assert(m.getAs[Long]("edges_exact_verified") >= 1L)
    val c = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c("u://a") == c("u://a2") && c("u://a") == c("u://b"))
  }

  test("v1 state migrates in place; future-versioned state is refused") {
    val root = Files.createTempDirectory("graft-inc6").toString
    val dirs = StateDirs(root)

    // hand-build round-1-shaped (v1) state: members without (warc_ts,
    // batch_id), no version file — exactly what a v1 deployment left behind
    val extractedV1 = graft.Pipeline.extract(df(Seq(page("u://old", baseText))), cfg)
    extractedV1.select("url", "node_id", "n_bytes").write.parquet(dirs.members)
    val sigsV1 = graft.Pipeline.signatures(graft.Pipeline.distinctContents(extractedV1), cfg)
    sigsV1.write.parquet(dirs.signatures)
    sigsV1.selectExpr("node_id", "explode(band_hashes) AS band_key")
      .write.parquet(dirs.bandIndex)

    // first batch against old state triggers migration, then works normally:
    // the new near-dup of the v1 url clusters with it
    IncrementalDedup.processBatch(df(Seq(page("u://new", nearText))), cfg, dirs, batchId = 5L)
    val m = spark.read.parquet(dirs.members)
    assert(m.columns.toSet == Set("url", "node_id", "n_bytes", "warc_ts", "batch_id"))
    val c = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c.keySet == Set("u://old", "u://new"))
    assert(c("u://old") == c("u://new"), "migrated v1 member must still cluster")
    // migrated rows are strictly older than any live batch -> a re-crawl of
    // the v1 url supersedes it
    IncrementalDedup.processBatch(df(Seq(page("u://old", otherText))), cfg, dirs, batchId = 6L)
    val c2 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c2("u://old") != c2("u://new"))

    // a future schema version is refused, not silently reinterpreted
    java.nio.file.Files.write(java.nio.file.Paths.get(dirs.versionFile),
      s"""{"version": ${IncrementalDedup.StateVersion + 1}}""".getBytes)
    val e = intercept[IllegalStateException] {
      IncrementalDedup.processBatch(df(Seq(page("u://x", baseText))), cfg, dirs, batchId = 7L)
    }
    assert(e.getMessage.contains("refusing"))
  }

  test("a same-batch older observation cannot rebind a url past its current binding") {
    val root = Files.createTempDirectory("graft-inc-winner").toString
    val dirs = StateDirs(root)
    IncrementalDedup.processBatch(df(Seq(page("u://r", baseText))), cfg, dirs, batchId = 1L)
    val boundTo = spark.read.parquet(dirs.clusters)
      .where(col("url") === "u://r").select("node_id").head().getLong(0)

    // one micro-batch, TWO crawls of u://r: an OLDER one with new content,
    // a NEWER one re-observing the currently-bound content. The within-
    // batch warc_ts winner matches the current binding, so the batch is a
    // no-op — the older row must not sneak past the unchanged-binding
    // filter and rebind the url to stale content (regression: the filter
    // used to run per row, BEFORE within-batch winner resolution).
    val twoCrawls = Seq(
      ("u://r", new Timestamp(1000L), null: Array[Byte], otherText, "en"),
      ("u://r", new Timestamp(2000L), null: Array[Byte], baseText, "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
    IncrementalDedup.processBatch(twoCrawls, cfg, dirs, batchId = 2L)

    val after = spark.read.parquet(dirs.clusters)
      .where(col("url") === "u://r").select("node_id").head().getLong(0)
    assert(after == boundTo, "latest same-batch observation matches the binding -> no rebind")
    assert(spark.read.parquet(dirs.members).count() == 1, "no-op batch must not append members")
  }

  test("crash between state appends replays to the no-crash result (append order contract)") {
    // control: two batches, no crash — batch 2's near-dup crosses batches
    val b1 = df(Seq(page("u://a", baseText), page("u://z", otherText)))
    def b2 = df(Seq(page("u://b", nearText)))
    def groups(dirs: StateDirs) = spark.read.parquet(dirs.clusters).collect()
      .groupBy(_.getLong(2)).values.map(_.map(_.getString(0)).toSet).toSet
    val rootC = Files.createTempDirectory("graft-inc-crash-c").toString
    val dC = StateDirs(rootC)
    IncrementalDedup.processBatch(b1, cfg, dC, batchId = 1L)
    IncrementalDedup.processBatch(b2, cfg, dC, batchId = 2L)
    val control = groups(dC)
    assert(control.exists(g => g.contains("u://a") && g.contains("u://b")),
      "sanity: the cross-batch near-dup pair must co-cluster in the control")

    // kill batch 2 before its (k+1)-th state append (k=0..3: band index,
    // edges, members, signatures), then REPLAY it — foreachBatch is
    // at-least-once. Whatever the crash point, the replay must converge to
    // the control clusters (the signatures append runs LAST precisely so a
    // replay recomputes anything not yet durable), and the metrics audit
    // table must hold exactly one row for the replayed batch (it is
    // appended after the clusters swap).
    for (k <- 0 to 3) {
      val root = Files.createTempDirectory(s"graft-inc-crash-$k").toString
      val dirs = StateDirs(root)
      IncrementalDedup.processBatch(b1, cfg, dirs, batchId = 1L)
      val e = intercept[RuntimeException] {
        IncrementalDedup.processBatch(b2, cfg, dirs, batchId = 2L, crashAfterAppends = k)
      }
      assert(e.getMessage.contains("injected crash"))
      IncrementalDedup.processBatch(b2, cfg, dirs, batchId = 2L)
      assert(groups(dirs) == control, s"crash point $k: replay must match the no-crash result")
      assert(spark.read.parquet(dirs.metrics).where(col("batch_id") === 2L).count() == 1,
        s"crash point $k: exactly one metrics row for the replayed batch")
    }
  }

  test("remap refuses pre-v3 state instead of wedging it behind its own journal") {
    val root = Files.createTempDirectory("graft-remap-v1").toString
    val dirs = StateDirs(root)
    // v1-shaped state: members without (warc_ts, batch_id), no version file
    val extractedV1 = graft.Pipeline.extract(df(Seq(page("u://old", baseText))), cfg)
    extractedV1.select("url", "node_id", "n_bytes").write.parquet(dirs.members)

    val mapping = Seq((1L, 2L)).toDF("old_id", "new_id")
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.remapNodeIds(spark, dirs, mapping)
    }
    assert(e.getMessage.contains("migrate"))
    // refused BEFORE journaling: the state is untouched and still migrates
    assert(!Files.exists(java.nio.file.Paths.get(root, "_remap_journal.json")))
    IncrementalDedup.processBatch(df(Seq(page("u://new", nearText))), cfg, dirs, batchId = 3L)
    assert(spark.read.parquet(dirs.members).columns.contains("batch_id"))
  }

  test("node-id remap re-keys all state without recompute; bad mappings refused") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-remap").toString
    val dirs = StateDirs(root)
    IncrementalDedup.processBatch(
      df(Seq(page("u://a", baseText), page("u://b", nearText), page("u://z", otherText))),
      cfg, dirs, batchId = 1L)
    val before = spark.read.parquet(dirs.clusters).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val groupsBefore = before.groupBy(_._3).values.map(_.map(_._1).toSet).toSet
    val oldIds = before.map(_._2).distinct.sorted

    // bijective shift of every stored id
    val mapping = oldIds.toSeq.map(id => (id, id + 1000L)).toDF("old_id", "new_id")
    IncrementalDedup.remapNodeIds(spark, dirs, mapping)

    val after = spark.read.parquet(dirs.clusters).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // same url partition into clusters, labels recomputed as component mins
    val groupsAfter = after.groupBy(_._3).values.map(_.map(_._1).toSet).toSet
    assert(groupsAfter == groupsBefore, "remap changed cluster membership")
    assert(after.map(_._2).toSet == oldIds.map(_ + 1000L).toSet)
    after.groupBy(_._3).foreach { case (label, rows) =>
      assert(label == rows.map(_._2).min, s"cluster label $label is not the component min") }
    // every state table re-keyed; signatures/bands/edges NOT recomputed
    assert(spark.read.parquet(dirs.signatures).select("node_id").collect()
      .map(_.getLong(0)).toSet == oldIds.map(_ + 1000L).toSet)
    assert(spark.read.parquet(dirs.bandIndex).select("node_id").collect()
      .map(_.getLong(0)).toSet.subsetOf(oldIds.map(_ + 1000L).toSet))
    val edges = spark.read.parquet(dirs.edges).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty && edges.forall { case (a, b) => a < b &&
      oldIds.map(_ + 1000L).contains(a) && oldIds.map(_ + 1000L).contains(b) })
    // members re-keyed consistently with clusters
    val mem = spark.read.parquet(dirs.members).select("url", "node_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mem == after.map(t => t._1 -> t._2).toMap)

    // refusal: non-1-to-1 mapping (two olds to one new)
    val clash = Seq((after.head._2, 7L), (after.last._2, 7L)).toDF("old_id", "new_id")
    intercept[IllegalArgumentException] { IncrementalDedup.remapNodeIds(spark, dirs, clash) }
    // refusal: new id collides with an unmapped stored id
    val collide = Seq((after.head._2, after.last._2)).toDF("old_id", "new_id")
    intercept[IllegalArgumentException] { IncrementalDedup.remapNodeIds(spark, dirs, collide) }
    // state untouched by the refused attempts
    assert(spark.read.parquet(dirs.clusters).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.sameElements(after.sorted))

    // crash mid-remap: two tables rewritten, then death. The journal makes
    // the state quarantined (batches refuse) and the SAME mapping resumable
    // to a consistent end state; a DIFFERENT mapping is refused.
    val mapping2 = oldIds.toSeq.map(id => (id + 1000L, id + 2000L)).toDF("old_id", "new_id")
    intercept[RuntimeException] {
      IncrementalDedup.remapNodeIds(spark, dirs, mapping2, crashAfterTables = 2)
    }
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/_remap_journal.json")))
    intercept[IllegalStateException] { // batches quarantined while partial
      IncrementalDedup.processBatch(df(Seq(page("u://q", otherText))), cfg, dirs, batchId = 9L)
    }
    intercept[IllegalArgumentException] { // a different mapping cannot mix in
      IncrementalDedup.remapNodeIds(spark, dirs,
        oldIds.toSeq.map(id => (id + 1000L, id + 5000L)).toDF("old_id", "new_id"))
    }
    IncrementalDedup.remapNodeIds(spark, dirs, mapping2) // resume to completion
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/_remap_journal.json")))
    val after2 = spark.read.parquet(dirs.clusters).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(after2.groupBy(_._3).values.map(_.map(_._1).toSet).toSet == groupsBefore)
    assert(after2.map(_._2).toSet == oldIds.map(_ + 2000L).toSet)
    assert(spark.read.parquet(dirs.signatures).select("node_id").collect()
      .map(_.getLong(0)).toSet == oldIds.map(_ + 2000L).toSet)
  }

  test("canonicalizeUrls: spelled variants bind ONE canonical url across batches") {
    // The knob lives in the shared extract stage (Pipeline.extract), so
    // incremental mode inherits it — this gates the re-crawl/latest-binding
    // semantics when one page arrives under different spellings per batch.
    val ccfg = cfg.copy(canonicalizeUrls = true)
    val root = Files.createTempDirectory("graft-inc-canon").toString
    val dirs = StateDirs(root)
    val freshText = (1 to 60).map(i => s"fresh$i").mkString(" ")
    def pageAt(url: String, text: String, ts: Long): (String, Timestamp, Array[Byte], String, String) =
      (url, new Timestamp(ts), null, text, "en")

    // batch 1: TWO spellings of one page with the SAME content (must be one
    // observation, with the deterministic max-warc_ts survivor), plus an
    // unrelated page.
    IncrementalDedup.processBatch(
      df(Seq(
        pageAt("HTTP://Example.COM:80/a//index.html", baseText, 1000L),
        pageAt("http://www.example.com/a/", baseText, 2000L),
        pageAt("http://other.com/z", otherText, 1000L))), ccfg, dirs, batchId = 1L)
    val canon = "http://example.com/a"
    val m1 = spark.read.parquet(dirs.members)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getTimestamp(3)))
    assert(m1.map(_._1).toSet == Set(canon, "http://other.com/z"),
      "state must hold canonical spellings only")
    assert(m1.count(_._1 == canon) == 1,
      "k spellings of one (url, content) must be ONE member observation")
    assert(m1.find(_._1 == canon).get._3 == new Timestamp(2000L),
      "survivor among collapsed spellings must be the max-warc_ts one")
    val c1 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(c1.keySet == Set(canon, "http://other.com/z"))

    // batch 2: a THIRD spelling re-crawls the page with NEW content at a
    // later warc_ts — the canonical url must re-bind to the new node.
    IncrementalDedup.processBatch(
      df(Seq(pageAt("http://example.com/a?utm_source=feed", freshText, 3000L))),
      ccfg, dirs, batchId = 2L)
    val c2 = spark.read.parquet(dirs.clusters).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(c2.keySet == Set(canon, "http://other.com/z"),
      "re-crawl under a new spelling must not mint a second url row")
    assert(c2(canon)._1 != c1(canon)._1,
      "latest binding must move the canonical url to the re-crawled content")
  }

  test("streaming query end-to-end via MemoryStream + AvailableNow") {
    val root = Files.createTempDirectory("graft-inc3").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Array[Byte], String, String)]
    mem.addData(page("s://1", baseText), page("s://2", baseText))
    val q = IncrementalDedup.start(
      mem.toDF().toDF("url", "warc_ts", "html", "text", "lang"), cfg, root)
    q.awaitTermination(120000)
    val c = spark.read.parquet(StateDirs(root).clusters).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(c("s://1") == c("s://2"))
  }
}
