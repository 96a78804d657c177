package graft

import graft.cluster.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {

  private def bfsComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    edges.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val label = scala.collection.mutable.Map[Long, Long]()
    nodes.sorted.foreach { n =>
      if (!label.contains(n)) {
        val queue = scala.collection.mutable.Queue(n)
        val comp = scala.collection.mutable.ArrayBuffer[Long]()
        while (queue.nonEmpty) {
          val v = queue.dequeue()
          if (!label.contains(v)) {
            label(v) = -1; comp += v
            adj(v).foreach(w => if (!label.contains(w)) queue.enqueue(w))
          }
        }
        val m = comp.min
        comp.foreach(v => label(v) = m)
      }
    }
    label.toMap
  }

  test("matches BFS oracle on random graphs (local union-find path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    (1 to 5).foreach { trial =>
      val n = 60
      val edges = (1 to 80).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expected = bfsComponents(edges)
      val got = ConnectedComponents.run(spark, edges.toDF("src", "dst"), maxIter = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("matches BFS oracle on random graphs (distributed label propagation)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    (1 to 3).foreach { trial =>
      val n = 60
      val edges = (1 to 80).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expected = bfsComponents(edges)
      val got = ConnectedComponents.run(spark, edges.toDF("src", "dst"),
        maxIter = 50, localThreshold = 0L) // force the distributed path
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("local and distributed paths agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val edges = (1 to 150).map(_ => (rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val local = ConnectedComponents.run(spark, df, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dist = ConnectedComponents.run(spark, df, 50, localThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(local == dist)
  }

  test("long chain converges (worst-case diameter)") {
    import spark.implicits._
    val edges = (0L until 30L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(spark, edges.toDF("src", "dst"), maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L))
    assert(got.size == 31)
  }

  test("durable labels: interrupted distributed run resumes from committed state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-durable").toString
    // 31-node chain: min-label propagation needs ~30 iterations — the
    // worst case where losing progress matters
    val edges = (0L until 30L).map(i => (i, i + 1)).toDF("src", "dst")
    val expected = (0L to 30L).map(_ -> 0L).toMap

    // "interrupted" run: only 10 iterations allowed, state committed per
    // iter. Exhausting maxIter unconverged FAILS LOUDLY (silently returning
    // partial labels would split real clusters) — but every completed
    // iteration is already durable, so the failure loses no progress.
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(spark, edges, maxIter = 10,
        localThreshold = 0L, durableDir = Some(dir))
    }
    assert(e.getMessage.contains("did not converge"))
    assert(ConnectedComponents.lastRunIterations == 10)

    // restart: resumes at iteration 11 instead of propagating from scratch
    val got = ConnectedComponents.run(spark, edges, maxIter = 50,
      localThreshold = 0L, durableDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(ConnectedComponents.lastRunIterations < 30,
      s"resume did not use durable state: ${ConnectedComponents.lastRunIterations} iterations")

    // GC: each commit retires the previous iteration's label table, so the
    // store holds ONE labels dir, not one per iteration
    def labelDirs(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("labels-iter")).toSeq
    }
    assert(labelDirs().size == 1,
      s"superseded label tables not GC'd: ${labelDirs().sorted}")

    // different edge set under the same dir: state is ignored, not reused,
    // and the stale store is cleared rather than stranded forever
    val other = Seq((100L, 101L), (101L, 102L)).toDF("src", "dst")
    val got2 = ConnectedComponents.run(spark, other, maxIter = 50,
      localThreshold = 0L, durableDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(100L -> 100L, 101L -> 100L, 102L -> 100L))
    assert(labelDirs().size == 1,
      s"stale-edge-set label tables not cleared: ${labelDirs().sorted}")
  }

  test("resume from a commit at iter == maxIter verifies instead of failing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-maxiter").toString
    // The 0-1-2 chain converges on exactly its 3rd pass (two label moves,
    // then one zero-change verification), so a maxIter=3 run commits its
    // final labels AT the bound. Resuming from that store (driver killed
    // between the commit and run()'s return) must re-verify and return the
    // fixpoint, not throw "did not converge" at the fully-converged state.
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val expected = Map(0L -> 0L, 1L -> 0L, 2L -> 0L)
    val first = ConnectedComponents.run(spark, edges, maxIter = 3,
      localThreshold = 0L, durableDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == expected)
    assert(ConnectedComponents.lastRunIterations == 3,
      s"fixture drift: expected convergence exactly at the bound, " +
        s"ran ${ConnectedComponents.lastRunIterations}")
    val resumed = ConnectedComponents.run(spark, edges, maxIter = 3,
      localThreshold = 0L, durableDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == expected)
    assert(ConnectedComponents.lastRunIterations == 1,
      s"resume should verify in ONE iteration, ran ${ConnectedComponents.lastRunIterations}")
  }

  test("empty edges yield empty labels") {
    import spark.implicits._
    val got = ConnectedComponents.run(spark,
      Seq.empty[(Long, Long)].toDF("src", "dst"), maxIter = 5)
    assert(got.isEmpty)
  }
}
