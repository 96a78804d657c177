package graft

import org.apache.spark.sql.DataFrame

import graft.model.GraftConfig

/** ST2 hot-band skew handling: salted repartitioning bounds pair-generation
  * work per band cell; the hard cap drops boilerplate mega-bands with an
  * honest metrics count (SURVEY.md §4.3 / build-plan item 6). The census
  * and salting are joins — the driver only ever sees the scalar counters. */
class CandidatePairsSpec extends SparkSpec {
  import spark.implicits._

  /** n docs all sharing one band key (the planted hot band), plus a few
    * cold 2-doc bands. */
  private def sigs(nHot: Int): DataFrame = {
    val hot = (0 until nHot).map(i => (i.toLong, Seq(111L)))
    val cold = Seq((10001L, Seq(7L)), (10002L, Seq(7L)), (10003L, Seq(8L)), (10004L, Seq(8L)))
    (hot ++ cold).toDF("node_id", "band_hashes")
  }

  test("hot band is salted into bounded buckets (work O(n*maxBandGroup), not O(n^2))") {
    val cfg = GraftConfig(maxBandGroup = 50)
    val c = Pipeline.candidatePairs(sigs(500), cfg)
    val n = c.pairs.count()
    val stats = c.stats()
    assert(stats.droppedBandGroups == 0)
    assert(stats.saltedBandGroups == 1 && stats.saltedMembers == 500)
    // unsalted would be C(500,2) = 124750 hot pairs; salted: ~10 buckets of
    // ~50 -> ~ 10 * C(50,2) ~= 12k. Assert an order-of-magnitude reduction.
    assert(n > 1000, s"salted hot band produced too few pairs: $n")
    assert(n < 40000, s"salting failed to bound pair blowup: $n")
    // cold bands still pair
    val p = c.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((10001L, 10002L)) && p.contains((10003L, 10004L)))
  }

  test("bucket count scales with group size") {
    val cfg = GraftConfig(maxBandGroup = 100)
    val pairs = Pipeline.candidatePairs(sigs(300), cfg).pairs
    // 3 buckets of ~100 -> about 3 * C(100,2) ~= 15k, far below C(300,2)=44850
    val hotPairs = pairs.where($"id_a" < 10000L && $"id_b" < 10000L).count()
    assert(hotPairs > 5000 && hotPairs < 30000, s"unexpected hot pair count $hotPairs")
  }

  test("groups beyond hardMaxBandGroup are dropped and counted") {
    val cfg = GraftConfig(maxBandGroup = 50, hardMaxBandGroup = 100)
    val c = Pipeline.candidatePairs(sigs(500), cfg)
    assert(c.stats().droppedBandGroups == 1)
    val hotPairs = c.pairs.where($"id_a" < 10000L).count()
    assert(hotPairs == 0, "mega-band pairs leaked past the hard cap")
    assert(c.pairs.count() == 2) // the two cold bands
  }

  test("saltHotBands=false restores pure stop-band semantics") {
    val cfg = GraftConfig(maxBandGroup = 50, saltHotBands = false)
    val c = Pipeline.candidatePairs(sigs(500), cfg)
    assert(c.stats().droppedBandGroups == 1)
    assert(c.pairs.where($"id_a" < 10000L).count() == 0)
  }

  test("salting is deterministic across partitioning") {
    val cfg = GraftConfig(maxBandGroup = 40)
    def run(parts: Int) = Pipeline.candidatePairs(sigs(200).repartition(parts), cfg)
      .pairs.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(2) == run(7))
  }

  test("simhashTier surfaces a Hamming-close pair invisible to MinHash banding") {
    val v = 0x0123456789abcdefL
    // docs 1 and 2: NO shared MinHash band key (the banding tier is blind to
    // them) but SimHash within maxHamming=3 (bits 7 and 50 flipped — chunks
    // 1 and 2 of the 4x16 split still agree); doc 3 unrelated on both tiers
    val rows = Seq(
      (1L, (0 until 32).map(i => 100L + i), v),
      (2L, (0 until 32).map(i => 200L + i), v ^ (1L << 7) ^ (1L << 50)),
      (3L, (0 until 32).map(i => 300L + i), ~v))
    val df = rows.toDF("node_id", "band_hashes", "simhash")
    assert(Pipeline.candidatePairs(df, GraftConfig()).pairs.count() == 0,
      "MinHash-only tier found a pair with zero shared band keys")
    val on = Pipeline.candidatePairs(df, GraftConfig(simhashTier = true)).pairs
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(on == Set((1L, 2L)),
      s"chunk tier must surface exactly the Hamming-close pair: $on")
    // Jaccard-only mode (maxHamming < 0) has no Hamming gate: the tier is
    // meaningless there and must stay off even when the knob is set
    assert(Pipeline.candidatePairs(df,
      GraftConfig(simhashTier = true, maxHamming = -1)).pairs.count() == 0)
  }

  test("10^4 hot bands stay distributed (no per-key driver state)") {
    // 10,000 distinct hot bands of 7 members each (> maxBandGroup = 5):
    // every one is salted via the census JOIN; the only driver-visible
    // values are the three scalar counters.
    val nBands = 10000
    val rows = for {
      b <- 0 until nBands
      m <- 0 until 7
    } yield ((b * 100 + m).toLong, Seq(1000000L + b))
    val df = rows.toDF("node_id", "band_hashes").repartition(8)
    val cfg = GraftConfig(maxBandGroup = 5)
    val c = Pipeline.candidatePairs(df, cfg)
    val nPairs = c.pairs.count()
    val stats = c.stats()
    assert(stats.droppedBandGroups == 0)
    assert(stats.saltedBandGroups == nBands.toLong)
    assert(stats.saltedMembers == nBands.toLong * 7)
    // each band of 7 in 2 salt buckets yields between C(4,2)+C(3,2)=9 and
    // C(7,2)=21 pairs depending on the split; bounded both sides
    assert(nPairs >= nBands * 6L && nPairs <= nBands * 21L, s"pair count $nPairs")
  }
}
