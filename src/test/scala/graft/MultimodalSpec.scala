package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Asset, FakeCodec}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("fake codec round-trips metadata") {
    val body = Array.tabulate(100)(_.toByte)
    val p = FakeCodec.encode("image", 32, 24, 1, 0, body)
    val m = FakeCodec.decodeMeta(7L, p)
    assert(m == Multimodal.AssetMeta(7L, "image", FakeCodec.HeaderLen + 100, 32, 24, 1, 0))
    assert(FakeCodec.body(p).sameElements(body))
  }

  test("decode never throws on garbage payloads (total stub)") {
    assert(FakeCodec.decodeMeta(1L, null).kind == "unknown")
    assert(FakeCodec.decodeMeta(2L, Array[Byte](1, 2, 3)).kind == "unknown")
    assert(FakeCodec.decodeMeta(3L, new Array[Byte](64)).kind == "unknown")
  }

  test("decodeMeta stage is narrow (no shuffle in the plan)") {
    val assets = Multimodal.assetsFromDocuments(spark, sfDir)
    val meta = Multimodal.decodeMeta(assets)
    val plan = meta.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val rows = meta.collect()
    assert(rows.length == 500)
    assert(rows.forall(m => Set("image", "audio", "video")(m.kind)))
    // dims are the documented pure function of doc_id
    rows.foreach { m =>
      assert(m.width == 16 + (m.asset_id % 7).toInt * 8)
      assert(m.height == 16 + (m.asset_id % 5).toInt * 8)
      assert(m.sample_rate == (if (m.kind == "audio") 16000 else 0))
    }
  }

  test("feature extraction: histogram mass equals body length") {
    val assets = Multimodal.assetsFromDocuments(spark, sfDir)
    val feats = Multimodal.extractFeatures(assets).collect()
    val bodies = assets.collect().map(a => a.asset_id -> FakeCodec.body(a.payload).length).toMap
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.histogram.length == 16)
      assert(f.histogram.sum == bodies(f.asset_id))
    }
  }

  test("resize rewrites image dims and payload deterministically") {
    val img = Asset(1L, "image",
      FakeCodec.encode("image", 8, 8, 1, 0, Array.tabulate(64)(i => (i * 3).toByte)))
    val aud = Asset(2L, "audio", FakeCodec.encode("audio", 0, 0, 0, 16000, Array[Byte](1, 2, 3)))
    val out = Multimodal.resize(Seq(img, aud).toDS(), 4, 4).collect().sortBy(_.asset_id)
    val m = FakeCodec.decodeMeta(1L, out(0).payload)
    assert((m.width, m.height) == (4, 4))
    assert(FakeCodec.body(out(0).payload).length == 16)
    // nearest-neighbour sampling: pixel (x,y) <- src (2x, 2y)
    val body = FakeCodec.body(out(0).payload)
    assert(body(0) == (0 * 3).toByte && body(1) == (2 * 3).toByte && body(4) == (16 * 3).toByte)
    // non-images pass through untouched
    assert(out(1).payload.sameElements(aud.payload))
  }

  test("frame sampling keeps every n-th frame") {
    val frames = Array.tabulate(6 * 4)(i => (i / 4 + 1).toByte) // 6 frames of 2x2
    val vid = Asset(3L, "video", FakeCodec.encode("video", 2, 2, 6, 0, frames))
    val out = Multimodal.sampleFrames(Seq(vid).toDS(), every = 2).collect().head
    val m = FakeCodec.decodeMeta(3L, out.payload)
    assert(m.n_frames == 3)
    val body = FakeCodec.body(out.payload)
    assert(body.length == 3 * 4)
    assert(body.grouped(4).map(_.head).toSeq == Seq(1.toByte, 3.toByte, 5.toByte))
  }

  test("crafted oversized header dims cannot crash resize or sampleFrames") {
    import spark.implicits._
    // Header dims are UNTRUSTED: width ~ 2^30 made srcY * width overflow
    // Int to a negative index (AIOOBE) before the Long-index fix; a
    // width x height whose Int product wraps mis-sized frame slices.
    val hugeImg = Multimodal.Asset(1L, "image",
      FakeCodec.encode("image", 1 << 30, 8, 1, 0, Array.fill[Byte](64)(7)))
    val out = Multimodal.resize(Seq(hugeImg).toDS(), 16, 16).collect()(0)
    val m = FakeCodec.decodeMeta(1L, out.payload)
    assert(m.width == 16 && m.height == 16) // resized, zero-filled beyond body
    // video whose kept-frames raster cannot exist as a JVM array: pass
    // through unchanged (corrupt-by-construction header), never throw
    val hugeVid = Multimodal.Asset(2L, "video",
      FakeCodec.encode("video", 1 << 16, 1 << 16, 4, 0, Array.fill[Byte](64)(7)))
    val out2 = Multimodal.sampleFrames(Seq(hugeVid).toDS(), 2).collect()(0)
    assert(out2.payload.sameElements(hugeVid.payload))
  }

  test("stages are invariant under partitioning") {
    val assets = Multimodal.assetsFromDocuments(spark, sfDir)
    def run(parts: Int) =
      Multimodal.extractFeatures(assets.repartition(parts))
        .collect().map(f => (f.asset_id, f.mean_byte_e3, f.histogram.toSeq)).sortBy(_._1).toSeq
    assert(run(2) == run(9))
  }
}
