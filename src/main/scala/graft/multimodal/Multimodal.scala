package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._


/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` payloads with typed metadata, processed by typed
  * `mapPartitions` stages (the Scala analog of `mapInPandas` batch UDFs —
  * one partition = one batch, schema declared by the case-class encoder).
  *
  * The actual media codecs are NOT in this environment, so the byte-level
  * decode is a STUB behind `FakeCodec`: a deterministic container format
  * (magic + typed header + body) standing in for JPEG/WAV/MP4. Everything
  * Spark-side — schema, encoders, partitioning, batch shape, metadata
  * round-trip — is real and tested; swapping `FakeCodec` for a real codec
  * changes no plumbing.
  */
object Multimodal {

  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte])

  final case class AssetMeta(
      asset_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, sample_rate: Int)

  final case class AssetFeatures(
      asset_id: Long, kind: String,
      histogram: Array[Long], // 16-bin body-byte histogram
      mean_byte_e3: Long // mean body byte value x1000 (integer)
  )

  /** Deterministic fake media container: 24-byte header
    * [magic:4][kind:1][width:4][height:4][n_frames:4][sample_rate:4][pad:3]
    * + body bytes. Stands in for real image/audio/video encodings. */
  object FakeCodec {
    final val Magic = 0x47465401 // "GFT" + version 1
    final val HeaderLen = 24
    final val Kinds = Array("image", "audio", "video")

    def kindCode(kind: String): Byte = Kinds.indexOf(kind) match {
      case -1 => 0xff.toByte
      case i  => i.toByte
    }

    def encode(kind: String, width: Int, height: Int, nFrames: Int,
        sampleRate: Int, body: Array[Byte]): Array[Byte] = {
      val buf = ByteBuffer.allocate(HeaderLen + body.length).order(ByteOrder.BIG_ENDIAN)
      buf.putInt(Magic).put(kindCode(kind))
        .putInt(width).putInt(height).putInt(nFrames).putInt(sampleRate)
        .put(new Array[Byte](3))
      buf.put(body)
      buf.array()
    }

    /** STUB decode: parses the fake header. A real implementation would
      * dispatch to an image/audio/video library here; payloads that do not
      * carry the magic decode to an all-zero meta (never throws). */
    def decodeMeta(assetId: Long, payload: Array[Byte]): AssetMeta = {
      if (payload == null || payload.length < HeaderLen)
        return AssetMeta(assetId, "unknown", if (payload == null) 0 else payload.length, 0, 0, 0, 0)
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      if (buf.getInt() != Magic)
        return AssetMeta(assetId, "unknown", payload.length, 0, 0, 0, 0)
      val kind = buf.get() match {
        case b if b >= 0 && b < Kinds.length => Kinds(b)
        case _                               => "unknown"
      }
      AssetMeta(assetId, kind, payload.length, buf.getInt(), buf.getInt(), buf.getInt(), buf.getInt())
    }

    def body(payload: Array[Byte]): Array[Byte] =
      if (payload == null || payload.length <= HeaderLen) Array.empty
      else java.util.Arrays.copyOfRange(payload, HeaderLen, payload.length)
  }

  // ------------------------------------------------------------- stages

  /** Decode stage: Dataset[Asset] -> Dataset[AssetMeta], one batch per
    * partition (narrow; no shuffle — verified by plan in tests). */
  def decodeMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a => FakeCodec.decodeMeta(a.asset_id, a.payload)))
  }

  /** Feature-extract stage: 16-bin byte histogram + integer mean over the
    * body. Deterministic stand-in for pixel/sample statistics. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val kind = FakeCodec.decodeMeta(a.asset_id, a.payload).kind // decoded ONCE
      val body = FakeCodec.body(a.payload)
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < body.length) {
        val b = body(i) & 0xff
        hist(b >>> 4) += 1
        sum += b
        i += 1
      }
      val mean = if (body.length == 0) 0L else sum * 1000L / body.length
      AssetFeatures(a.asset_id, kind, hist, mean)
    })
  }

  /** Resize stage (image STUB): keeps every (sx, sy)-th "pixel" of the body
    * interpreted as a width x height byte raster; rewrites the header with
    * the new dims. Real resize = same plumbing + a codec call. */
  def resize(assets: Dataset[Asset], newWidth: Int, newHeight: Int): Dataset[Asset] = {
    // Driver-side precondition, not an executor task failure: dims must be
    // positive and the raster must fit an Int (65536x65536 wraps the Int
    // product to 0 — a silently corrupt empty body under a lying header).
    require(newWidth > 0 && newHeight > 0 &&
      newWidth.toLong * newHeight <= Int.MaxValue,
      s"invalid resize dims ${newWidth}x$newHeight (must be positive, product <= Int.MaxValue)")
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val m = FakeCodec.decodeMeta(a.asset_id, a.payload)
      if (m.kind != "image" || m.width <= 0 || m.height <= 0) a
      else {
        val body = FakeCodec.body(a.payload)
        val out = new Array[Byte](newWidth * newHeight)
        var y = 0
        while (y < newHeight) {
          var x = 0
          while (x < newWidth) {
            val srcX = x.toLong * m.width / newWidth
            val srcY = y.toLong * m.height / newHeight
            // Long index: header dims are UNTRUSTED (any positive Int
            // parses), and srcY * width overflows Int for a crafted
            // width ~ 2^30 — a negative idx would pass `< body.length`
            // and throw AIOOBE, breaking the never-throws decode design.
            val idx = srcY * m.width + srcX
            out(y * newWidth + x) = if (idx < body.length) body(idx.toInt) else 0
            x += 1
          }
          y += 1
        }
        a.copy(payload = FakeCodec.encode("image", newWidth, newHeight, m.n_frames, m.sample_rate, out))
      }
    })
  }

  /** Frame-sample stage (video STUB): keeps every `every`-th frame block of
    * the body (frame size = width*height bytes), updating n_frames. */
  def sampleFrames(assets: Dataset[Asset], every: Int): Dataset[Asset] = {
    // every = 0 would throw 'step cannot be 0' inside executor tasks;
    // every < 0 would silently rewrite valid videos to 0 frames.
    require(every > 0, s"sampleFrames step must be positive, got $every")
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val m = FakeCodec.decodeMeta(a.asset_id, a.payload)
      // Long geometry throughout: header dims are UNTRUSTED, and a crafted
      // width x height (or n_frames) whose Int product wraps would either
      // throw (negative array size / negative arraycopy offset) or silently
      // mis-slice frames. A header whose kept-frames raster cannot exist as
      // a JVM array is corrupt by construction -> pass through unchanged,
      // same as every other undecodable payload (never-throws design).
      val frameLen = m.width.toLong * m.height
      if (m.kind != "video" || frameLen <= 0 || m.n_frames <= 0) a
      else {
        val body = FakeCodec.body(a.payload)
        val kept = (0 until m.n_frames by every).toArray
        if (kept.length * frameLen > Int.MaxValue - 16) a
        else {
          val fl = frameLen.toInt
          val out = new Array[Byte](kept.length * fl)
          var j = 0
          while (j < kept.length) {
            val src = kept(j).toLong * fl
            val n = math.max(0L, math.min(fl.toLong, body.length - src)).toInt
            if (n > 0) System.arraycopy(body, src.toInt, out, j * fl, n)
            j += 1
          }
          a.copy(payload = FakeCodec.encode("video", m.width, m.height, kept.length, m.sample_rate, out))
        }
      }
    })
  }

  // ----------------------------------------------------------- fixtures

  /** Deterministic assets derived from a documents table: kind, dims and
    * body are pure functions of doc_id/text, so an ANSI-SQL oracle can
    * recompute every metadata field without touching the payload. */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = FakeCodec.Kinds((id % 3).toInt)
        val width = 16 + (id % 7).toInt * 8
        val height = 16 + (id % 5).toInt * 8
        val nFrames = 1 + (id % 4).toInt
        val sampleRate = if (kind == "audio") 16000 else 0
        val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        Asset(id, kind, FakeCodec.encode(kind, width, height, nFrames, sampleRate, body))
      }
  }
}
