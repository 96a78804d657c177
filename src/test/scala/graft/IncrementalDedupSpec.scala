package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

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
