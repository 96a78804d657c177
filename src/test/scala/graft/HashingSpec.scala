package graft

import org.apache.spark.sql.functions._

import graft.util.Hashing

/** Cross-checks graft's hashing against Spark's builtin xxhash64 so that
  * driver-side kernels (generator, verification) and Catalyst columns agree
  * bit-for-bit. */
class HashingSpec extends SparkSpec {

  test("hashString matches builtin xxhash64 for strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val samples = Seq("", "a", "hello world", "日本語テキスト", "x" * 1000, "héllo\n\tmix") ++
      (1 to 50).map(_ => rnd.alphanumeric.take(rnd.nextInt(64)).mkString)
    val fromSpark = samples.distinct.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h")).collect()
    fromSpark.foreach { r =>
      assert(Hashing.hashString(r.getString(0)) == r.getLong(1), s"mismatch for '${r.getString(0)}'")
    }
  }

  test("splitMix64 is deterministic and well-spread") {
    val xs = (1L to 1000L).map(Hashing.splitMix64)
    assert(xs.distinct.size == 1000)
    assert(xs == (1L to 1000L).map(Hashing.splitMix64))
  }

  test("md5Utf8 matches builtin md5") {
    import spark.implicits._
    val s = "some text for md5"
    val sparkHex = Seq(s).toDF("s").select(md5(col("s"))).head().getString(0)
    assert(Hashing.hex(Hashing.md5Utf8(s)) == sparkHex)
  }
}
