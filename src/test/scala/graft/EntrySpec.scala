package graft

/** Driver-contract guards: entry() returns rows, every oracle key has a
  * query, and every query runs on the shared testdata. */
class EntrySpec extends SparkSpec {

  test("entry returns a non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      withClue(name) { assert(n >= 0) }
    }
  }
}
