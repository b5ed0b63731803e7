package graft

class QueriesSpec extends SparkSpec {

  test("every registered query runs on sf0.001 and most return rows") {
    // q09 (anti join) may legitimately be small; everything else must be
    // non-empty so the oracle compare is meaningful.
    val counts = SparkEntry.registry.map { q =>
      q.name -> q.spark(spark, sf).count()
    }.toMap
    val allowedEmpty = Set("q09_anti_join")
    val empty = counts.filter { case (n, c) => c == 0 && !allowedEmpty(n) }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
