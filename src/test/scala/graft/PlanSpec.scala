package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan shape assertions — the 100 TB posture checks (SURVEY §4):
  * predicates and projections must reach the parquet scan, dimension joins
  * must broadcast, aggregations must have map-side partial phases, and the
  * native expressions must appear in the codegen'd plan. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q01 scan: filters pushed down and columns pruned") {
    val p = plan("q01_scan_filter")
    assert(p.contains("PushedFilters:") &&
      (p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate")),
      s"time predicate must reach the scan:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"),
      "unused columns must not be read")
  }

  test("q04 active keys: dimension join broadcasts, no fact-side pre-shuffle") {
    val p = plan("q04_active_keys")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q06 multi-join: small dims broadcast, partial aggregation present") {
    val p = plan("q06_regional_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.split("HashAggregate").length >= 3,
      "partial + final hash aggregation expected")
  }

  test("q10 pricing summary: whole-stage codegen with partial aggregation") {
    val df = SparkEntry.queries("q10_pricing_summary")(spark, sf)
    // AQE finalizes (and shows codegen) only once this plan itself runs.
    df.queryExecution.executedPlan.execute().count()
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages show as "*(n)" markers in the final AQE plan
    assert(p.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(p).nonEmpty,
      s"codegen expected:\n$p")
    assert(plan("q10_pricing_summary").split("HashAggregate").length >= 3)
  }

  test("q35 similarity: native dot expression in the plan, norms precomputed") {
    val p = plan("q35_cosine_neardup")
    assert(p.contains("float_vector_dot"), s"native expression expected:\n$p")
    // norms are computed in per-side projections before the join: the join
    // condition/post-filter must not contain sqrt.
    val joinSection = p.split("BroadcastNestedLoopJoin|CartesianProduct")
    assert(joinSection.length >= 2, "pair join expected")
  }

  test("q46 bucketed near-dup: hash/equi join on buckets, never nested-loop") {
    val p = plan("q46_cosine_neardup_bucketed")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"pair discovery must be an equi join on the LSH bucket:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected a hash/equi join:\n$p")
    assert(p.contains("float_vector_dot"), "native dot expression expected")
  }

  test("q31 minhash: codegen'd native shingle hashing, no UDFs anywhere") {
    val p = plan("q31_minhash_signatures")
    assert(p.contains("shingle_hashes"),
      s"one-pass native shingle expression expected in the plan:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      "hot path must stay UDF-free")
  }

  test("q03 tail read plans as top-k, not a global sort") {
    val p = plan("q03_latest_event")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$p")
  }

  test("session-stats pass: ONE exchange, shared by window and aggregation") {
    // the 112-aggregate brake-session describe must keep its single-shuffle
    // shape: the gaps-and-islands window and the per-run aggregation share
    // the trip_id partitioning (a second exchange here would double the
    // shuffled bytes of the heaviest ztbus pass at 100 TB)
    import spark.implicits._
    val df = graft.ztbus.Algorithms.brakeSessionStats(
      graft.ztbus.Fixtures.telemetry().toDF(), "status_halt_brake_is_active")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // tree nodes print as "Exchange (n)"; detail headers as "(n) Exchange"
    val exchanges = "Exchange \\(".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$p")
  }

  test("q47 array-percentile: one percentile buffer per column, not three") {
    val p = plan("q47_session_stats")
    // each of the 16 columns contributes ONE percentile(col, [0.25,0.5,0.75])
    // aggregate (deduped under the three element_at projections)
    val buffers = "percentile\\(".r.findAllIn(p).length
    assert(buffers <= 16 * 2, // formatted plans repeat aggs in partial+final
      s"expected deduped array-percentile buffers, got $buffers occurrences")
  }

  test("q76 range frame: one exchange feeding the window, nothing else") {
    val p = plan("q76_range_frame")
    // count node headers in the detail section — the tree repeats names
    assert("""\(\d+\) Exchange""".r.findAllIn(p).length == 1,
      s"exactly one shuffle (by user_id) expected:\n$p")
    assert(p.contains("Window"), s"window operator expected:\n$p")
  }

  test("q73 line dedup: drop-set applied by anti-join, self-join broadcasts") {
    val p = plan("q73_line_dedup")
    assert(p.contains("LeftAnti"), s"drop-set must be an anti-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the adjacent-doc derivation joins a broadcast side:\n$p")
  }

  test("q74 source divergence: word join is hash, the only BNLJ is the 1-row total") {
    val p = plan("q74_source_divergence")
    val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).length
    assert(bnlj <= 1, s"only the 1-row corpus-total cross join may BNLJ:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"the word-keyed join must be a hash/merge join:\n$p")
  }

  test("q79 decontaminate: bloom prune is a row-local filter, verify is a semi join") {
    val p = plan("q79_decontaminate")
    assert(p.contains("might_contain"),
      s"train shingles must be pruned against the bloom literal in a Filter:\n$p")
    assert(p.contains("LeftSemi"),
      s"false positives must die in an exact semi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the bloom is a literal, not a joined side:\n$p")
  }

  test("q72 sketch probe: pair aggregate sits directly on the broadcast join") {
    // the r8 shape: the widest stream in the plan (probe-join output) must
    // NEVER shuffle — the (doc_a, doc_b) hit-count aggregate's child chain
    // reaches the BroadcastHashJoin with no Exchange in between (doc_b ⊂
    // grouping keys is satisfied by the pinned postings partitioning). A
    // regression reintroduces a 20M-row shuffle at sf0.1 (11 s, r7).
    val p = plan("q72_containment_sketch")
    val agg = """(?s)HashAggregate \((\d+)\)\s*\n\s*\+- HashAggregate \(\d+\)\s*\n\s*\+- Project \(\d+\)\s*\n\s*\+- BroadcastHashJoin""".r
    assert(agg.findFirstIn(p).isDefined,
      s"pair aggregate must sit exchange-free on the broadcast probe join:\n$p")
  }

  test("q83 coordinated sketches: estimator is row-local after the candidate distinct") {
    val p = plan("q83_containment_coordinated")
    assert(p.contains("coordinated_sketch_stats") ||
      p.contains("CoordinatedSketchStats"),
      s"native merge-walk expression expected in the plan:\n$p")
    // candidate self-join must be a hash join on the sketch hash, never BNLJ
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in q83 plan:\n$p")
  }

  test("no query plan contains a Python/Scala UDF or collect-based step") {
    SparkEntry.registry.foreach { q =>
      val p = q.spark(spark, sf).queryExecution
        .explainString(ExplainMode.fromString("simple"))
      assert(!p.contains("ScalaUDF") && !p.toLowerCase.contains("pythonudf"),
        s"${q.name} must not use UDFs")
    }
  }
}
