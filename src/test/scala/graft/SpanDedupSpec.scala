package graft

import org.apache.spark.sql.functions._
import graft.operators.SpanDedupOps

/** Cross-document exact-substring dedup ([[SpanDedupOps]], Lee et al. ACL
  * 2022 method): hand-computed span fixtures, the canonical-copy rule,
  * shorter-than-k invisibility, full-doc removal, and structural
  * invariants on the real corpus.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "xx quick brown fox jumps yy zz qq"),
    (3L, "completely different words here entirely unique tokens"),
    (4L, "quick brown"),
    (5L, "aaa bbb ccc"),
    (6L, "aaa bbb ccc")).toDF("doc_id", "text")

  test("crossDocSpans finds the shared 4-word run in both docs") {
    val spans = SpanDedupOps.crossDocSpans(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_len"),
        r.getAs[Long]("n_grams"), r.getAs[Long]("max_df"))).toSet
    // "quick brown fox jumps" at words 2..5 of both d1 and d2 (two
    // duplicated 3-grams merged); "aaa bbb ccc" whole-doc in d5/d6.
    assert(spans === Set(
      (1L, 2L, 5L, 4L, 2L, 2L),
      (2L, 2L, 5L, 4L, 2L, 2L),
      (5L, 1L, 3L, 3L, 1L, 2L),
      (6L, 1L, 3L, 3L, 1L, 2L)))
  }

  test("crossDocDedup keeps the min-id copy and rewrites the rest") {
    val out = SpanDedupOps.crossDocDedup(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getAs[Long]("n_dropped"))).toMap
    assert(out(1L) === ("the quick brown fox jumps over the lazy dog", 0L))
    assert(out(2L) === ("xx yy zz qq", 4L))
    assert(out(3L)._2 === 0L)
    // shorter than k: invisible to the anchor even though its words
    // appear verbatim inside d1
    assert(out(4L) === ("quick brown", 0L))
    // exact duplicate pair: min-id survives, the other empties out
    assert(out(5L) === ("aaa bbb ccc", 0L))
    assert(out(6L) === ("", 3L))
  }

  test("span structure invariants hold on the real corpus") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val spans = SpanDedupOps.crossDocSpans(real, col("doc_id"), col("text"))
    val bad = spans.where(
      col("span_len") < 3 ||
        col("n_grams") =!= col("span_len") - lit(2) ||
        col("max_df") < 2).count()
    assert(bad === 0L)
    assert(spans.count() > 0L)
  }

  test("dedup rewrite conserves word counts on the real corpus") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val out = SpanDedupOps.crossDocDedup(real, col("doc_id"), col("text"))
    val keptWords = when(col("text_clean") === "", lit(0))
      .otherwise(size(split(col("text_clean"), " ")))
    assert(out.where(
      keptWords.cast("long") =!= col("n_words") - col("n_dropped")).count()
      === 0L)
  }

  test("gram identity is (hash, length): cross-length collisions cannot span") {
    // k=1 grams: 'ao' and 'మ' share polyHash 3118 at different lengths,
    // 'bP' collides at the SAME length (the documented residue)
    val docs = Seq(
      (1L, "ao x"), (2L, "ao y"),  // true duplicated gram, df=2
      (3L, "మ z"))                  // cross-length collision: df must stay 1
      .toDF("doc_id", "text")
    val spans = SpanDedupOps.crossDocSpans(
      docs, col("doc_id"), col("text"), k = 1, minDf = 2)
      .select("did").as[Long].collect().toSet
    assert(spans === Set(1L, 2L),
      "a shorter gram colliding with a duplicated hash must not be a span")
    // and the rewrite keeps doc 3 untouched (canon rule never reaches it)
    val clean = SpanDedupOps.crossDocDedup(
      docs, col("doc_id"), col("text"), k = 1, minDf = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(clean(3L) === "మ z")
    assert(clean(1L) === "ao x")     // min-id canonical holder keeps
    assert(clean(2L) === "y")        // non-canonical occurrence removed
  }
}
