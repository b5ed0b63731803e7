package graft

import org.apache.spark.sql.functions._
import graft.operators.RetrievalOps

/** Hand-computed BM25/RRF/DSIR fixtures — every expected value below is
  * derived in the test from the published formulas (Robertson-Walker BM25
  * with Lucene's non-negative idf; Cormack RRF; Xie DSIR log ratios) with
  * the library's 1e-6 HALF_UP rounding, so a drift in any constant or
  * rounding step moves a literal. */
class RetrievalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry date")).toDF("doc_id", "text")

  test("bm25TopK reproduces the hand-computed Okapi scores and order") {
    val out = RetrievalOps.bm25TopK(corpus, col("doc_id"), col("text"),
      Seq((0L, "apple cherry")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), 5)
      .orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // N=3, avgdl=3; df(apple)=1, df(cherry)=2
    def idf(df: Long): BigDecimal =
      r6(math.log(1.0 + (3 - df + 0.5) / (df + 0.5)))
    def contrib(df: Long, tf: Long, dl: Long): BigDecimal =
      r6(idf(df).toDouble * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * dl / 3.0)))
    val want = Seq(
      (1L, 1L, 1L, contrib(1, 2, 3).toDouble),  // d1: apple tf=2
      (2L, 3L, 1L, contrib(2, 3, 4).toDouble),  // d3: cherry tf=3
      (3L, 2L, 1L, contrib(2, 1, 2).toDouble))  // d2: cherry tf=1
    assert(out.length == 3)
    out.zip(want).foreach { case ((rk, doc, nt, sc), (wrk, wdoc, wnt, wsc)) =>
      assert(rk == wrk && doc == wdoc && nt == wnt,
        s"ranking drifted: ${out.toSeq}")
      assert(math.abs(sc - wsc) < 1e-9, s"score drifted: $sc vs $wsc")
    }
  }

  test("bm25TopK: distinctive vocabulary retrieves its own document first") {
    // Self-retrieval is a DISTINCTIVE-vocabulary property (high idf on the
    // query's own terms). The driver's synthetic corpus shares one
    // vocabulary across all docs — there, set-semantics BM25 correctly
    // prefers longer/higher-tf docs over the query doc itself — so the
    // sanity is pinned on a planted distinctive doc over the real corpus.
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text")
      .unionByName(Seq((99001L, "zzyx qwva plorth zzyx mrenk"))
        .toDF("doc_id", "text"))
    val out = RetrievalOps.bm25TopK(docs, col("doc_id"), col("text"),
      Seq((7L, "zzyx plorth mrenk")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), 3).orderBy("rk").collect()
    assert(out.length == 1 && out(0).getLong(2) == 99001L,
      s"only the distinctive doc shares any query term: ${out.toSeq}")
  }

  test("rrfFuse: hand-computed fusion, absent legs, tie-break") {
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L))
      .toDF("query_id", "doc_id", "rk")
    val vec = Seq((0L, 11L, 1L), (0L, 12L, 2L))
      .toDF("query_id", "neighbor_id", "rk")
    val out = RetrievalOps.rrfFuse(lex, vec, 5).orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(5)))
    val both = (r6(1.0 / 62) + r6(1.0 / 61)).toDouble
    val lexOnly = r6(1.0 / 61).toDouble
    val vecOnly = r6(1.0 / 62).toDouble
    assert(out.toSeq == Seq((1L, 11L, both), (2L, 10L, lexOnly),
      (3L, 12L, vecOnly)), s"fusion drifted: ${out.toSeq}")
    // doc present in one leg only carries a NULL rank for the other
    val row10 = RetrievalOps.rrfFuse(lex, vec, 5)
      .where(col("doc_id") === 10L).head()
    assert(!row10.isNullAt(3) && row10.isNullAt(4),
      "lex-only doc must carry NULL vec_rk")
  }

  test("dsirWeights: hand-computed log ratio; target-like docs score higher") {
    // raw corpus: two sublanguages; target speaks only one of them
    val raw = Seq(
      (1L, "tgt tgt alpha"), (2L, "tgt alpha alpha"),
      (3L, "oth oth beta"), (4L, "oth beta beta")).toDF("doc_id", "text")
    val target = Seq((9L, "tgt alpha tgt")).toDF("doc_id", "text")
    val out = RetrievalOps.dsirWeights(raw, col("doc_id"), col("text"),
      target, col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // vocab = {tgt, alpha, oth, beta} (V=4), rtot=12, ttot=3
    // lr(w) = r6(ln((tc+1)/7)) - r6(ln((rc+1)/16))
    def lr(tc: Long, rc: Long): BigDecimal =
      r6(math.log((tc + 1) / 7.0)) - r6(math.log((rc + 1) / 16.0))
    val lrTgt = lr(2, 3)
    val lrAlpha = lr(1, 3)
    val lrOth = lr(0, 3)
    val lrBeta = lr(0, 3)
    val want1 = (lrTgt * 2 + lrAlpha).toDouble
    assert(math.abs(out(1L)._2 - want1) < 1e-9,
      s"doc 1 log_weight ${out(1L)._2} != hand-computed $want1")
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(3L)._2 - (lrOth * 2 + lrBeta).toDouble) < 1e-9)
    // the selection property DSIR exists for: target-like docs outrank
    val tgtAvg = Seq(out(1L)._3, out(2L)._3).min
    val othAvg = Seq(out(3L)._3, out(4L)._3).max
    assert(tgtAvg > othAvg,
      s"target-like docs must outweigh others: $tgtAvg vs $othAvg")
  }

  test("ndcgAtK reproduces the hand-computed DCG/IDCG; unjudged scores 0") {
    val rels = Seq((0L, 10L, BigDecimal("1.000000")),
      (0L, 11L, BigDecimal("0.500000")), (0L, 12L, BigDecimal("0.200000")))
      .toDF("query_id", "doc_id", "rel")
      .select(col("query_id"), col("doc_id"),
        col("rel").cast("decimal(18,6)").as("rel"))
    // ranking: the rel-0.5 doc first, the rel-1.0 doc second, then an
    // UNJUDGED doc (contributes 0)
    val ranking = Seq((0L, 11L, 1L), (0L, 10L, 2L), (0L, 99L, 3L))
      .toDF("query_id", "doc_id", "rk")
    val out = RetrievalOps.ndcgAtK(ranking, rels, 3).head()
    def g(rel: Double, rk: Long): BigDecimal =
      r6(rel / (math.log(rk + 1.0) / math.log(2.0)))
    val dcg = (g(0.5, 1) + g(1.0, 2)).toDouble // + 0 for the unjudged
    val idcg = (g(1.0, 1) + g(0.5, 2) + g(0.2, 3)).toDouble
    assert(math.abs(out.getDouble(1) - dcg) < 1e-9, s"dcg ${out.getDouble(1)}")
    assert(math.abs(out.getDouble(2) - idcg) < 1e-9)
    assert(math.abs(out.getDouble(3) -
      r6(dcg / idcg).toDouble) < 1e-9)
  }

  test("hybrid fusion beats the lexical leg on embedding-graded relevance") {
    // the q123 gate: on both sf dirs the RRF fusion's nDCG@10 dominates
    // the lexical leg for every query — what hybrid retrieval is FOR
    // (measured stable at sf0.001 and sf0.01; this pins the property at
    // the spec's sf)
    val out = graft.SparkEntry.queries("q123_retrieval_ndcg")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4))
      .toMap
    val queries = out.keys.map(_._2).toSet
    assert(queries.nonEmpty)
    queries.foreach { q =>
      assert(out(("hybrid", q)) > out(("lexical", q)),
        s"hybrid must dominate lexical for query $q: $out")
    }
  }

  test("hardNegatives: positives excluded by cosine, BM25 order kept, " +
      "missing embedding stays negative") {
    // corpus: doc 1 is the query itself (identical vector => positive),
    // doc 2 shares vocabulary but points the other way (hard negative),
    // doc 3 shares vocabulary but has NO embedding (unverifiable =>
    // negative by convention), doc 4 shares nothing (never a candidate)
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana date"),
      (3L, "banana cherry egg"),
      (4L, "zebra yak xylo")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(-1f, 0f)),
      (4L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val out = RetrievalOps.hardNegatives(
      docs, col("doc_id"), col("text"),
      docs.where(col("doc_id") === 1), col("doc_id"), col("text"),
      emb, col("vec_id"), col("embedding"),
      k = 4, posThreshold = 0.4, nNeg = 3)
      .orderBy("neg_rk").collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(!ids.contains(1L), "the query doc (cosine 1) must be excluded")
    assert(!ids.contains(4L), "a no-shared-term doc is never a candidate")
    assert(ids.toSet == Set(2L, 3L), s"hard negatives must be 2 and 3: $ids")
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(2L).getAs[Double]("cos_sim") == -1.0,
      "opposite vector scores cosine -1")
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("cos_sim")),
      "missing embedding must survive with NULL cosine, not drop")
    // negatives keep lexical (BM25) order: neg_rk increases with bm25_rk
    val ordered = out.sortBy(_.getAs[Long]("neg_rk"))
      .map(_.getAs[Long]("bm25_rk")).toSeq
    assert(ordered == ordered.sorted, s"BM25 order must be kept: $ordered")
  }

  test("hardNegatives plan: corpus-sized sides never shuffle for the " +
      "embedding probes") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val plan = RetrievalOps.hardNegatives(docs, col("doc_id"), col("text"),
      docs.where(col("doc_id") < 3), col("doc_id"), col("text"),
      emb, col("vec_id"), col("embedding"), 10, 0.4, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian product anywhere:\n$plan")
    // the embeddings scans must join against BROADCAST candidate probes
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"both embedding fetches must be broadcast probes:\n$plan")
  }

  test("prfExpandTerms picks the hand-computed tf-idf expansion") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana date"),
      (3L, "kiwi melon lime")).toDF("doc_id", "text")
    val qterms = Seq((0L, "apple")).toDF("query_id", "word")
    val expanded = RetrievalOps.prfExpandTerms(docs, col("doc_id"),
      col("text"), qterms, kFb = 5, tExp = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // feedback docs for "apple" = {1, 2}. Weights (df over 3 docs):
    // banana 2·idf(df=2)=0.940008 < cherry/date 1·idf(df=1)=0.980829 —
    // the rare terms outrank the common one; tie → word asc.
    assert(expanded === Set((0L, "apple"), (0L, "cherry"), (0L, "date")))
  }

  test("PRF second pass surfaces docs sharing only expansion terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana date"),
      (3L, "kiwi melon lime"),
      (4L, "cherry date fig")).toDF("doc_id", "text")
    val qterms = Seq((0L, "apple")).toDF("query_id", "word")
    def hits(qt: org.apache.spark.sql.DataFrame) =
      RetrievalOps.bm25TopKTerms(docs, col("doc_id"), col("text"), qt, 10)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!hits(qterms).contains(4L))
    val expanded = RetrievalOps.prfExpandTerms(docs, col("doc_id"),
      col("text"), qterms, kFb = 5, tExp = 2)
    assert(hits(expanded).contains(4L))
  }

  test("bm25 plan: query-derived sides broadcast; corpus aggregates once") {
    val docs = Tables.documents(spark, sf)
    val plan = RetrievalOps.bm25TopK(docs, col("doc_id"), col("text"),
      docs.where(col("doc_id") < 3), col("doc_id"), col("text"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"query-term probe must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian product anywhere:\n$plan")
  }
}
