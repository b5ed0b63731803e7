package graft

import org.apache.spark.sql.functions._
import graft.operators.{PQOps, SimilarityOps}

/** Product quantization: encode/search contract and the recall floors the
  * q94/q96 row-hashes can't express. Truth is exact squared L2, computed
  * through the SAME ADC expression over an identity index (recon = the
  * float vector widened), so truth and approximation share arithmetic and
  * only the quantization differs. */
class PQSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8; private val SUB = 8
  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private lazy val queries = emb.where(col("vec_id") < 50)

  /** Exact-L2 top-k via the identity index. */
  private def exactTopK(k: Int) = PQOps.pqTopK(
    emb.select(col("vec_id"),
      array((1 to 64).map(i =>
        element_at(col("embedding"), i).cast("double")): _*).as("recon")),
    queries, col("vec_id"), col("embedding"), k, SUB)

  test("pq index: m codes per vector, every code a codebook entry id") {
    val idx = PQOps.pqIndex(emb, emb.where(col("vec_id") < 8),
      col("vec_id"), col("embedding"), M, SUB)
    val rows = idx.select(col("vec_id"), col("codes"), col("recon")).collect()
    assert(rows.length == emb.count())
    assert(rows.forall(_.getSeq[Int](1).length == M))
    assert(rows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 8)))
    assert(rows.forall(_.getSeq[Double](2).length == 64))
  }

  test("row-local pqIndex equals the relational window-argmin form exactly") {
    // the default encode path is row-local (zero shuffle); the q94-q99
    // oracles replay the relational form in SQL — this equality is what
    // keeps them valid against the default path, doubles included
    val cb = emb.where(col("vec_id") < 8)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getSeq[Double](2))))
      .toMap
    val rowLocal = asMap(PQOps.pqIndex(emb, cb,
      col("vec_id"), col("embedding"), M, SUB))
    val relational = asMap(PQOps.pqIndexRelational(emb, cb,
      col("vec_id"), col("embedding"), M, SUB))
    assert(rowLocal == relational)
  }

  test("pqTopKLut rejects a codebook whose ids are not exactly 0..k-1") {
    val cb = emb.where(col("vec_id") < 8)
    val idx = PQOps.pqIndex(emb, cb, col("vec_id"), col("embedding"), M, SUB)
    val shifted = cb.withColumn("vec_id", col("vec_id") + 1)
    val e = intercept[IllegalArgumentException] {
      PQOps.pqTopKLut(idx, queries, shifted,
        col("vec_id"), col("embedding"), 5, M, SUB)
    }
    assert(e.getMessage.contains("0..k-1"))
  }

  test("pq encode is idempotent on codebook entries (distance-0 self-assignment)") {
    // a vector that IS codebook entry j must encode every subspace to a
    // zero-distance entry and reconstruct itself exactly
    val cb = emb.where(col("vec_id") < 8)
    val idx = PQOps.pqIndex(cb, cb, col("vec_id"), col("embedding"), M, SUB)
    val recon = idx.select(col("vec_id"), col("recon")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val floats = cb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    floats.foreach { case (id, e) =>
      assert(recon(id) == e, s"codebook row $id did not reconstruct itself")
    }
  }

  test("learned codebook beats the fixed sample at equal size (q95 contract)") {
    val k = 3
    val truth = exactTopK(k)
    def recallOf(codebook: org.apache.spark.sql.DataFrame): Double =
      SimilarityOps.annRecall(truth,
        PQOps.pqTopK(PQOps.pqIndex(emb, codebook,
          col("vec_id"), col("embedding"), M, SUB),
          queries, col("vec_id"), col("embedding"), k, SUB), "m")
        .select(col("recall")).as[Double].head()
    val fixed = recallOf(emb.where(col("vec_id") < 8))
    val learned = recallOf(PQOps.pqLearnCodebook(
      emb, col("embedding"), M, SUB, 8, "vec_id", "embedding"))
    assert(learned > fixed,
      s"learned codebook recall $learned should beat fixed $fixed")
  }

  test("pq shortlist recall floor: K=64 learned, top-20 shortlist (q96 shape)") {
    val idx = PQOps.pqIndex(emb,
      PQOps.pqLearnCodebook(emb, col("embedding"), M, SUB, 64,
        "vec_id", "embedding"),
      col("vec_id"), col("embedding"), M, SUB)
    val shortlist = PQOps.pqTopK(idx, queries,
      col("vec_id"), col("embedding"), 20, SUB)
    val r = SimilarityOps.annRecall(exactTopK(3), shortlist, "pq_short")
      .select(col("recall")).as[Double].head()
    // measured 0.767 on this corpus/seed; a codebook, encode, or ADC
    // regression craters it
    assert(r >= 0.7, s"shortlist recall $r below pinned floor 0.7")
  }

  test("LUT fast path returns bit-identical distances to the ADC expression") {
    val cb = emb.where(col("vec_id") < 8)
    val idx = PQOps.pqIndex(emb, cb, col("vec_id"), col("embedding"), M, SUB)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val adc = asSet(PQOps.pqTopK(idx, queries,
      col("vec_id"), col("embedding"), 5, SUB))
    val lut = asSet(PQOps.pqTopKLut(idx, queries, cb,
      col("vec_id"), col("embedding"), 5, M, SUB))
    // not approximately — EXACTLY, doubles included: the per-subspace
    // accumulation grouping was chosen to make this swap safe
    assert(adc == lut, s"LUT path diverged: ${(adc diff lut).take(3)}")
  }

  test("pqTopKAuto dim-gates the scorer: ADC at dim=64, LUT at dim>=512, same rows") {
    def scorerOf(df: org.apache.spark.sql.DataFrame) = {
      val plan = df.queryExecution.analyzed.toString
      (plan.contains("pqadcdist") || plan.contains("pq_adc_dist"),
        plan.contains("pqlutdist") || plan.contains("pq_lut_dist"))
    }
    // dim = 64: the measured ADC-wins regime — auto must pick direct ADC
    val cb = emb.where(col("vec_id") < 8)
    val idx = PQOps.pqIndex(emb, cb, col("vec_id"), col("embedding"), M, SUB)
    val auto64 = PQOps.pqTopKAuto(idx, queries, cb,
      col("vec_id"), col("embedding"), 5, M, SUB)
    assert(scorerOf(auto64) == ((true, false)),
      "dim=64 must score through the direct ADC expression")
    assert(auto64.collect().toSet == PQOps.pqTopK(idx, queries,
      col("vec_id"), col("embedding"), 5, SUB).collect().toSet)
    // dim = 512 (m=8, sub=64): the LUT regime — and because the two
    // scorers are bit-identical, the rows still match the ADC path
    val wide = emb.where(col("vec_id") < 40).select(col("vec_id"),
      flatten(array_repeat(col("embedding"), 8)).as("embedding"))
    val wcb = wide.where(col("vec_id") < 8)
    val widx = PQOps.pqIndex(wide, wcb, col("vec_id"), col("embedding"), 8, 64)
    val auto512 = PQOps.pqTopKAuto(widx, wide.where(col("vec_id") < 12), wcb,
      col("vec_id"), col("embedding"), 5, 8, 64)
    assert(scorerOf(auto512) == ((false, true)),
      "dim=512 must score through the LUT gather expression")
    assert(auto512.collect().toSet == PQOps.pqTopK(widx,
      wide.where(col("vec_id") < 12),
      col("vec_id"), col("embedding"), 5, 64).collect().toSet)
  }

  test("balancedPermutation deals variance ranks round-robin across subspaces") {
    // dims 1..16 with strictly descending variance: rank i-1 = dim i,
    // so subspace s gets source dims {s+1, s+5, s+9, s+13} (0-based src)
    val vars = (1 to 16).map(d => (d, 100.0 - d))
    val perm = PQOps.balancedPermutation(vars, 4, 4)
    assert(perm == Seq(
      0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11, 15),
      s"dealing drifted: $perm")
    // a permutation: every source dim appears exactly once
    assert(perm.sorted == (0 until 16))
  }

  test("variance balancing cuts learned-codebook distortion on a skewed corpus") {
    // all the variance lives in dims 1..8 — exactly one contiguous
    // subspace. The balanced deal spreads them one per subspace, so each
    // k=8 codebook quantizes one hard dim instead of one codebook
    // carrying all eight.
    val skew = emb.select(col("vec_id"),
      array((1 to 64).map(i => element_at(col("embedding"), i) *
        lit(if (i <= 8) 4.0f else 0.25f)): _*).as("embedding"))
    def meanErr(corpus: org.apache.spark.sql.DataFrame) = {
      val cb = PQOps.pqLearnCodebook(corpus, col("embedding"), M, SUB, 8,
        "vec_id", "embedding")
      PQOps.quantizationDrift(corpus, corpus, cb,
        col("vec_id"), col("embedding"), M, SUB)
        .where(col("side") === "baseline").select("mean_err")
        .head.getDouble(0)
    }
    val contiguous = meanErr(skew)
    val vars = PQOps.dimVariances(skew, col("embedding"), 64)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val perm = PQOps.balancedPermutation(vars, M, SUB)
    // sanity: the permutation actually separates the hot dims — no
    // subspace holds two of dims 0..7
    (0 until M).foreach { s =>
      val hot = perm.slice(s * SUB, (s + 1) * SUB).count(_ < 8)
      assert(hot == 1, s"subspace $s holds $hot hot dims: $perm") }
    val permuted = meanErr(skew.select(col("vec_id"),
      PQOps.permuteExpr(col("embedding"), perm).as("embedding")))
    assert(permuted < contiguous * 0.9,
      s"balanced allocation must cut distortion: $permuted vs $contiguous")
  }

  test("binary sign screen: top-50 hamming shortlist recall floor (q98 tier)") {
    val short50 = SimilarityOps.binarySignTopK(emb, queries,
      col("vec_id"), col("embedding"), 64, 50)
    val r = SimilarityOps.annRecall(exactTopK(3), short50, "bin")
      .select(col("recall")).as[Double].head()
    // measured 0.707 on this corpus — one bit per dimension holds 70% of
    // the exact top-3 in a 10%-of-corpus shortlist; a packing or distance
    // regression craters it
    assert(r >= 0.65, s"binary shortlist recall $r below pinned floor")
  }

  test("ivf-pq: probed search is the cell-restricted subset of full PQ search") {
    val cb = emb.where(col("vec_id") < 8)
    val full = PQOps.pqTopK(
      PQOps.pqIndex(emb, cb, col("vec_id"), col("embedding"), M, SUB),
      queries, col("vec_id"), col("embedding"), 200, SUB)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val probed = PQOps.ivfPqTopK(emb, queries, cb, cb,
      col("vec_id"), col("embedding"), 3, 2, M, SUB).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(4))
    assert(probed.nonEmpty)
    // every probed hit carries the same ADC distance the full scan gives
    // it — probing prunes candidates, never changes scores
    probed.foreach { case (k, d) =>
      assert(full.get(k).forall(_ == d), s"probed score diverged for $k")
    }
    // more probes can only improve: nProbe=8 (all cells) equals full PQ
    // top-3 exactly
    val all8 = PQOps.ivfPqTopK(emb, queries, cb, cb,
      col("vec_id"), col("embedding"), 3, 8, M, SUB).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fullTop3 = PQOps.pqTopK(
      PQOps.pqIndex(emb, cb, col("vec_id"), col("embedding"), M, SUB),
      queries, col("vec_id"), col("embedding"), 3, SUB).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all8 == fullTop3,
      "probing every cell must recover the unpartitioned PQ ranking")
  }

  test("ivfadc: probing prunes candidates without changing residual scores") {
    val cells = emb.where(col("vec_id") < 8)
    val rcb = PQOps.cellResiduals(
        emb.where(col("vec_id") >= 8 && col("vec_id") < 16),
        cells, col("vec_id"), col("embedding"))
      .select((col("vec_id") - 8).as("vec_id"), col("res").as("embedding"))
    def run(k: Int, nProbe: Int) = PQOps.ivfPqResidualTopK(emb,
        emb.where(col("vec_id") < 10), cells, rcb,
        col("vec_id"), col("embedding"), k, nProbe, M, SUB)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(4))
    val all8 = run(200, 8).toMap
    val probed = run(3, 2)
    assert(probed.nonEmpty)
    probed.foreach { case (k, d) =>
      assert(all8.get(k._1 -> k._2).contains(d),
        s"probed residual score diverged for $k")
    }
  }

  test("ivfadc with a perfect residual codebook recovers exact L2 (the raw coding cannot)") {
    // the property residual coding exists for: the cell carries the
    // centroid offset EXACTLY, so when the codebook holds every corpus
    // residual (zero quantization error) the ADC estimate collapses to
    // ||(q-c) - (n-c)||^2 = ||q-n||^2 — exact squared L2, up to the one
    // float rounding in each residual subtraction
    val corpus = emb.where(col("vec_id") < 24).cache()
    val cells = corpus.where(col("vec_id") < 8)
    val rcb = PQOps.cellResiduals(corpus, cells,
      col("vec_id"), col("embedding"))
      .select(col("vec_id"), col("res").as("embedding"))
    val got = PQOps.ivfPqResidualTopK(corpus, corpus.where(col("vec_id") < 10),
      cells, rcb, col("vec_id"), col("embedding"), 23, 8, M, SUB).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(4))
    val exact = PQOps.pqTopK(
      corpus.select(col("vec_id"),
        array((1 to 64).map(i =>
          element_at(col("embedding"), i).cast("double")): _*).as("recon")),
      corpus.where(col("vec_id") < 10),
      col("vec_id"), col("embedding"), 23, SUB).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got.nonEmpty)
    got.foreach { case (k, d) =>
      val e = exact(k._1 -> k._2)
      assert(math.abs(d - e) <= 1e-3,
        s"pair $k: ivfadc $d vs exact $e — residual chain broke the offset")
    }
  }

  test("pqCodeDot equals the dot of materialized reconstructions, doubles included") {
    import graft.functions.VectorExpressions
    val cb = emb.where(col("vec_id") < 8)
    val cents = cb.select(col("vec_id").cast("int"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val table = PQOps.pqCodeDotTable(cents, M, SUB)
    val idx = PQOps.pqIndex(emb.where(col("vec_id") < 60), cb,
      col("vec_id"), col("embedding"), M, SUB)
      .select(col("vec_id"), col("codes"), col("recon")).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Double](2)))
    def reconDot(a: Seq[Double], b: Seq[Double]): Double =
      // the subspace-grouped order PQAdcDist/PQCodeDot both use
      (0 until M).map { s =>
        (0 until SUB).map(c => a(s * SUB + c) * b(s * SUB + c)).sum
      }.sum
    def codeDot(a: Seq[Int], b: Seq[Int]): Double =
      (0 until M).map(s => table((a(s) * cents.size + b(s)) * M + s)).sum
    for ((_, ca, ra) <- idx.take(10); (_, cb2, rb) <- idx.take(10)) {
      assert(codeDot(ca, cb2) == reconDot(ra, rb),
        "table gather must be bit-identical to the reconstructed dot")
    }
    // and through the EXPRESSION (codegen path), not just the Scala model
    val two = emb.where(col("vec_id") < 2)
    val got = PQOps.pqCellIndex(two, cb, cb,
      col("vec_id"), col("embedding"), M, SUB)
      .select(col("vec_id"), col("nrm")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byId = idx.map(t => t._1 -> t._3).toMap
    got.foreach { case (id, nrm) =>
      assert(nrm == math.sqrt(reconDot(byId(id), byId(id))),
        s"vec $id index norm must equal the reconstructed self-dot norm")
    }
  }

  test("pqCodeDotTable rejects non-contiguous codebook ids") {
    val cents = Seq(1 -> Array.fill(64)(0.5f), 2 -> Array.fill(64)(0.25f))
    val e = intercept[IllegalArgumentException] {
      PQOps.pqCodeDotTable(cents, M, SUB)
    }
    assert(e.getMessage.contains("0..1"))
  }

  test("pq semantic screen: code-space keep-set equals the oracle shape on q84's split") {
    // batch face sanity at spec scale: dropped vectors are exactly those
    // with a same-cell corpus code-vector at reconstructed cosine >= T
    val cents = emb.where(col("vec_id") < 8)
    val corpus = emb.where(pmod(col("vec_id"), lit(5)) =!= 0)
    val delta = emb.where(pmod(col("vec_id"), lit(5)) === 0)
    val idx = PQOps.pqCellIndex(corpus, cents, cents,
      col("vec_id"), col("embedding"), M, SUB)
    val out = PQOps.pqSemanticScreen(delta, idx, cents, cents,
      col("vec_id"), col("embedding"), 0.4, M, SUB).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.nonEmpty && out.keySet.forall(_ % 5 == 0))
    assert(out.values.exists(identity) && out.values.exists(!_),
      s"threshold 0.4 must split the delta: $out")
  }

  test("exact re-rank of the shortlist recovers exact order on recovered pairs") {
    val idx = PQOps.pqIndex(emb, emb.where(col("vec_id") < 8),
      col("vec_id"), col("embedding"), M, SUB)
    val shortlist = PQOps.pqTopK(idx, queries,
      col("vec_id"), col("embedding"), 20, SUB)
    val reranked = PQOps.pqRerankTopK(shortlist, emb, queries,
      col("vec_id"), col("embedding"), 3)
    val exact = exactTopK(3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rr = reranked.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // wherever the true neighbor made the shortlist, the re-rank must
    // place it at the true rank: re-ranked ∩ true-neighbor rows ⊆ exact
    val shortSet = shortlist.select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recoverable = exact.filter { case (q, _, n) => shortSet((q, n)) }
    // every recoverable (query, rank, neighbor) appears identically when
    // ALL of that query's true top-3 made the shortlist
    val fullQueries = exact.groupBy(_._1).collect {
      case (q, rows) if rows.forall(t => shortSet((t._1, t._3))) => q
    }.toSet
    assert(fullQueries.nonEmpty)
    fullQueries.foreach { q =>
      assert(exact.filter(_._1 == q) == rr.filter(_._1 == q),
        s"re-rank of a fully-recovered shortlist diverged for query $q")
    }
    assert(recoverable.nonEmpty)
  }
}
