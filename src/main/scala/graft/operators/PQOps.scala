package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Product quantization (PQ) for embedding similarity search — the deep
  * compression path beyond SQ8: the vector is split into `m` subspaces of
  * `sub` components, each subspace is assigned the id of its nearest
  * codebook entry (squared L2), and the whole vector becomes `m` small
  * codes (64 floats → 8 bytes at m=8). Search runs ASYMMETRICALLY: the
  * float query is compared against the corpus's reconstructed codewords
  * ([[graft.functions.PQAdcDist]]), so corpus floats are never needed
  * after the one-time encode — the property that lets a 100 TB embedding
  * corpus live as a 3 TB index. (Public method: Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", IEEE TPAMI 2011.)
  *
  * The codebook is `k` full-dimension rows `(cid, ce)` — subspace `s` of
  * entry `j` is `ce[s·sub+1 .. (s+1)·sub]`. Two sources, one machinery
  * (the q43/q48 precedent): a FIXED deterministic sample
  * (oracle-expressible, q94) or per-subspace k-means glued into full
  * vectors ([[pqLearnCodebook]], q95 — learned codebooks track the data,
  * spec-pinned recall).
  *
  * Scale shape: encode is row-local against the collected k-row
  * codebook — O(corpus), zero shuffle, no row expansion; the index
  * `(vec_id, codes, recon)` is the only thing search touches, and the
  * query side is broadcast. Distances
  * are computed by a codegen'd native expression with per-subspace
  * accumulation, chosen so the LUT fast path (precompute m·k subspace
  * partials per query, gather O(m) per candidate) is bit-identical —
  * swapping it in at cluster scale cannot move a ranking.
  */
object PQOps {

  /** PQ-encode every vector and materialize its reconstruction: output
    * `(vec_id, codes: array<int>, recon: array<double>)` — the search
    * index. The DEFAULT batch path is ROW-LOCAL: the codebook is `k`
    * small rows by contract, so it is collected once at plan-build time
    * and the whole encode becomes one stateless expression tree
    * ([[pqEncodeExprs]], the same expressions the streaming face runs)
    * mapped over the corpus — O(corpus) work, ZERO shuffle, no row
    * expansion. The relational window-argmin form this replaced survives
    * as [[pqIndexRelational]] (the oracle-expressible shape); PQSpec
    * pins EXACT output equality of the two, so the q94-q99 oracles that
    * replay the relational form in SQL stay valid against this path. */
  def pqIndex(emb: DataFrame, codebook: DataFrame, id: Column, vec: Column,
      m: Int, sub: Int): DataFrame = {
    require(m > 0 && sub > 0, s"need positive m/sub, got $m/$sub")
    val rows = codebook.select(id.cast("int").as("cid"), vec.as("ce"))
      .collect()
    require(rows.nonEmpty, "codebook must be non-empty")
    val cents = rows.map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    cents.foreach { case (cid, ce) =>
      require(ce.length >= m * sub,
        s"codebook entry $cid has ${ce.length} components, need ${m * sub}") }
    val (codes, recon) = pqEncodeExprs(vec, cents, m, sub)
    // The per-vector encode tree (m×k argmin + reconstruction) and the
    // downstream ADC scoring it feeds run in the scan's own stage; a
    // tiny single-split corpus file pins all of it to one task. Spread
    // first (no-op at scale — Fanout contract).
    Fanout.spread(emb).select(id.as("vec_id"), codes.as("codes"), recon.as("recon"))
  }

  /** The relational form of [[pqIndex]] — one broadcast cross join
    * against the `k`-row codebook scores every (vector, entry, subspace)
    * in fixed-order double arithmetic (bit-reproducible, so the
    * assignment needs no rounding before the argmin compare), one window
    * picks each subspace's winner (tie → smallest entry id), and one
    * aggregation assembles codes and the glued reconstruction in
    * subspace order (the labelStats collect/sort/transform pattern).
    * This is the shape a SQL oracle can replay (and how the q94 oracle
    * does), but NOT the plan to run at scale: it expands corpus × k × m
    * rows (64× at k=m=8) through a full shuffle that the row-local
    * default avoids entirely. Kept for oracle parity and as the
    * cross-shape proof target. */
  def pqIndexRelational(emb: DataFrame, codebook: DataFrame, id: Column,
      vec: Column, m: Int, sub: Int): DataFrame = {
    require(m > 0 && sub > 0, s"need positive m/sub, got $m/$sub")
    val cb = codebook.select(id.as("cid"), vec.as("ce"))
    val subDists = emb.select(id.as("vec_id"), vec.as("e"))
      .join(broadcast(cb), expr("true"))
      .select(col("vec_id"), col("cid"),
        explode(array((0 until m).map { s =>
          struct(lit(s).as("s"),
            (1 to sub).map { c =>
              val d = element_at(col("e"), s * sub + c).cast("double") -
                element_at(col("ce"), s * sub + c).cast("double")
              d * d
            }.reduce(_ + _).as("dist"))
        }: _*)).as("sd"))
      .select(col("vec_id"), col("cid"),
        col("sd.s").as("s"), col("sd.dist").as("dist"))
    val w = Window.partitionBy(col("vec_id"), col("s"))
      .orderBy(col("dist"), col("cid"))
    val codes = subDists.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("s"), col("cid").cast("int").as("code"))
    // re-attach the winning entry's sub-slice (broadcast k rows, cheap)
    // and glue per-vector codes + reconstruction in subspace order
    val subArr = array((1 to sub).map(c =>
      element_at(col("ce"), col("s") * lit(sub) + lit(c)).cast("double")): _*)
    codes.join(broadcast(cb), col("code") === col("cid"))
      .select(col("vec_id"), col("s"), col("code"), subArr.as("sub"))
      .groupBy("vec_id")
      .agg(
        transform(array_sort(collect_list(struct(col("s"), col("code")))),
          x => x.getField("code")).as("codes"),
        flatten(transform(
          array_sort(collect_list(struct(col("s"), col("sub")))),
          x => x.getField("sub"))).as("recon"))
  }

  /** Asymmetric top-k over a PQ index: each float query scored against
    * every indexed reconstruction via [[graft.functions.PQAdcDist]]
    * (queries broadcast, corpus never shuffles), ranked on the 1e-6-rounded
    * distance with the neighbor id as tie-break (the house ranking rule —
    * stable under float noise, engine-reproducible). Output
    * `(query_id, rk, neighbor_id, adc_dist)`. */
  def pqTopK(index: DataFrame, queries: DataFrame, id: Column, vec: Column,
      k: Int, sub: Int): DataFrame = {
    VectorExpressions.register(queries.sparkSession)
    val q = queries.select(id.as("qid"), vec.as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist"), col("vec_id"))
    broadcast(q).join(index, col("qid") =!= col("vec_id"))
      .withColumn("adc_dist",
        round(VectorExpressions.pqAdcDist(col("qe"), col("recon"), sub), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"),
        col("vec_id").as("neighbor_id"), col("adc_dist"))
  }

  /** The LUT fast path of [[pqTopK]] — same output, O(m) work per
    * candidate: each query precomputes its lookup table of `k·m` subspace
    * partials against the codebook (`lut[cid·m + s] = ‖q_s − c_{cid,s}‖²`,
    * one small broadcast join + one per-query aggregation), and scoring a
    * coded candidate is m array gathers ([[graft.functions.PQLutDist]])
    * instead of O(dim) arithmetic — the shape that wins when each query
    * scans 10⁹ coded rows. The LUT partials use the same fixed-order
    * inner sums as [[graft.functions.PQAdcDist]]'s subspace groups, so
    * the two paths return bit-identical distances (PQSpec asserts
    * row-set equality including the doubles).
    *
    * PRECONDITION (checked): codebook entry ids are exactly 0..k−1 —
    * the LUT is indexed by raw code, so a 1-based or gappy id set would
    * silently score against the wrong subspace partials (or throw an
    * unexplained ArrayIndexOutOfBounds mid-query). The check collects
    * the (small, k-row) cid set at plan-build time and fails fast with
    * the offending ids. */
  def pqTopKLut(index: DataFrame, queries: DataFrame, codebook: DataFrame,
      id: Column, vec: Column, k: Int, m: Int, sub: Int): DataFrame = {
    VectorExpressions.register(queries.sparkSession)
    val cb = codebook.select(id.cast("int").as("cid"), vec.as("ce"))
    val cids = cb.select(col("cid")).collect().map(_.getInt(0)).sorted
    require(cids.nonEmpty && cids.head == 0 &&
      cids.last == cids.length - 1 && cids.distinct.length == cids.length,
      "pqTopKLut requires codebook entry ids to be exactly 0..k-1 " +
        "(PQLutDist indexes the LUT by raw code value); got ids " +
        s"[${cids.take(20).mkString(", ")}${if (cids.length > 20) ", …" else ""}]")
    val parts = array((0 until m).map { s =>
      (1 to sub).map { c =>
        val d = element_at(col("qe"), s * sub + c).cast("double") -
          element_at(col("ce"), s * sub + c).cast("double")
        d * d
      }.reduce(_ + _)
    }: _*)
    val luts = queries.select(id.as("qid"), vec.as("qe"))
      .join(broadcast(cb), expr("true"))
      .select(col("qid"), col("qe"), col("cid"), parts.as("parts"))
      .groupBy("qid")
      .agg(first(col("qe")).as("qe"),
        flatten(transform(
          array_sort(collect_list(struct(col("cid"), col("parts")))),
          x => x.getField("parts"))).as("lut"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist"), col("vec_id"))
    broadcast(luts).join(index, col("qid") =!= col("vec_id"))
      .withColumn("adc_dist",
        round(VectorExpressions.pqLutDist(col("lut"), col("codes"), m), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"),
        col("vec_id").as("neighbor_id"), col("adc_dist"))
  }

  /** Vector dimension at or above which [[pqTopKLut]] outruns direct ADC
    * scoring. Measured (DECISIONS.md "LUT-vs-ADC"): at dim=64 the ADC
    * fold is 64 fused multiply-adds inside one codegen'd expression and
    * BEATS the LUT's m dependent array gathers (1.19 s vs 2.22 s over
    * 10 M candidates); the LUT's O(m) arithmetic only dominates once the
    * per-candidate O(dim) work does — transformer embedding widths. The
    * crossover is conservative: below it the measured loss is 1.9×, and
    * because the two paths are bit-identical (PQSpec), a wrong guess
    * here can cost time but never move a ranking. */
  val LutMinDim: Int = 512

  /** [[pqTopK]] with the scoring path SELF-SELECTING on vector width:
    * direct ADC below [[LutMinDim]], the per-query lookup table at or
    * above it. Same output either way — the two scorers are bit-identical
    * by construction — so callers get the measured-faster plan without
    * owning the dim heuristic. */
  def pqTopKAuto(index: DataFrame, queries: DataFrame, codebook: DataFrame,
      id: Column, vec: Column, k: Int, m: Int, sub: Int): DataFrame =
    if (m * sub >= LutMinDim)
      pqTopKLut(index, queries, codebook, id, vec, k, m, sub)
    else pqTopK(index, queries, id, vec, k, sub)

  /** Row-local PQ encode against a COLLECTED codebook — the expression
    * engine behind BOTH [[pqIndex]] and the streaming encode face (a
    * stream could host neither the window argmin nor the collect_list
    * glue of the relational form): per subspace, every codebook entry
    * contributes a `(dist, cid)` struct and `least` picks the winner, so
    * the whole encode is one stateless expression tree. Arithmetic
    * mirrors [[pqIndexRelational]] exactly — same fixed-order squared-L2
    * per entry, same tie-break (equal dists → smallest entry id via the
    * struct comparison) — so row-local codes equal a relational
    * re-encode value-for-value (StreamingSpec + PQSpec parity). Returns
    * `(codes: array<int>, recon: array<double>)` as two Columns to
    * attach to any frame with the embedding column. */
  def pqEncodeExprs(vec: Column, cents: Seq[(Int, Array[Float])], m: Int,
      sub: Int): (Column, Column) = {
    require(cents.nonEmpty, "codebook must be non-empty")
    val winners = (0 until m).map { s =>
      val scored = cents.map { case (cid, ce) =>
        val dist = (1 to sub).map { c =>
          val d = element_at(vec, s * sub + c).cast("double") -
            lit(ce(s * sub + c - 1).toDouble)
          d * d
        }.reduce(_ + _)
        struct(dist.as("dist"), lit(cid).as("cid"))
      }
      if (scored.sizeIs == 1) scored.head else least(scored: _*)
    }
    val codes = array(winners.map(_.getField("cid")): _*)
    // reconstruction: one cid -> full-entry MAP LITERAL, each subspace
    // slicing the winning entry's components out of a single lookup.
    // (The obvious per-component when-chain re-embeds the whole argmin
    // tree in every branch condition — k·m·sub copies — which blows the
    // expression tree into millions of nodes at k=64 and overflows
    // Catalyst's transform recursion. The map form keeps ONE argmin tree
    // per subspace and the codebook as one literal.)
    val cmap = typedLit(cents.map { case (cid, ce) =>
      cid -> ce.map(_.toDouble).toSeq }.toMap)
    val recon = concat((0 until m).map { s =>
      slice(element_at(cmap, winners(s).getField("cid")),
        s * sub + 1, sub)
    }: _*)
    (codes, recon)
  }

  /** Exact re-rank of a PQ shortlist — the production search composition:
    * [[pqTopK]] prunes the corpus to a per-query candidate shortlist on
    * codes alone, then ONLY those candidates are re-scored against the
    * float corpus with exact squared L2 (`q·q − 2·q·n + n·n`, three
    * fixed-order [[graft.functions.FloatVectorDot]]s — bit-reproducible)
    * and re-ranked to the final `k`. At scale the float fetch is a
    * shortlist-sized hash join (shortlist ≪ corpus), so the expensive
    * exact arithmetic touches `queries × shortlist` rows, never
    * `queries × corpus` — ADC recall at exact-ranking precision. Output
    * `(query_id, rk, neighbor_id, l2_dist)`. */
  def pqRerankTopK(shortlist: DataFrame, emb: DataFrame, queries: DataFrame,
      id: Column, vec: Column, k: Int): DataFrame = {
    VectorExpressions.register(emb.sparkSession)
    def selfDot(n: String) = VectorExpressions.floatDot(
      col(s"${n}_e"), col(s"${n}_e"))
    val q = queries.select(id.as("qid"), vec.as("q_e"))
    val c = emb.select(id.as("nid"), vec.as("n_e"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("l2_dist"), col("nid"))
    // the (queries × shortlist)-row frame broadcasts; the corpus float
    // fetch is then a map-side hash join, never an SMJ shuffle of emb
    c.join(broadcast(
        shortlist.select(col("query_id").as("qid"),
          col("neighbor_id").as("nid"))
        .join(broadcast(q), "qid")), "nid")
      .withColumn("l2_dist", round(
        selfDot("q") - lit(2.0) * VectorExpressions.floatDot(
          col("q_e"), col("n_e")) + selfDot("n"), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"),
        col("nid").as("neighbor_id"), col("l2_dist"))
  }

  /** IVF-PQ: the standard billion-scale composition — a coarse quantizer
    * partitions the corpus into cosine cells ([[SimilarityOps
    * .assignCells]]), PQ codes live per cell, and a query scores codes
    * ONLY in its `nProbe` nearest cells. Cost per query drops from
    * corpus-linear to (corpus/cells)·nProbe while both index halves stay
    * compressed: the cell id prunes, the codes score, floats appear
    * nowhere after indexing. Join is equi on cell — a shuffled hash join
    * at scale, queries broadcast. Output
    * `(query_id, rk, neighbor_id, cell, adc_dist)`; ranking is the house
    * (rounded dist, id) rule. Probing and scoring reuse the exact
    * arithmetic of their standalone operators, so the composition adds no
    * new numeric surface — it IS [[pqTopK]] restricted by q43's cell
    * assignment, which is how the oracle replays it. */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, cells: DataFrame,
      codebook: DataFrame, id: Column, vec: Column, k: Int, nProbe: Int,
      m: Int, sub: Int): DataFrame =
    ivfPqTopKIndexed(ivfPqIndex(emb, cells, codebook, id, vec, m, sub),
      queries, cells, id, vec, k, nProbe, sub)

  /** The IVF-PQ index half of [[ivfPqTopK]] on its own — PQ codes
    * joined with the coarse-cell assignment, `(vec_id, codes, recon,
    * cell)`. A production deployment builds this ONCE and serves many
    * searches ([[ivfPqTopKIndexed]]); the one-shot [[ivfPqTopK]] is
    * index∘search by construction, so the two forms cannot drift. */
  def ivfPqIndex(emb: DataFrame, cells: DataFrame, codebook: DataFrame,
      id: Column, vec: Column, m: Int, sub: Int): DataFrame = {
    val corpusCells = SimilarityOps.assignCells(emb, cells, id, vec)
      .select(col("vec_id"), col("cell"))
    pqIndex(emb, codebook, id, vec, m, sub).join(corpusCells, "vec_id")
  }

  /** [[ivfPqTopK]]'s SEARCH half over a prebuilt [[ivfPqIndex]]. */
  def ivfPqTopKIndexed(idx: DataFrame, queries: DataFrame,
      cells: DataFrame, id: Column, vec: Column, k: Int, nProbe: Int,
      sub: Int): DataFrame = {
    VectorExpressions.register(queries.sparkSession)
    // query-side probe list: top-nProbe cells by the same rounded cosine
    // and tie-break as assignCells (nProbe=1 degenerates to it)
    val cents = cells.select(id.as("cid"), vec.as("ce"),
      sqrt(VectorExpressions.floatDot(vec, vec)).as("cnrm"))
    val qn = queries.select(id.as("qid"), vec.as("qe"),
      sqrt(VectorExpressions.floatDot(vec, vec)).as("qnrm"))
    val wp = Window.partitionBy(col("qid"))
      .orderBy(col("c_sim").desc, col("cid"))
    val probes = qn.join(broadcast(cents), expr("true"))
      .withColumn("c_sim", when(col("qnrm") * col("cnrm") > 0,
        round(VectorExpressions.floatDot(col("qe"), col("ce")) /
          (col("qnrm") * col("cnrm")), 6)))
      .withColumn("crk", row_number().over(wp))
      .where(col("crk") <= nProbe)
      .select(col("qid"), col("qe"), col("cid").as("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist"), col("vec_id"))
    broadcast(probes).join(idx, Seq("cell"))
      .where(col("qid") =!= col("vec_id"))
      .withColumn("adc_dist",
        round(VectorExpressions.pqAdcDist(col("qe"), col("recon"), sub), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"),
        col("vec_id").as("neighbor_id"), col("cell"), col("adc_dist"))
  }

  /** Residual of every vector against its assigned coarse cell's
    * centroid — the encode input of IVFADC (Jégou, Douze, Schmid, TPAMI
    * 2011 §V-A: quantize `r = x − q1(x)`, not `x`, because residuals are
    * small and centered so the same PQ bit budget buys less distortion).
    * FULLY ROW-LOCAL: the (small) cell set is collected once, assignment
    * is [[SimilarityOps.cellExprFor]] (value-identical to the relational
    * `assignCells`, StreamingSpec parity) and the centroid comes back out
    * of a cid→centroid map literal — zero shuffle, no corpus × cells
    * expansion, the [[pqIndex]] scale discipline. The subtraction is
    * element-wise FLOAT arithmetic (`zip_with`), bit-exact cross-engine
    * (DuckDB REAL subtraction is IEEE-single-identical — measured), so
    * residuals are oracle-replayable. Output
    * `(vec_id, cell, res: array<float>)`. */
  def cellResiduals(emb: DataFrame, cells: DataFrame, id: Column,
      vec: Column): DataFrame = {
    VectorExpressions.register(emb.sparkSession)
    val rows = cells.select(id.cast("long").as("cid"), vec.as("ce"))
      .collect()
    require(rows.nonEmpty, "cell centroid set must be non-empty")
    val cents = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val cmap = typedLit(cents.map { case (cid, ce) => cid -> ce.toSeq }.toMap)
    // cell assignment + residual subtraction (and the residual encode
    // chained on top by ivfPqResidualIndex) are per-row-heavy; see
    // pqIndex's note
    Fanout.spread(emb).select(id.as("vec_id"), vec.as("_e"))
      .withColumn("cell", SimilarityOps.cellExprFor(col("_e"), cents))
      .select(col("vec_id"), col("cell"),
        zip_with(col("_e"), element_at(cmap, col("cell")),
          (a, b) => a - b).as("res"))
  }

  /** IVFADC index: PQ codes over CELL RESIDUALS instead of raw vectors —
    * [[cellResiduals]] then the row-local encode, so the whole build is
    * one stateless expression pass over the corpus (zero shuffle).
    * `codebook` lives in RESIDUAL space (entries are residual-sized
    * vectors — a fixed deterministic residual sample, or
    * [[pqLearnCodebook]] fitted on [[cellResiduals]] output). Output
    * `(vec_id, cell, codes, recon)` where `recon` reconstructs the
    * RESIDUAL — search must compare it against `query − centroid`,
    * which [[ivfPqResidualTopK]] does. */
  def ivfPqResidualIndex(emb: DataFrame, cells: DataFrame,
      codebook: DataFrame, id: Column, vec: Column, m: Int,
      sub: Int): DataFrame = {
    require(m > 0 && sub > 0, s"need positive m/sub, got $m/$sub")
    val rows = codebook.select(id.cast("int").as("cid"), vec.as("ce"))
      .collect()
    require(rows.nonEmpty, "codebook must be non-empty")
    val cents = rows.map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val (codes, recon) = pqEncodeExprs(col("res"), cents, m, sub)
    cellResiduals(emb, cells, id, vec)
      .select(col("vec_id"), col("cell"),
        codes.as("codes"), recon.as("recon"))
  }

  /** IVFADC search over a residual-coded index: identical probing to
    * [[ivfPqTopK]] (top-`nProbe` cells by the q43 rounded cosine), but
    * each probe carries `qres = query − probed cell's centroid` and ADC
    * runs residual-against-residual —
    * `‖q − (c + recon_r)‖² = ‖(q − c) − recon_r‖²`, so the existing
    * [[graft.functions.PQAdcDist]] scores it unchanged. Same cost shape
    * as the raw composition ((corpus/cells)·nProbe per query, queries
    * broadcast, floats appear nowhere after indexing) — the residual
    * encoding buys accuracy, not speed: the ADC estimate now carries the
    * EXACT centroid offset and quantizes only the small residual, which
    * is why production billion-scale deployments run this form. Output
    * `(query_id, rk, neighbor_id, cell, adc_dist)`, house ranking rule. */
  def ivfPqResidualTopK(emb: DataFrame, queries: DataFrame,
      cells: DataFrame, codebook: DataFrame, id: Column, vec: Column,
      k: Int, nProbe: Int, m: Int, sub: Int): DataFrame =
    ivfPqResidualTopKIndexed(
      ivfPqResidualIndex(emb, cells, codebook, id, vec, m, sub),
      queries, cells, id, vec, k, nProbe, sub)

  /** [[ivfPqResidualTopK]]'s SEARCH half over a prebuilt
    * [[ivfPqResidualIndex]] — the build-once/serve-many split
    * ([[ivfPqTopKIndexed]]'s shape for the residual-coded tier). */
  def ivfPqResidualTopKIndexed(idx: DataFrame, queries: DataFrame,
      cells: DataFrame, id: Column, vec: Column,
      k: Int, nProbe: Int, sub: Int): DataFrame = {
    VectorExpressions.register(queries.sparkSession)
    val cents = cells.select(id.as("cid"), vec.as("ce"),
      sqrt(VectorExpressions.floatDot(vec, vec)).as("cnrm"))
    val qn = queries.select(id.as("qid"), vec.as("qe"),
      sqrt(VectorExpressions.floatDot(vec, vec)).as("qnrm"))
    val wp = Window.partitionBy(col("qid"))
      .orderBy(col("c_sim").desc, col("cid"))
    val probes = qn.join(broadcast(cents), expr("true"))
      .withColumn("c_sim", when(col("qnrm") * col("cnrm") > 0,
        round(VectorExpressions.floatDot(col("qe"), col("ce")) /
          (col("qnrm") * col("cnrm")), 6)))
      .withColumn("crk", row_number().over(wp))
      .where(col("crk") <= nProbe)
      .select(col("qid"),
        zip_with(col("qe"), col("ce"), (a, b) => a - b).as("qres"),
        col("cid").as("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist"), col("vec_id"))
    broadcast(probes).join(idx, Seq("cell"))
      .where(col("qid") =!= col("vec_id"))
      .withColumn("adc_dist",
        round(VectorExpressions.pqAdcDist(col("qres"), col("recon"), sub), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"),
        col("vec_id").as("neighbor_id"), col("cell"), col("adc_dist"))
  }

  /** The m·k·k subspace-dot table of a collected codebook — the static
    * input of [[graft.functions.PQCodeDot]]:
    * `t[(i·k+j)·m+s] = Σ_c cb_i[s·sub+c] · cb_j[s·sub+c]` in fixed
    * c-order doubles, entry-pair-major. k·k·m doubles (4 KB at k=m=8)
    * replace every reconstruction the code-space screen would otherwise
    * materialize. Validates the 0..k−1 id precondition the raw-code
    * indexing relies on (the pqTopKLut rule). */
  def pqCodeDotTable(cents: Seq[(Int, Array[Float])], m: Int,
      sub: Int): Array[Double] = {
    val k = cents.size
    val ids = cents.map(_._1).sorted
    require(ids == (0 until k),
      s"pq code-dot table requires codebook ids exactly 0..${k - 1} " +
        s"(indexed by raw code pairs); got [${ids.take(20).mkString(", ")}]")
    val byId = cents.sortBy(_._1).map(_._2)
    val t = new Array[Double](k * k * m)
    for (i <- 0 until k; j <- 0 until k; s <- 0 until m) {
      var acc = 0.0
      var c = 0
      while (c < sub) {
        acc += byId(i)(s * sub + c).toDouble * byId(j)(s * sub + c).toDouble
        c += 1
      }
      t((i * k + j) * m + s) = acc
    }
    t
  }

  /** PQ code-space cell index — the deepest tier of the compression
    * screen ladder (SQ8's [[SimilarityOps.sq8CellIndex]] at 65 B/vector,
    * this at ~8 B/vector + one 4 KB table): `(vec_id, cell, codes, nrm)`
    * with `nrm` the reconstructed norm computed via the code-dot table,
    * so floats are discarded after this one pass and never refetched.
    * FULLY ROW-LOCAL (cellExprFor assignment + expression encode + table
    * norm — zero shuffle, the pqIndex discipline); the ingest screen
    * ([[graft.streaming.Streaming.pqSemanticScreenStream]]) consumes it
    * as its static side. */
  def pqCellIndex(emb: DataFrame, cells: DataFrame, codebook: DataFrame,
      id: Column, vec: Column, m: Int, sub: Int): DataFrame = {
    VectorExpressions.register(emb.sparkSession)
    val cellRows = cells.select(id.cast("long").as("cid"), vec.as("ce"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val cbRows = codebook.select(id.cast("int").as("cid"), vec.as("ce"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val (codes, _) = pqEncodeExprs(vec, cbRows, m, sub)
    val table = typedLit(pqCodeDotTable(cbRows, m, sub).toSeq)
    // encode + cell assignment are per-row-heavy; see pqIndex's note
    Fanout.spread(emb).select(id.as("vec_id"),
        SimilarityOps.cellExprFor(vec, cellRows).as("cell"),
        codes.as("codes"))
      .withColumn("nrm", sqrt(VectorExpressions.pqCodeDot(table,
        col("codes"), col("codes"), m, cbRows.size)))
  }

  /** Incremental semantic near-dup screen with BOTH sides in PQ code
    * space — [[SimilarityOps.incrementalSemanticDedup]]'s contract
    * (same cell-local compare, same (vec_id, cell, kept) schema) over
    * reconstructed cosines computed entirely from codes: an arriving
    * vector is dropped iff some corpus CODE vector in its cell reaches
    * `threshold` reconstructed cosine. Per pair the compare is m table
    * gathers ([[graft.functions.PQCodeDot]]) — no reconstruction is ever
    * materialized, the corpus side is the ~8 B/vector [[pqCellIndex]],
    * and the small delta side broadcasts so the corpus never shuffles.
    *
    * The SQ8 screen's code-space caveat applies one tier deeper: the
    * codebook can only represent directions it was built from, so
    * distribution drift at ingest warrants a codebook re-fit (the
    * standing static-index rule). */
  def pqSemanticScreen(delta: DataFrame, corpusIdx: DataFrame,
      cells: DataFrame, codebook: DataFrame, id: Column, vec: Column,
      threshold: Double, m: Int, sub: Int): DataFrame = {
    VectorExpressions.register(delta.sparkSession)
    val cellRows = cells.select(id.cast("long").as("cid"), vec.as("ce"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val cbRows = codebook.select(id.cast("int").as("cid"), vec.as("ce"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val (codes, _) = pqEncodeExprs(vec, cbRows, m, sub)
    val table = typedLit(pqCodeDotTable(cbRows, m, sub).toSeq)
    val k = cbRows.size
    val enc = delta.select(id.as("vec_id"),
        SimilarityOps.cellExprFor(vec, cellRows).as("cell"),
        codes.as("_dc"))
      .withColumn("_dn", sqrt(VectorExpressions.pqCodeDot(table,
        col("_dc"), col("_dc"), m, k)))
    val hits = broadcast(enc)
      .join(corpusIdx.select(col("cell"), col("codes").as("_cc"),
        col("nrm").as("_cn")), Seq("cell"))
      .withColumn("_sim", when(col("_dn") * col("_cn") > 0,
        round(VectorExpressions.pqCodeDot(table, col("_dc"), col("_cc"),
          m, k) / (col("_dn") * col("_cn")), 6)))
      .where(col("_sim") >= threshold)
      .select(col("vec_id")).distinct()
      .withColumn("_dup", lit(true))
    enc.join(hits, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("_dup"), lit(false)).unary_!.as("kept"))
  }

  /** Per-dimension variance of the embedding corpus — the input of
    * [[balancedPermutation]]. One pass, 64-group aggregate; both moments
    * ride [[graft.functions.Exact]]'s decimal path so the variances (and
    * therefore the permutation ranked from them) are order-independent
    * and engine-reproducible. Output `(dim, var)`, `dim` 1-based. */
  def dimVariances(emb: DataFrame, vec: Column, dim: Int): DataFrame = {
    require(dim > 0, s"need a positive dim, got $dim")
    emb.select(posexplode(vec).as(Seq("_p", "_x")))
      .select((col("_p") + 1).as("dim"), col("_x").cast("double").as("x"))
      .groupBy("dim")
      .agg(count(lit(1)).as("_n"),
        graft.functions.Exact.dsum(col("x")).as("_s"),
        graft.functions.Exact.dsum(col("x") * col("x")).as("_s2"))
      .select(col("dim").cast("int").as("dim"),
        ((col("_s2") - col("_s") * col("_s") / col("_n")) / col("_n"))
          .as("var"))
  }

  /** Variance-balanced subspace allocation — the rotation-free half of
    * optimized product quantization (public method: Ge, He, Ke, Sun,
    * "Optimized Product Quantization", CVPR 2013 — their eigenvalue-
    * allocation principle, applied to raw dimension variances instead of
    * PCA eigenvalues): rank dimensions by variance descending and deal
    * them round-robin across the `m` subspaces, so every subspace gets
    * one dim from each variance stratum. A CONTIGUOUS split can hand one
    * subspace all the high-variance dimensions — its k centroids then
    * carry the whole corpus's spread while other subspaces quantize
    * noise; balancing equalizes per-subspace work, which is what the
    * shared per-subspace bit budget (k entries each) assumes. Returns
    * the permutation as output-position → source-dim (0-based, length
    * `m·sub`): output slot `s·sub + j` takes the dim ranked `j·m + s`.
    * Deterministic: ranked on (var desc, dim). */
  def balancedPermutation(vars: Seq[(Int, Double)], m: Int,
      sub: Int): Seq[Int] = {
    require(vars.size == m * sub,
      s"need exactly ${m * sub} dims, got ${vars.size}")
    val ranked = vars.sortBy { case (d, v) => (-v, d) }.map(_._1 - 1)
    // rank i (0-based) goes to subspace i % m, slot i / m within it
    val out = new Array[Int](m * sub)
    ranked.zipWithIndex.foreach { case (src, i) =>
      out((i % m) * sub + i / m) = src }
    out.toSeq
  }

  /** The permuted view of a vector column under an output→source map —
    * row-local gather, zero shuffle. */
  def permuteExpr(vec: Column, perm: Seq[Int]): Column =
    array(perm.map(src => element_at(vec, src + 1)): _*)

  /** Quantization-drift monitor — the operator behind the standing
    * static-index rule ("distribution drift at ingest warrants a codebook
    * re-fit") that until now was only documented: measure the PQ
    * codebook's reconstruction error on an arriving DELTA against the
    * same codebook's error on the corpus it was fitted to, and flag a
    * re-fit when the ratio crosses `refitRatio`. A codebook can only
    * represent directions it was built from, so a corpus whose
    * distribution moves (new language, new embedding model, new domain)
    * degrades EVERY downstream code-space screen silently — recall decays
    * with no failed row anywhere. Recon error is the one number that
    * sees it: `‖v − recon(encode(v))‖²` rises exactly when vectors leave
    * the fitted manifold.
    *
    * Output two rows `(side, n, mean_err, max_err, err_ratio, refit)` —
    * `baseline` (ratio 1.0, never flags) and `delta` (ratio =
    * delta mean / baseline mean on the 6-rounded means, flags at
    * `refitRatio`). Mean rides [[graft.functions.Exact]]'s decimal-sum
    * path (order-independent, engine-reproducible); per-row error is the
    * same fixed-order [[graft.functions.PQAdcDist]] arithmetic the
    * search path scores with, so the monitor measures EXACTLY the error
    * the screens experience. Fully row-local per side (the
    * [[pqEncodeExprs]] encode + one aggregate each — zero shuffle,
    * O(corpus + delta) one-pass); at ingest run the baseline row once at
    * fit time and persist it. */
  def quantizationDrift(baseline: DataFrame, delta: DataFrame,
      codebook: DataFrame, id: Column, vec: Column, m: Int, sub: Int,
      refitRatio: Double = 1.5): DataFrame = {
    require(refitRatio > 0, s"refitRatio must be positive, got $refitRatio")
    VectorExpressions.register(baseline.sparkSession)
    val rows = codebook.select(id.cast("int").as("cid"), vec.as("ce"))
      .collect()
    require(rows.nonEmpty, "codebook must be non-empty")
    val cents = rows.map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    def stats(side: DataFrame) = {
      val (_, recon) = pqEncodeExprs(vec, cents, m, sub)
      side.select(
          VectorExpressions.pqAdcDist(vec, recon, sub).as("_err"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Exact.dsum(col("_err")) / count(lit(1)), 6)
            .as("mean_err"),
          round(max(col("_err")), 6).as("max_err"))
    }
    val b = stats(baseline)
    b.withColumn("side", lit("baseline"))
      .withColumn("err_ratio", lit(1.0))
      .withColumn("refit", lit(false))
      .unionByName(stats(delta)
        .crossJoin(broadcast(b.select(col("mean_err").as("_bm"))))
        .withColumn("side", lit("delta"))
        .withColumn("err_ratio", when(col("_bm") > 0,
          round(col("mean_err") / col("_bm"), 6)))
        .withColumn("refit",
          coalesce(col("err_ratio") >= refitRatio, lit(false)))
        .drop("_bm"))
      .select("side", "n", "mean_err", "max_err", "err_ratio", "refit")
  }

  /** Learn a PQ codebook: an independent `k`-means per subspace over the
    * corpus's sub-vectors (squared-L2 geometry — the metric PQ encodes,
    * unlike the cosine k-means of [[SimilarityOps.learnCentroids]]),
    * glued into `k` full-dimension rows so the learned codebook drops
    * into the same [[pqIndex]]/[[pqTopK]] machinery as a fixed sample.
    * Deterministic for a fixed seed and input; the m fits each see only a
    * `sub`-wide projection (cheap), and only m·k·sub floats come back to
    * the driver. Fit inputs are not persisted — nothing to unpersist
    * (the q48 checkpoint-lifecycle lesson). */
  def pqLearnCodebook(emb: DataFrame, vec: Column, m: Int, sub: Int,
      k: Int, idName: String, vecName: String, seed: Long = 42L,
      maxIter: Int = 20, initMode: String = "k-means||"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val spark = emb.sparkSession
    import spark.implicits._
    // one materialized narrow projection feeds all m fits (not m parquet
    // re-scans), and the fits run CONCURRENTLY: each is a driver-
    // coordinated iteration of tiny jobs, so sequential fits pay
    // m × iterations × job-overhead in wall-clock while the cluster
    // idles — concurrent submission collapses that to ~the slowest fit
    // (measured 9.4 → ~2 s at m=8). Results are unchanged: the fits are
    // independent and each keeps its own deterministic seed.
    val base = emb.select(vec.as("_e")).persist()
    base.count()
    try {
      val futs = (0 until m).map { s =>
        Future {
          val feats = base.select(array_to_vector(
            array((1 to sub).map(c =>
              element_at(col("_e"), s * sub + c)): _*)).as("features"))
          new KMeans()
            .setK(k).setSeed(seed + s).setMaxIter(maxIter)
            .setInitMode(initMode)
            .setFeaturesCol("features")
            .fit(feats)
            .clusterCenters.map(_.toArray.map(_.toFloat))
        }
      }
      val perSubspace = futs.map(Await.result(_, Duration.Inf))
      (0 until k).map { j =>
        (j.toLong, (0 until m).flatMap(s => perSubspace(s)(j)).toArray)
      }.toDF(idName, vecName)
    } finally base.unpersist(blocking = false) // the q48 lifecycle rule
  }
}
