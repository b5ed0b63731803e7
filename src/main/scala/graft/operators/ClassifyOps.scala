package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Learned document classification — the curation-pipeline quality/domain
  * classifier tier (CCNet/fastText-style: train a cheap linear model on the
  * corpus's own labels, score every document with it). The model family is
  * multinomial Naive Bayes with add-one smoothing (Manning/Raghavan/Schütze,
  * IIR ch. 13): closed-form — the fit is ONE counting aggregation, no
  * iterations — which is what makes a *learned* classifier fully
  * oracle-checkable where k-means/SGD fits are rows-only.
  *
  * Float determinism (the [[TextOps.lmScore]] convention): every per-token
  * class log-likelihood and every class log-prior is rounded to 1e-6 and
  * carried as DECIMAL(18,6); per-document scores are DECIMAL sums of those —
  * exact and order-independent — so argmax ties break identically in any
  * engine whose `ln` agrees to ~1e-7, and the (score desc, label asc)
  * tie-break is total.
  *
  * Scale shape: the fit is a wordcount-shaped aggregation pivoted over the
  * class domain (classes are FEW by definition — the pivot widens rows, it
  * never multiplies them), plus two single-row reductions (class token
  * totals + vocabulary size; class priors). The only corpus-scale artifact
  * is the per-word model table, and the apply join against it gets the
  * [[TextOps.lmScore]] Zipf frequency split: the top-[[TextOps.LmHeadK]]
  * words' likelihood rows ride a broadcast (hot keys never shuffle), only
  * tail tokens shuffle on the de-skewed word key, then one per-doc
  * aggregation. The class domain is the operator's one bounded collect
  * (the k-row centroid-table precedent). */
object ClassifyOps {

  /** Cohen's κ agreement between two label columns (Cohen 1960) — the
    * standard chance-corrected audit for annotator/heuristic agreement
    * (here: does a cheap classifier agree with stored labels beyond
    * what the label marginals guarantee? κ ≈ 0 exposes a predictor
    * that "agrees" only by echoing the majority class, which raw
    * accuracy hides). Returns ONE row `(n, n_agree, po, pe, kappa)`.
    *
    * Shape: one corpus aggregation to a label²-sized confusion frame;
    * marginal products and the observed/expected agreement are exact
    * BIGINT arithmetic until three final double divisions, so the
    * oracle replays bit-identically. */
  def cohenKappa(labeled: DataFrame, a: Column, b: Column): DataFrame = {
    val conf = labeled.select(a.as("la"), b.as("lb"))
      .groupBy("la", "lb").agg(count(lit(1)).as("c"))
    val tot = conf.agg(
      sum(col("c")).as("n"),
      coalesce(sum(when(col("la") === col("lb"), col("c"))), lit(0L))
        .as("n_agree"))
    // marginal products reach N²: BIGINT would wrap silently past
    // ~3e9 agreed rows, so the product-sum runs in DECIMAL(38,0)
    // (the DuckDB twin's sum() is HUGEINT — 128-bit — natively)
    val marg = conf.groupBy("la").agg(sum(col("c")).as("ra"))
      .join(conf.groupBy("lb").agg(sum(col("c")).as("cb")),
        col("la") === col("lb"))
      .agg(coalesce(sum(col("ra").cast("decimal(19,0)") *
          col("cb").cast("decimal(19,0)")),
        lit(0).cast("decimal(38,0)")).as("pe_num"))
    val n = col("n").cast("double")
    val po = col("n_agree").cast("double") / n
    val pe = col("pe_num").cast("double") / (n * n)
    tot.crossJoin(broadcast(marg))
      .select(col("n"), col("n_agree"),
        Exact.round6z(po).as("po"),
        Exact.round6z(pe).as("pe"),
        when(pe < 1.0, Exact.round6z((po - pe) / (lit(1.0) - pe)))
          .as("kappa"))
  }

  /** ROC-AUC of a score against a boolean label by the Mann–Whitney
    * rank-sum identity (Hanley & McNeil 1982) with midrank tie handling
    * — the standard acceptance metric for a distilled quality filter
    * (does the cheap score actually rank kept docs above dropped
    * ones?). Returns ONE row: `(n_pos, n_neg, auc)`.
    *
    * Scale design: the naive formulation ranks every document in one
    * global sort (a single-partition window over the corpus). Here the
    * corpus first collapses to per-DISTINCT-SCORE aggregates — a
    * round-6 score has bounded cardinality, orders of magnitude smaller
    * than the corpus — and the ordered cumulative window walks only
    * that frame (the heapsFit bucket trick). Midranks are exact
    * half-integers and the rank-sum accumulates in exact DECIMAL, so
    * the oracle replays bit-identically. */
  def scoreAuc(scored: DataFrame, score: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL scores/labels are excluded, not ranked: Spark's ASC window
    // sorts NULL first while DuckDB sorts it last, so admitting a NULL
    // group would silently shift every real rank (and a row with no
    // score expresses no ranking opinion anyway)
    val byScore = scored
      .select(score.as("s"), label.cast("boolean").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s").agg(
        count(lit(1)).as("n_tot"),
        Exact.countIf(col("y")).as("n_pos"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val ranked = byScore.select(
      col("n_tot"), col("n_pos"),
      (coalesce(sum(col("n_tot")).over(w), lit(0L)).cast("double") +
        (col("n_tot").cast("double") + lit(1.0)) / lit(2.0)).as("avg_rank"))
    // rank-sum reaches ~N²/2: the standard Exact.dsum DECIMAL(28,10)
    // saturates (NULL) near N~1e9; 38,10 is exact to N~1e14 docs
    ranked.agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_tot") - col("n_pos")).as("n_neg"),
        sum((col("n_pos").cast("double") * col("avg_rank"))
          .cast("decimal(38,10)")).cast("double").as("_r"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0, Exact.round6z(
          (col("_r") - col("n_pos").cast("double") *
            (col("n_pos").cast("double") + 1.0) / 2.0) /
          (col("n_pos").cast("double") * col("n_neg").cast("double"))))
          .as("auc"))
  }

  /** Classifier-drift detector for a FROZEN NB model — the q169
    * robustDrift shape applied to the classifier tier (r13 verdict item
    * 4: the NB model "ages silently under a long-running ingest
    * stream"): per true label, the frozen model's accuracy on its
    * acceptance BASELINE confusion versus on a new-arrivals confusion,
    * the drop, and a `needs_refit` verdict — true when the drop exceeds
    * `dropThresh` or the label is missing on either side (a vanished or
    * brand-new class is always a refit trigger; NB counts are additive
    * and COULD fold incrementally, but a drifted input distribution
    * needs the re-fit decision first — this operator is that trigger).
    * Inputs are two `(label, pred_label, n)` confusion frames (the
    * q116/q118 output shape), so it composes over any split or
    * perturbation; both sides aggregate to label-cardinality frames
    * before the full-outer compare — nothing corpus-scale ever joins.
    * Accuracies are 1e-6-rounded before the compare, so the verdict is
    * engine-exact. */
  def confusionDrift(baseline: DataFrame, arrivals: DataFrame,
      dropThresh: Double = 0.1): DataFrame = {
    def acc(df: DataFrame, accName: String, nName: String): DataFrame =
      df.groupBy("label").agg(
        sum(col("n")).as(nName),
        Exact.round6z(
          coalesce(sum(when(col("label") === col("pred_label"), col("n"))),
            lit(0L)).cast("double") / sum(col("n")).cast("double"))
          .as(accName))
    acc(baseline, "acc_frozen", "n_base")
      .join(acc(arrivals, "acc_new", "n_new"), Seq("label"), "full_outer")
      .select(col("label"), col("n_base"), col("n_new"),
        col("acc_frozen"), col("acc_new"),
        Exact.znorm(round(col("acc_frozen") - col("acc_new"), 6))
          .as("drift"),
        (col("acc_frozen").isNull || col("acc_new").isNull ||
          (col("acc_frozen") - col("acc_new")) > dropThresh)
          .as("needs_refit"))
  }

  private def lpDec(c: Column): Column = round(c, 6).cast("decimal(18,6)")

  /** Smoothed per-word class log-likelihood table
    * `(word, _cnt, _lp_<label>...)` with
    * `_lp_l = round(ln((count(word,l)+1) / (tokens_l + |V|)), 6)` and
    * `_cnt` = corpus frequency (the Zipf-head split key, dropped by
    * [[nbClassify]] before scoring). Shared between the batch face and
    * [[graft.streaming.Streaming.nbClassifyStream]]'s static side so the
    * two cannot drift. */
  def nbModel(docs: DataFrame, text: Column, label: Column,
      labels: Seq[String]): DataFrame =
    nbFit(docs, text, label, labels)._1

  /** Class-prior + out-of-vocabulary constants, ONE wide row:
    * `_pri_l = round(ln(n_docs_l / n_docs), 6)` and
    * `_oov_l = round(ln(1 / (tokens_l + |V|)), 6)` (the smoothed
    * zero-count likelihood — what a word never seen in class `l`'s
    * training text scores). Broadcast onto the apply side. */
  def nbPriors(docs: DataFrame, text: Column, label: Column,
      labels: Seq[String]): DataFrame =
    nbFit(docs, text, label, labels)._2

  /** The shared fit behind [[nbModel]] and [[nbPriors]]: both need the
    * identical class-totals reduction (tokens per class + |V|), and two
    * separate calls each re-explode the training text and re-run that
    * corpus-wide aggregate. Here it is computed ONCE — the 1-row result
    * is eagerly materialized (localCheckpoint; fit semantics are eager by
    * nature) and referenced by both output frames, so a caller fitting
    * both tables pays one token-explode aggregate, not two. Returns
    * `(model, priors)`. */
  def nbFit(docs: DataFrame, text: Column, label: Column,
      labels: Seq[String]): (DataFrame, DataFrame) = {
    // tokenize + the pivot's partial aggregation ride the scan's stage;
    // spread a tiny single-split scan first (no-op at scale)
    val toks = Fanout.spread(docs)
      .select(label.as("_lbl"), explode(split(text, " ")).as("word"))
    val cls = toks.agg(
      countDistinct("word").as("_v"),
      labels.map(l =>
        sum(when(col("_lbl") === l, 1L).otherwise(0L)).as(s"_tot_$l")): _*)
      .localCheckpoint(true)
    val wc = toks.groupBy("word").pivot("_lbl", labels).count()
    val cntAll = labels.map(l => coalesce(col(s"`$l`"), lit(0L)))
      .reduce(_ + _).as("_cnt")
    val model = wc.join(broadcast(cls))
      .select(col("word") +: cntAll +: labels.map { l =>
        lpDec(log((coalesce(col(s"`$l`"), lit(0L)) + lit(1)).cast("double") /
          (col(s"_tot_$l") + col("_v")).cast("double"))).as(s"_lp_$l")
      }: _*)
    val pri = docs.agg(
      count(lit(1)).as("_n"),
      labels.map(l =>
        sum(when(label === l, 1L).otherwise(0L)).as(s"_n_$l")): _*)
    val priors = pri.join(broadcast(cls)).select(
      labels.map(l => lpDec(log(col(s"_n_$l").cast("double") /
        col("_n").cast("double"))).as(s"_pri_$l")) ++
        labels.map(l => lpDec(log(lit(1.0) /
          (col(s"_tot_$l") + col("_v")).cast("double"))).as(s"_oov_$l")): _*)
    (model, priors)
  }

  /** Scoring core shared by the batch face and the streaming face: takes
    * exploded `(keyCols..., word)` token rows, probes the model with the
    * [[TextOps.lmScore]] Zipf frequency split (head likelihood rows ride a
    * broadcast, tail tokens shuffle on the de-skewed word key; words in
    * neither take the smoothed `_oov_l` constants), sums the class
    * decimal log-likelihoods per key group, adds priors, and resolves the
    * argmax ROW-LOCALLY by a fold over the class columns in ascending
    * label order with a strictly-greater comparison — ties break (score
    * desc, label asc) with no shuffle and no nondeterminism. */
  def scoreTokens(words: DataFrame, model: DataFrame, priors: DataFrame,
      labels: Seq[String], keyCols: Seq[String]): DataFrame = {
    val lpCols = labels.map(l => s"_lp_$l")
    val head = model.orderBy(col("_cnt").desc, col("word"))
      .limit(TextOps.LmHeadK).drop("_cnt")
    val tail = model.drop("_cnt")
      .join(broadcast(head.select("word")), Seq("word"), "left_anti")

    val probed = words.join(broadcast(head), Seq("word"), "left")
    val marker = col(lpCols.head)
    val joined = probed.where(marker.isNotNull)
      .unionByName(probed.where(marker.isNull).drop(lpCols: _*)
        .join(tail, Seq("word"), "left"))

    val sums = joined.join(broadcast(priors))
      .select(keyCols.map(col) ++ labels.map(l =>
        coalesce(col(s"_lp_$l"), col(s"_oov_$l")).as(s"_lp_$l")): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_tokens"),
        labels.map(l => sum(col(s"_lp_$l")).as(s"_s_$l")): _*)
      .join(broadcast(priors))

    val scores = labels.map(l => l -> (col(s"_s_$l") + col(s"_pri_$l")))
    val (bestLbl, bestSc) = scores.tail.foldLeft(
      (lit(scores.head._1), scores.head._2)) { case ((bl, bs), (l, s)) =>
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    sums.select(keyCols.map(col) ++ Seq(bestLbl.as("pred_label"),
      col("n_tokens"), bestSc.cast("double").as("score")): _*)
  }

  // --------------------------------------------------------------------
  // L2-regularized logistic regression (IRLS) — the learned quality
  // filter tier: distill a rule funnel / expensive judgment into a
  // calibrated keep-PROBABILITY (the DCLM/fastText-classifier pipeline
  // stage; cf. Li et al. 2024 "DataComp-LM" §4.4's fastText quality
  // filter, Brown et al. 2020 §A's LR-on-features document classifier).
  // Where [[nbClassify]] is generative (token likelihoods) and
  // RegressionOps.ridge2 is a squared-loss score, this is the
  // discriminative probability model — the one that yields a threshold
  // with a calibration story (q187's reliability table).
  //
  // Fit = iteratively reweighted least squares (Newton-Raphson on the
  // penalized log-likelihood; McCullagh & Nelder 1989 §4.4): each
  // iteration is ONE corpus aggregation producing the k² upper-triangle
  // second moments Σ wᵀxxᵀ and the k gradient sums Σ x(y−p), followed by
  // a k×k driver solve (k = features+intercept, single digits — the
  // bounded-collect convention, smaller than the NB class domain).
  // Determinism: every aggregated addend runs through [[Exact.dsum]]
  // (exact decimal accumulation — order-independent across partitionings
  // and runs), the driver solve is pure arithmetic on those frozen
  // decimals, and weights round to 1e-6 after every update, so the fit
  // is REPRODUCIBLE: same data → same weights, any cluster size.
  // The ridge term (λ on non-intercept diagonals + −λβ in the gradient)
  // keeps the normal matrix nonsingular even on separable labels — and a
  // rule-derived label IS separable-ish by construction.
  //
  // Scale shape: `iters` passes over a column-pruned feature frame
  // (persisted once inside the fit, MEMORY_AND_DISK — the BpeOps
  // per-iteration lifecycle), each pass a map-side-combined hash
  // aggregate to ONE row. Apply is a pure row-local map with the weights
  // as literals — zero shuffle, whole-stage codegen.
  // --------------------------------------------------------------------

  /** Feature names of [[logisticQualityFeatures]], fit/apply/oracle-shared. */
  val QualityFeatCols: Seq[String] =
    Seq("f_logw", "f_mwl", "f_sym", "f_bullet", "f_ellipsis", "f_alpha",
      "f_stop", "f_dup", "f_digit", "f_stopx", "f_logw2", "f_dup2",
      "f_logwdup")

  /** The cheap model features over a [[TextOps.gopherQuality]] signal
    * frame (all round-6, engine-portable): log1p word count, the five
    * round-6 Gopher fractions, and the stop-word count scaled to [0,1].
    * Carries `doc_id` and the frame's `label` column through — the
    * TARGET is the caller's (q186 trains on the q60 funnel verdict,
    * whose dup-ratio/digit/PII inputs are NOT among these features, so
    * the fit is a genuine distillation rather than a separable replay
    * of its own thresholds). The frame must also carry round-6 `f_dup`
    * (repeated-word fraction), `f_digit` (digit character ratio), and
    * `f_stopx` (all-profile stopword ratio) — the strongest cheap
    * discriminators, which a real distillation would never omit;
    * [[distillFeatures]] builds them for the pass-through. */
  def logisticQualityFeatures(sig: DataFrame): DataFrame =
    sig.select(Seq(
      col("doc_id"),
      round(log(lit(1.0) + col("n_words")), 6).as("f_logw"),
      col("mean_word_len").as("f_mwl"),
      col("symbol_word_ratio").as("f_sym"),
      col("bullet_line_frac").as("f_bullet"),
      col("ellipsis_line_frac").as("f_ellipsis"),
      col("alpha_word_frac").as("f_alpha"),
      round(col("n_stop_words").cast("double") / lit(8.0), 6).as("f_stop"),
      col("f_dup"), col("f_digit"), col("f_stopx")) ++
      // label is the TRAINING face's column; the scoring ingest face has
      // no label to carry — pass through only when present
      (if (sig.columns.contains("label")) Seq(col("label")) else Nil): _*)
    // degree-2 terms on the two coupled signals (doc length and repeated-
    // word fraction correlate at ~0.94 on synthetic text, and the funnel's
    // keep region is a BAND in that latent direction — min-length cuts one
    // side, max-dup the other — which no purely linear boundary can carve;
    // the standard polynomial-features expansion gives the sigmoid exactly
    // the curvature the conjunction needs, 0.56 → 0.97 accuracy measured).
    // Squares of already-round-6 doubles re-round at 1e-6: engine-exact.
      .withColumn("f_logw2", round(col("f_logw") * col("f_logw"), 6))
      .withColumn("f_dup2", round(col("f_dup") * col("f_dup"), 6))
      .withColumn("f_logwdup", round(col("f_logw") * col("f_dup"), 6))

  /** The three extra row-local features as pass-through columns over a
    * raw `text` column (for [[TextOps.gopherQuality]]'s `extra` seq), all
    * round-6 over the UNFILTERED whitespace split (the funnel's own
    * convention): repeated-word fraction `1 − |distinct ws|/|ws|`, digit
    * character ratio, and the all-profile stopword ratio (the
    * [[TextOps.qualityComposite]]'s own first term — the corpus is
    * multilingual, so the 8 English Gopher stop words alone carry almost
    * none of the composite's signal). */
  def distillFeatures(text: Column): Seq[Column] = {
    val ws = split(text, " ")
    val allStop = TextOps.LangProfiles.flatMap(_._2).distinct
    Seq(
      round(lit(1.0) - size(array_distinct(ws)).cast("double") /
        size(ws).cast("double"), 6).as("f_dup"),
      // zero guard (gopherQuality's frac() convention): an empty text
      // divides by zero — NULL in Spark but ±inf/NaN in DuckDB's IEEE
      // mode, and a NULL feature would silently drop the row's addends
      // from only the f_digit-involving IRLS sums while the row still
      // counts in the others
      when(length(text) > 0,
        round(length(regexp_replace(text, "[^0-9]", "")).cast("double") /
          length(text).cast("double"), 6)).otherwise(0.0).as("f_digit"),
      round(size(filter(ws, w => w.isInCollection(allStop))).cast("double") /
        size(ws).cast("double"), 6).as("f_stopx"))
  }

  /** Left-associated linear predictor `w0 + Σ wᵢ·round(xᵢ,6)` — the SAME
    * association order the oracle SQL's `+` chain parses to, so both
    * engines compute a bit-identical double before the sigmoid. */
  private def linPred(weights: Seq[Double], featCols: Seq[String]): Column =
    featCols.zip(weights.tail).foldLeft(lit(weights.head): Column) {
      case (acc, (c, w)) => acc + lit(w) * round(col(c), 6)
    }

  private def sigmoid(z: Column): Column =
    lit(1.0) / (lit(1.0) + exp(negate(z)))

  /** Driver-side HALF_UP round-6 — the Column `round(_, 6)` twin, so
    * weights frozen on the driver match what the engines would emit. */
  private def r6(x: Double): Double =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Solve `A δ = g` (k×k, symmetric positive-definite for λ > 0) by
    * Gaussian elimination with partial pivoting — deterministic pure
    * arithmetic on the collected decimal sums. Returns the zero vector
    * when a pivot degenerates (empty input): the update is skipped
    * rather than minting NaN weights. */
  private def solve(a: Array[Array[Double]], g: Array[Double])
      : Array[Double] = {
    val k = g.length
    val m = Array.tabulate(k, k + 1)((i, j) => if (j < k) a(i)(j) else g(i))
    for (c <- 0 until k) {
      val piv = (c until k).maxBy(r => math.abs(m(r)(c)))
      if (math.abs(m(piv)(c)) < 1e-12) return Array.fill(k)(0.0)
      val t = m(c); m(c) = m(piv); m(piv) = t
      for (r <- c + 1 until k) {
        val f = m(r)(c) / m(c)(c)
        for (j <- c to k) m(r)(j) -= f * m(c)(j)
      }
    }
    val x = Array.fill(k)(0.0)
    for (i <- (k - 1) to 0 by -1) {
      var s = m(i)(k)
      for (j <- i + 1 until k) s -= m(i)(j) * x(j)
      x(i) = s / m(i)(i)
    }
    x
  }

  /** IRLS fit of `P(label) = σ(w0 + Σ wᵢxᵢ)` over a frame exposing
    * round-6 double feature columns and a boolean label. Returns the
    * k+1 round-6 weights (intercept first) — frozen bytes for the
    * apply face and its oracle (the q48/q134 frozen-model pattern).
    * λ penalizes non-intercept weights (the standard convention). */
  def logisticFit(feats: DataFrame, featCols: Seq[String], label: Column,
      lambda: Double = 0.01, iters: Int = 8): Seq[Double] = {
    val k = featCols.length + 1
    // 8 IRLS sweeps re-aggregate this frame; spread a tiny
    // single-split scan before persisting (no-op at scale)
    val f = Fanout.spread(feats.select(label.cast("double").as("_y") +:
        featCols.map(c => round(col(c), 6).cast("double").as(c)): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var beta = Seq.fill(k)(0.0)
      for (_ <- 1 to iters) {
        val p = sigmoid(linPred(beta, featCols))
        val wgt = p * (lit(1.0) - p)
        val resid = col("_y") - p
        val xs: Seq[Column] = lit(1.0) +: featCols.map(col)
        val aggs =
          (for { i <- 0 until k; j <- i until k }
            yield Exact.dsum(xs(i) * xs(j) * wgt).as(s"_a_${i}_$j")) ++
          (0 until k).map(i => Exact.dsum(xs(i) * resid).as(s"_g_$i"))
        val row = f.agg(aggs.head, aggs.tail: _*).collect()(0)
        // empty input: decimal sums come back NULL — read as 0, which
        // makes the normal matrix singular and the solve guard a no-op
        def cell(i: Int): Double = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
        val a = Array.ofDim[Double](k, k)
        var ix = 0
        for { i <- 0 until k; j <- i until k } {
          a(i)(j) = cell(ix); a(j)(i) = a(i)(j); ix += 1
        }
        val g = Array.tabulate(k)(i => cell(ix + i))
        for (i <- 1 until k) { // intercept unpenalized
          a(i)(i) += lambda
          g(i) -= lambda * beta(i)
        }
        val delta = solve(a, g)
        beta = beta.zip(delta).map { case (b, d) => r6(b + d) }
      }
      beta
    } finally f.unpersist()
  }

  /** Score a feature frame under FROZEN weights: appends
    * `p_keep = round6(σ(w·x))` and `pred_keep = p_keep ≥ 0.5` — a pure
    * row-local map (weights are literals; zero shuffle, codegen'd). */
  def logisticScore(feats: DataFrame, featCols: Seq[String],
      weights: Seq[Double]): DataFrame = {
    require(weights.length == featCols.length + 1,
      s"need ${featCols.length + 1} weights, got ${weights.length}")
    feats
      .withColumn("p_keep",
        Exact.round6z(sigmoid(linPred(weights, featCols))))
      .withColumn("pred_keep", col("p_keep") >= 0.5)
  }

  /** Calibration (reliability) table of a round-6 probability against a
    * boolean outcome: per decile bucket `floor(10·p)` (p = 1 folds into
    * bucket 9 — ten buckets, closed top), the row count, observed
    * positive count/fraction, and the mean predicted probability. A
    * well-calibrated filter shows `pos_frac ≈ mean_p` per bucket — the
    * acceptance check before anyone trusts a learned keep-threshold.
    * ONE corpus aggregation to a ≤10-row frame; mean_p is an exact
    * decimal sum over round-6 inputs divided by the count, so the
    * oracle replays bit-identically. */
  def calibrationTable(scored: DataFrame, p: Column, label: Column)
      : DataFrame =
    scored
      .select(least(floor(p * 10).cast("long"), lit(9L)).as("bucket"),
        p.as("_p"), label.cast("boolean").as("_y"))
      .where(col("bucket").isNotNull && col("_y").isNotNull)
      .groupBy("bucket").agg(
        count(lit(1)).as("n"),
        Exact.countIf(col("_y")).as("n_pos"),
        Exact.round6z(Exact.countIf(col("_y")).cast("double") /
          count(lit(1)).cast("double")).as("pos_frac"),
        Exact.round6z(Exact.dsum(col("_p")) /
          count(lit(1)).cast("double")).as("mean_p"))

  /** Score `apply` documents under a model fitted on `train` (pass the
    * same frame for self-classification): per document the true label (if
    * `applyLabel` is given), the argmax class under
    * `prior_l + Σ_tokens lp_l(word)` with unseen words taking the smoothed
    * zero-count likelihood, the token count, and the winning score. */
  def nbClassify(train: DataFrame, trainText: Column, trainLabel: Column,
      apply: DataFrame, id: Column, text: Column,
      applyLabel: Option[Column] = None): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val labels = train.select(trainLabel.cast("string")).distinct()
      .as[String].collect().sorted.toSeq // bounded: the class domain
    val (model, pri) = nbFit(train, trainText, trainLabel, labels)
    val base = Seq(id.as("doc_id")) ++ applyLabel.map(_.as("label"))
    val words = apply.select(base :+ explode(split(text, " ")).as("word"): _*)
    scoreTokens(words, model, pri, labels,
      Seq("doc_id") ++ applyLabel.map(_ => "label"))
  }
}
