package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data curation run over the test corpus — the
  * composition a 100 TB pipeline actually executes, stage by stage, with
  * survivor counts printed at each step:
  *
  *   1. quality funnel (length / repetition / quality / PII rules)
  *   2. line-level boilerplate audit (lines shared by ≥ maxDf docs)
  *   3. repeated-span audit (≥5-token passages whose 3-grams all repeat)
  *   4. near-dup dedup, keeping the highest-quality cluster member
  *   5. SEMANTIC dedup over the doc embeddings (SemDeDup cells: coarse
  *      quantize → within-cell cosine, the q69 batch face; the same
  *      keep-set schema has incremental/streaming faces for ingest)
  *   6. media near-dup over the docs' image/audio/video attachments
  *      (codec decode → perceptual fingerprint → banded pairs, the
  *      q86/q87/q89 pipeline; cross-doc matches drop the larger doc,
  *      undecodable payloads are flagged and never pair)
  *   7. decontamination: DROP train-split docs overlapping the test split
  *   7b. DSIR targeting audit: survivors leaning toward the target
  *      domain's unigram distribution ([[RetrievalOps.dsirWeights]];
  *      audit-only — threshold selection is per-source policy)
  *   7c. KN-perplexity band-pass: word-order-aware cross-entropy under
  *      the survivors' own bigram model ([[TextOps.knScore]]),
  *      calibrated per source ([[TextOps.calibrateScores]]); the worst
  *      decile per source DROPS
  *   8. source mixing to target weights (integer thresholds)
  *   9. sequence packing into fixed token-budget chunks
  *  10. deterministic shuffle-and-shard of the final order
  *  11. snapshot audit of final-vs-raw: curation may only DROP or
  *      despan-REWRITE (stage 4b) — every final row must be identical
  *      to the post-despan snapshot, and the rewrite volume is reported
  *      against raw; anything else is a stage mutating or inventing
  *      content, caught row-exactly ([[AuditOps]])
  *  12. layout-aware final WRITE: the sharded corpus lands as one
  *      compacted, (shard, pos)-clustered parquet layout
  *      ([[LayoutOps.compactedWrite]]) and [[LayoutOps.fileLayoutAudit]]
  *      verifies what a trainer's reader relies on — file count at
  *      target and per-file shard ranges disjoint, so "read shard 3"
  *      opens one file, not all of them
  *
  * Every stage is the same operator the oracle-backed queries gate; the
  * demo only wires them together — and the wiring itself is regression-
  * gated: [[run]] returns the per-stage survivor counts, and
  * CurationDemoSpec pins them as golden values at sf0.001, so a stage
  * that silently stops dropping (or starts dropping everything) after a
  * refactor fails CI even when every per-operator test still passes.
  * Run: `sbt "runMain graft.operators.CurationDemo [sfDir]"`. */
object CurationDemo {

  /** Stage-by-stage survivor counts of the curation composition. */
  final case class StageCounts(
      corpus: Long, afterFunnel: Long, afterGopher: Long,
      gopherQualityFailDocs: Long, langDisagreeDocs: Long,
      boilerplateDocs: Long,
      spanDocsHit: Long, spanTokensRemovable: Long,
      despanModifiedDocs: Long, afterDespan: Long, afterKeepBest: Long,
      afterSemantic: Long, imageDupDocs: Long, audioDupDocs: Long,
      videoDupDocs: Long, afterMedia: Long, afterDecontamination: Long,
      semContaminated: Long, afterSemDecon: Long, dsirPositive: Long,
      afterPerplexity: Long,
      afterMix: Long, nChunks: Long, nShards: Long,
      auditRemoved: Long, auditRewritten: Long, auditMutatedOrAdded: Long,
      nFiles: Long, layoutOverlaps: Long)

  /** The full eighteen-stage composition; `verbose` adds the per-stage
    * prints/shows the CLI demo displays. The final corpus is written
    * under `outDir` (a fresh temp directory when None — the demo's
    * artifact is the stage-count vector, not the files). */
  def run(spark: SparkSession, sfDir: String,
      verbose: Boolean = false, outDir: Option[String] = None): StageCounts = {
    def say(s: => String): Unit = if (verbose) println(s)

    // ONE fan-out at the funnel's entry: every settle() checkpoint
    // below preserves the partitioning, so all 18 per-doc stages
    // inherit it (no-op at scale — Fanout contract)
    val docs = Fanout.spread(graft.Tables.documents(spark, sfDir))
    val n0 = docs.count()
    say(s"[curate] corpus: $n0 docs")

    // 1. quality funnel — one pass, cumulative survivor counts
    if (verbose)
      TextOps.filterFunnel(docs, col("doc_id"), col("text")).show(truncate = false)
    // Stage-boundary lineage truncation (the q51/q107 checkpoint rule —
    // a staged pipeline materializes between stages): each surviving
    // frame is corpus-row-sized, but without truncation every downstream
    // action re-analyzes the ENTIRE upstream plan tree, and with 14
    // stages Catalyst analysis alone dominates the demo (measured: the
    // spec spun >15 min inside TreeNode.collectFirst before this).
    def settle(df: org.apache.spark.sql.DataFrame) = df.localCheckpoint(true)
    val clean = settle(docs.where(TextOps.funnelPredicates(col("text"))
      .map(_._2).reduce(_ && _)))
    val n1 = clean.count()
    say(s"[curate] after funnel: $n1 (${n0 - n1} dropped)")

    // 2. Gopher screens (q126/q129): the repetition rules DROP — the
    // published thresholds really fire on this corpus — while the
    // structural-quality rules stay an AUDIT (the synthetic vocabulary
    // holds ≤ 1 of the canonical stop words, so every doc fails that
    // gate — a corpus property, not a pipeline signal; a real pipeline
    // drops on both).
    val rep = TextOps.gopherRepetition(clean, col("doc_id"), col("text"))
    val dropRep = rep.where(!col("keep")).select("doc_id")
    val screened = settle(clean.join(dropRep, Seq("doc_id"), "left_anti"))
    val n1b = screened.count()
    val gopherQualFail = TextOps.gopherQuality(clean, col("doc_id"),
      col("text")).where(!col("keep")).count()
    say(s"[curate] after Gopher repetition screen: $n1b " +
      s"(${n1 - n1b} dropped); $gopherQualFail fail the quality rules " +
      "(audited — the synthetic corpus cannot pass the stop-word gate)")

    // 3. learned-classifier language audit: self-fit Naive Bayes on the
    // corpus's own lang labels (the q110 model) and count docs whose
    // PREDICTED language disagrees with their label — the CCNet
    // langid-confidence signal, surfaced as an audit (the stage-2/3
    // convention: the synthetic corpus's random-word text carries weak
    // language signal, so hard-dropping on it would gut the demo; a real
    // pipeline thresholds this disagreement rate per source).
    val langPred = ClassifyOps.nbClassify(screened, col("text"), col("lang"),
      screened, col("doc_id"), col("text"), Some(col("lang")))
    val langDisagree = langPred
      .where(col("label") =!= col("pred_label")).count()
    val gated = screened
    val n1c = n1b
    say(s"[curate] language audit: $langDisagree of $n1 docs predicted " +
      "off-label")

    // 3. line-level boilerplate audit (drop-set from THIS corpus)
    val lineStats = TextOps.lineDedup(gated, col("doc_id"), col("text"), 3)
    val boiler = lineStats.where(col("n_kept") < col("n_lines")).count()
    say(s"[curate] docs containing boilerplate lines: $boiler")

    // 4. repeated-span audit: passages doc-level dedup would keep
    val spans = TextOps.removeRepeatedSpans(gated, col("doc_id"), col("text"), 3, 5)
    val spanStats = spans.agg(
      sum(when(col("n_spans") > 0, 1L).otherwise(0L)).as("docs_hit"),
      sum("n_removed").as("tokens_removed")).head()
    say(s"[curate] repeated spans: ${spanStats.getLong(0)} docs affected, " +
      s"${spanStats.getLong(1)} tokens removable")

    // 4b. cross-document verbatim-span REWRITE (the q152 stage, mirrored
    // in q117): 3-grams recurring in >= 4 docs lose every non-canonical
    // copy; docs scrubbed empty drop out, and every later stage sees the
    // despanned text — syndicated passages stop feeding the minhash,
    // KN-model, and packing stages
    val dsp0 = SpanDedupOps.crossDocDedup(
      gated, col("doc_id"), col("text"), 3, 4)
    val despanModified = dsp0.where(col("n_dropped") > 0).count()
    val despanned = settle(gated.drop("text")
      .join(dsp0.where(col("text_clean") =!= "")
        .select(col("did").as("doc_id"), col("text_clean").as("text")),
        "doc_id"))
    val nDsp = despanned.count()
    say(s"[curate] after cross-doc despan: $nDsp docs " +
      s"($despanModified rewritten, ${n1c - nDsp} scrubbed empty)")

    // 5. near-dup clusters -> keep the best-quality member of each
    val clusters = DedupOps.dedupClusters(
      DedupOps.lshCandidatePairs(
        DedupOps.minhashSignatures(despanned, col("doc_id"), col("text"), 2)),
      "doc_a", "doc_b")
    val quality = TextOps.qualityScore(despanned, col("doc_id"), col("text"))
    val best = DedupOps.keepBestInCluster(
      quality, col("doc_id"), col("quality_score"), clusters)
    val dropDup = clusters.join(best, "cluster_id")
      .where(col("doc_id") =!= col("keep_id")).select("doc_id")
    val deduped = settle(despanned.join(dropDup, Seq("doc_id"), "left_anti"))
    val n3 = deduped.count()
    say(s"[curate] after near-dup keep-best: $n3 (${nDsp - n3} dropped)")

    // 6. semantic dedup on the doc embeddings: coarse-quantize into
    // SemDeDup cells, within-cell cosine, drop the dominated member.
    // Centroids are a fixed deterministic sample of the FULL table (cell
    // geometry is corpus-global — an already-filtered subset would move
    // the cells whenever an upstream stage changes its drops).
    val embAll = graft.Tables.embeddings(spark, sfDir)
    val emb = embAll.join(deduped.select(col("doc_id").as("vec_id")), "vec_id")
    val semKeep = SimilarityOps.semanticDedup(
      emb, embAll.where(col("vec_id") < 8), col("vec_id"), col("embedding"),
      threshold = 0.4)
    val semDrop = semKeep.where(!col("kept"))
      .select(col("vec_id").as("doc_id"))
    val semDeduped = settle(deduped.join(semDrop, Seq("doc_id"), "left_anti"))
    val n3s = semDeduped.count()
    say(s"[curate] after semantic dedup: $n3s (${n3 - n3s} dropped)")

    // 7. media near-dup over the docs' image/audio/video attachments (the
    // documents table carries none, so the demo synthesizes REAL
    // PNG/WAV/Y4M payloads from the text — the q86/q87/q89 bridge):
    // decode → perceptual
    // fingerprint → banded pairs; a cross-doc match means two DOCS render
    // near-identical media, and the larger doc_id drops. Planted same-doc
    // variants pair with their own doc (no drop), and planted broken
    // payloads flag `ok = false` and never reach the pair join.
    implicit val sp: SparkSession = spark
    def docOf(c: org.apache.spark.sql.Column) =
      when(c >= MultimodalOps.VariantIdOffset,
        c - MultimodalOps.VariantIdOffset).otherwise(c)
    def crossDocDrops(pairs: org.apache.spark.sql.DataFrame) = pairs
      .select(docOf(col("media_a")).as("da"), docOf(col("media_b")).as("db"))
      .where(col("da") =!= col("db"))
      .select(greatest(col("da"), col("db")).as("doc_id")).distinct()
    val imgDrops = crossDocDrops(MultimodalOps.imageNearDupPairs(
      MultimodalOps.imageDHash(MultimodalOps.syntheticImageCorpus(
        semDeduped, col("doc_id"), col("text"))).toDF()))
    val audDrops = crossDocDrops(MultimodalOps.audioNearDupPairs(
      MultimodalOps.audioEnvHash(MultimodalOps.syntheticAudioCorpus(
        semDeduped, col("doc_id"), col("text"))).toDF()))
    val vidDrops = crossDocDrops(MultimodalOps.videoNearDupPairs(
      MultimodalOps.videoFrameHashes(MultimodalOps.syntheticVideoCorpus(
        semDeduped, col("doc_id"), col("text"))).toDF()))
    val nImg = imgDrops.count()
    val nAud = audDrops.count()
    val nVid = vidDrops.count()
    val mediaDeduped = settle(semDeduped
      .join(imgDrops.union(audDrops).union(vidDrops).distinct(),
        Seq("doc_id"), "left_anti"))
    val n3m = mediaDeduped.count()
    say(s"[curate] after media near-dup: $n3m " +
      s"($nImg image-dup docs, $nAud audio-dup docs, $nVid video-dup docs)")

    // 8. exact decontamination: drop train-split docs overlapping the test split
    val leaky = TextOps.decontaminate(mediaDeduped, col("doc_id"), col("text"), 2,
      minOverlap = 2, estimatedTestShingles = 1L << 16)
    val decon = settle(mediaDeduped.join(leaky.select("doc_id"),
      Seq("doc_id"), "left_anti"))
    val n4 = decon.count()
    say(s"[curate] after decontamination: $n4 (${n3m - n4} train docs dropped)")

    // 9. semantic decontamination: what exact n-gram matching cannot see
    // — surviving docs whose EMBEDDING sits within cosine 0.4 of the
    // held-out benchmark (vec_ids < 25 play the eval set, the q113
    // convention; only ids outside it are screened). Paraphrased leakage
    // drops here.
    val evalEmb = embAll.where(col("vec_id") < 25)
    val semCon = SimilarityOps.semanticContamination(
      embAll.join(decon.select(col("doc_id").as("vec_id")), "vec_id")
        .where(col("vec_id") >= 25),
      evalEmb, col("vec_id"), col("embedding"), 0.4, 4, 4)
    val nSemCon = semCon.count()
    val decon2 = settle(decon.join(semCon.select(col("vec_id").as("doc_id")),
      Seq("doc_id"), "left_anti"))
    val n4b = decon2.count()
    say(s"[curate] after semantic decontamination: $n4b " +
      s"($nSemCon docs within cosine 0.4 of the benchmark)")

    // 9b. DSIR targeting audit: how much of the surviving corpus looks
    // like the target domain (the English slice plays the target)? An
    // AUDIT, not a drop (the lang-audit convention): selection to a
    // weight threshold is a policy decision the per-source pipelines
    // make with calibrateScores; the demo surfaces the signal — docs
    // whose tokens are MORE likely under the target LM than the corpus
    // LM (avg_log_weight > 0).
    val dsirPositive = RetrievalOps.dsirWeights(
      decon2, col("doc_id"), col("text"),
      decon2.where(col("lang") === "en"), col("text"))
      .where(col("avg_log_weight") > 0).count()
    say(s"[curate] DSIR targeting audit: $dsirPositive of $n4b survivors " +
      "lean toward the English target distribution")

    // 9c. KN-perplexity band-pass (q138 ∘ q115): word-order-aware
    // cross-entropy under the SURVIVORS' own bigram model — shuffled
    // boilerplate a unigram score cannot see surfaces here — calibrated
    // per source (percent-rank) so one threshold transfers across
    // languages; the worst decile per source drops.
    val knCe = TextOps.knScore(decon2, col("doc_id"), col("text"))
    val knCal = TextOps.calibrateScores(
      knCe.join(decon2.select("doc_id", "source"), "doc_id"),
      col("doc_id"), col("cross_entropy"), col("source"), "source",
      10, 0.9)
    val lmKept = settle(decon2.join(
      knCal.where(col("keep")).select("doc_id"), Seq("doc_id"),
      "left_semi"))
    val n4c = lmKept.count()
    say(s"[curate] after KN-perplexity band-pass: $n4c " +
      s"(${n4b - n4c} worst-decile-per-source docs dropped)")

    // 10. mix to target source weights at a fixed token budget
    val weights = lmKept.select("source").distinct().collect()
      .map(_.getString(0) -> 1L).toMap
    val budget = 20000L
    if (verbose)
      TextOps.corpusMix(lmKept, col("doc_id"), col("text"), col("source"),
        weights, budget).orderBy("source").show(5, truncate = false)
    val thr = TextOps.mixThresholds(lmKept, col("doc_id"), col("text"),
      col("source"), weights, budget)
    val mixed = lmKept
      .withColumn("_bkt", graft.functions.TextHash.sampleBucket(
        graft.functions.HashExpressions.polyHash(col("text")), 1000000))
      .join(thr, "source").where(col("_bkt") < col("_thr"))
      .drop("_bkt", "_thr")
      .localCheckpoint(true)
    val n5 = mixed.count()
    say(s"[curate] after mixing to budget $budget: $n5")

    // 11. pack into fixed token-budget training chunks
    val packed = TextOps.packSequences(mixed, col("doc_id"), col("text"), 512L)
    val nChunks = packed.count()
    say(s"[curate] packed $n5 docs into $nChunks chunks of <= 512 tokens")
    if (verbose) packed.orderBy("chunk_id").show(5, truncate = false)

    // 12. deterministic shuffle-and-shard: the order a training run reads
    val sharded = TextOps.shuffleShards(mixed, col("doc_id"), col("text"), 8)
    if (verbose)
      sharded.groupBy("shard").agg(count(lit(1)).as("n_docs"))
        .orderBy("shard").show(8, truncate = false)
    val nShards = sharded.select("shard").distinct().count()
    say(s"[curate] final corpus sharded $nShards ways, reproducibly")

    // 13. snapshot audit: final corpus vs the raw snapshot. Since 4b the
    // contract is DROP-OR-DESPAN: the ONLY permitted mutation is the
    // cross-doc span rewrite, so every final row must be byte-identical
    // to the POST-DESPAN snapshot (mutations beyond that = a stage
    // corrupting or inventing rows), while the rewrite volume itself is
    // reported against the raw snapshot as auditRewritten.
    val audit = AuditOps.snapshotDiffSummary(AuditOps.snapshotDiff(
      despanned.select(col("doc_id"), col("text"), col("source")),
      mixed, col("doc_id"), Seq(col("text"), col("source")),
      keyName = "doc_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rawAudit = AuditOps.snapshotDiffSummary(AuditOps.snapshotDiff(
      docs, mixed, col("doc_id"), Seq(col("text"), col("source")),
      keyName = "doc_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nRemoved = rawAudit.getOrElse("removed", 0L)
    val nRewritten = rawAudit.getOrElse("changed", 0L)
    val nBad = audit.getOrElse("added", 0L) + audit.getOrElse("changed", 0L)
    say(s"[curate] audit: $nRemoved dropped vs raw, $nRewritten despan-" +
      s"rewritten, $nBad mutations NOT explained by the despan stage")

    // 14. layout-aware final write: the corpus a trainer actually reads —
    // doc content re-attached to its (shard, pos) order, compacted into
    // nShards files range-clustered on (shard, pos). compactedWrite's
    // disjoint-leading-key contract means each file covers a contiguous
    // shard range, so a reader of one shard opens ~1 file; the audit
    // verifies that from the written footers (running-max interval scan:
    // a file whose shard_min sits strictly inside any earlier file's
    // range is an overlap — 0 expected).
    val outPath = outDir.getOrElse(java.nio.file.Files
      .createTempDirectory("graft-curate-").toString) + "/corpus"
    LayoutOps.compactedWrite(
      sharded.join(mixed.select(col("doc_id"), col("text"), col("source")),
        "doc_id"),
      outPath, numFiles = 8, sortCols = Seq("shard", "pos"))
    val layout = LayoutOps.fileLayoutAudit(spark, outPath, Seq("shard"))
      .select(col("file"), col("n_rows"), col("shard_min"), col("shard_max"))
      .collect().sortBy(r => (r.getLong(2), r.getString(0)))
    val nFiles = layout.length.toLong
    val overlaps = layout.foldLeft((Long.MinValue, 0L)) {
      case ((runMax, bad), r) =>
        (math.max(runMax, r.getLong(3)),
          if (r.getLong(2) < runMax) bad + 1 else bad)
    }._2
    say(s"[curate] wrote $outPath: $nFiles files, " +
      s"$overlaps shard-range overlaps (0 = exact file skipping per shard)")

    StageCounts(n0, n1, n1b, gopherQualFail, langDisagree, boiler,
      spanStats.getLong(0),
      spanStats.getLong(1), despanModified, nDsp, n3, n3s, nImg, nAud,
      nVid, n3m, n4,
      nSemCon, n4b, dsirPositive, n4c, n5, nChunks, nShards,
      nRemoved, nRewritten, nBad, nFiles, overlaps)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sfDir, verbose = true)
    spark.stop()
  }
}
