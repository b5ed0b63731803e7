package graft

import graft.operators.CurationDemo
import graft.operators.CurationDemo.StageCounts

/** Regression gate for the END-TO-END curation composition: every stage is
  * individually oracle- or spec-gated, but only this pin catches a broken
  * wire BETWEEN stages (a column rename between funnel and dedup, a join
  * key drift between decontamination and mix) — those pass every
  * per-operator test while silently changing what the pipeline drops.
  *
  * The golden values are the full stage-count vector at sf0.001; every
  * stage is content-hash deterministic (no RNG, no time), so the vector
  * is stable across runs, partitionings, and JVMs. When an INTENTIONAL
  * semantics change shifts a count, re-run
  * `sbt "runMain graft.operators.CurationDemo"` and update the pin in the
  * same commit. */
class CurationDemoSpec extends SparkSpec {

  test("curation pipeline stage counts at sf0.001 match the golden vector") {
    val got = CurationDemo.run(spark, sf)
    val want = StageCounts(
      corpus = 500L,
      afterFunnel = 209L,
      afterGopher = 208L,  // the q126 repetition thresholds really fire:
                           // one funnel survivor is top-2-gram heavy
      gopherQualityFailDocs = 209L, // every doc fails the stop-word gate
                                    // (synthetic vocabulary holds ≤ 1 of
                                    // the canonical eight) — audited,
                                    // not dropped
      langDisagreeDocs = 101L, // NB self-fit disagrees on ~48% of the
                               // random-word synthetic text — audited,
                               // not dropped (weak lang signal is a
                               // corpus property, not a pipeline bug)
      boilerplateDocs = 0L, // sf corpus has no newlines; lineDedup is
                            // natively gated by LineDedupSpec's fixture
      spanDocsHit = 146L,
      spanTokensRemovable = 1615L,
      despanModifiedDocs = 58L, // 3-grams shared by >= 4 docs at sf0.001
      afterDespan = 208L,       // rewrites, never drops, at this scale
      afterKeepBest = 198L,
      afterSemantic = 195L,
      imageDupDocs = 0L,  // planted variants are same-doc by construction;
      audioDupDocs = 0L,  // a cross-doc drop here means two DOCS render
      videoDupDocs = 0L,  // near-identical media — none in the sf corpus
      afterMedia = 195L,
      afterDecontamination = 29L,
      semContaminated = 1L,  // one survivor sits within cosine 0.4 of
      afterSemDecon = 28L,   // the vec_id<25 benchmark — the paraphrase
                             // leakage exact n-grams missed
      dsirPositive = 9L,     // 9 of 28 survivors lean toward the
                             // English-target unigram distribution
                             // (DSIR audit — reported, not dropped)
      afterPerplexity = 20L, // the worst KN-cross-entropy decile per
                             // source drops (8 of 28) — the band-pass
                             // stage q138∘q115 realize
      afterMix = 20L,
      nChunks = 3L,
      nShards = 7L,          // 20 docs hash across 7 of 8 shard labels
      auditRemoved = 480L,       // 500 - 20: everything else untouched
      auditRewritten = 2L,       // final docs carrying despanned text
      auditMutatedOrAdded = 0L,  // drop-or-despan contract: no mutation
                                 // beyond the post-despan snapshot
      nFiles = 8L,               // compactedWrite hit its file target
      layoutOverlaps = 0L)       // per-file shard ranges disjoint: a
                                 // one-shard read opens one file
    assert(got == want,
      s"stage-count vector drifted:\n  got  $got\n  want $want")
  }
}
