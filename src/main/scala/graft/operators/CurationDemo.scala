package graft.operators

import org.apache.spark.sql.functions._

/** End-to-end training-data curation run over the test corpus — the
  * composition a 100 TB pipeline actually executes, stage by stage, with
  * survivor counts printed at each step:
  *
  *   1. quality funnel (length / repetition / quality / PII rules)
  *   2. line-level boilerplate audit (lines shared by ≥ maxDf docs)
  *   3. near-dup dedup, keeping the highest-quality cluster member
  *   4. train/test contamination screen over the hash split
  *   5. source mixing to target weights (integer thresholds)
  *   6. sequence packing into fixed token-budget chunks
  *
  * Every stage is the same operator the oracle-backed queries gate; the
  * demo only wires them together. Run:
  * `sbt "runMain graft.operators.CurationDemo [sfDir]"`. */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, sfDir)
    val n0 = docs.count()
    println(s"[curate] corpus: $n0 docs")

    // 1. quality funnel — one pass, cumulative survivor counts
    TextOps.filterFunnel(docs, col("doc_id"), col("text")).show(truncate = false)
    val clean = docs.where(TextOps.funnelPredicates(col("text"))
      .map(_._2).reduce(_ && _))
    val n1 = clean.count()
    println(s"[curate] after funnel: $n1 (${n0 - n1} dropped)")

    // 2. line-level boilerplate audit (drop-set from THIS corpus)
    val lineStats = TextOps.lineDedup(clean, col("doc_id"), col("text"), 3)
    val boiler = lineStats.where(col("n_kept") < col("n_lines")).count()
    println(s"[curate] docs containing boilerplate lines: $boiler")

    // 3. near-dup clusters -> keep the best-quality member of each
    val clusters = DedupOps.dedupClusters(
      DedupOps.lshCandidatePairs(
        DedupOps.minhashSignatures(clean, col("doc_id"), col("text"), 2)),
      "doc_a", "doc_b")
    val quality = TextOps.qualityScore(clean, col("doc_id"), col("text"))
    val best = DedupOps.keepBestInCluster(
      quality, col("doc_id"), col("quality_score"), clusters)
    val dropDup = clusters.join(best, "cluster_id")
      .where(col("doc_id") =!= col("keep_id")).select("doc_id")
    val deduped = clean.join(dropDup, Seq("doc_id"), "left_anti")
    val n3 = deduped.count()
    println(s"[curate] after near-dup keep-best: $n3 (${n1 - n3} dropped)")

    // 4. contamination screen: test-split docs vs the train shingle set
    val contaminated = TextOps.contamination(
        deduped, col("doc_id"), col("text"), 2)
      .where(col("contamination") >= 0.5)
    println(s"[curate] contaminated test-split docs flagged: ${contaminated.count()}")

    // 5. mix to target source weights at a fixed token budget
    val weights = deduped.select("source").distinct().collect()
      .map(_.getString(0) -> 1L).toMap
    val budget = 20000L
    TextOps.corpusMix(deduped, col("doc_id"), col("text"), col("source"),
      weights, budget).orderBy("source").show(5, truncate = false)
    val thr = TextOps.mixThresholds(deduped, col("doc_id"), col("text"),
      col("source"), weights, budget)
    val mixed = deduped
      .withColumn("_bkt", graft.functions.TextHash.sampleBucket(
        graft.functions.HashExpressions.polyHash(col("text")), 1000000))
      .join(thr, "source").where(col("_bkt") < col("_thr"))
      .drop("_bkt", "_thr")
    val n5 = mixed.count()
    println(s"[curate] after mixing to budget $budget: $n5")

    // 6. pack into fixed token-budget training chunks
    val packed = TextOps.packSequences(mixed, col("doc_id"), col("text"), 512L)
    println(s"[curate] packed $n5 docs into ${packed.count()} chunks " +
      "of <= 512 tokens")
    packed.orderBy("chunk_id").show(5, truncate = false)

    spark.stop()
  }
}
