package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Winnowing document fingerprints — Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD
  * 2003; the MOSS algorithm). From each window of `w` consecutive k-gram
  * hashes, select the minimum (rightmost on ties); the distinct selected
  * hashes are the document's fingerprint set. The selection is LOCAL —
  * whether a hash is picked depends only on its w-neighborhood — so any
  * shared substring of ≥ w + k − 1 words is guaranteed to share at least
  * one fingerprint, while storage drops to ~2/(w+1) of the gram count.
  * Unlike minhash (a global random sample, Jaccard-calibrated), winnowing
  * is position-robust: it finds PARTIAL overlap (one shared paragraph in
  * an otherwise different doc) that whole-doc signatures dilute away.
  *
  * Shape: one per-doc ordered window over the gram table (partitioned by
  * doc — never global), then a distinct. Pair generation joins fingerprint
  * sets on hash with a document-frequency cap (drop-and-flag, the
  * repo-standard hot-bucket guard), so no bucket degenerates at corpus
  * scale.
  */
object WinnowOps {

  /** Encoding base for the rightmost-min tiebreak: key = h·C + (C − pos)
    * makes lexicographic (h asc, pos desc) ordering a single Long min.
    * Caps supported doc length at C−1 words — raise for a corpus of
    * longer docs (h < 2^31 leaves 32 bits of headroom). */
  val PosBase: Long = 1L << 20

  /** Winnowed fingerprints `(did, pos, h)`: the k-gram hash selected from
    * each w-window (rightmost minimum), deduplicated. Docs with fewer
    * than `w` grams yield the single minimum over what they have (the
    * standard short-doc convention), so every non-empty doc carries at
    * least one fingerprint. */
  def fingerprints(docs: DataFrame, id: Column, text: Column,
      k: Int = 3, w: Int = 4): DataFrame = {
    val grams = SpanDedupOps.gramTable(docs, id, text, k)
    val byDoc = Window.partitionBy(col("did"))
    val win = byDoc.orderBy(col("pos")).rowsBetween(0, w - 1)
    val key = col("h") * lit(PosBase) + (lit(PosBase) - col("pos"))
    val selected = grams
      .withColumn("m", count(lit(1)).over(byDoc))
      .withColumn("sel", min(key).over(win))
      // full windows only, except the single window of a short doc
      .where(col("pos") <= greatest(col("m") - lit(w - 1), lit(1)))
      .select(col("did"),
        (lit(PosBase) - pmod(col("sel"), lit(PosBase))).cast("int")
          .as("pos"),
        expr(s"CAST(sel DIV $PosBase AS BIGINT)").as("h"))
    selected.distinct()
  }

  /** Near-duplicate / partial-overlap candidates from shared winnowed
    * fingerprints: for each doc pair sharing ≥ 1 fingerprint hash (after
    * dropping hashes in more than `maxDf` docs — boilerplate grams),
    * the count of shared hashes and the fingerprint-set Jaccard.
    * Returns pairs with `jaccard ≥ minJaccard`, `did_a < did_b`. */
  def fingerprintPairs(docs: DataFrame, id: Column, text: Column,
      k: Int = 3, w: Int = 4, maxDf: Int = 64,
      minJaccard: Double = 0.5): DataFrame =
    fingerprintPairsFrom(fingerprints(docs, id, text, k, w),
      maxDf, minJaccard)

  /** Incremental maintenance of a frozen [[fingerprints]] index — the
    * refresh face for [[graft.streaming.Streaming.winnowScreenStream]]'s
    * static side: winnowing selects fingerprints PER DOC (each doc's
    * windows see only its own grams), so a disjoint delta's fingerprints
    * are exactly the union — no merge arithmetic at all, and the
    * df/maxDf boilerplate cap stays a probe-time aggregate over the
    * maintained index. Same NEW-ids precondition as
    * [[graft.operators.SpanDedupOps.gramIndexUpdate]]. Invariant:
    * `update(fps(A), B) ≡ fps(A ∪ B)`, spec-pinned. */
  def fingerprintIndexUpdate(prev: DataFrame, delta: DataFrame,
      id: Column, text: Column, k: Int = 3, w: Int = 4): DataFrame =
    prev.unionByName(fingerprints(delta, id, text, k, w))

  /** [[fingerprintPairs]] from an already-materialized fingerprint table
    * — the production entry point: at corpus scale the fingerprint set
    * (~2/(w+1) of the gram count) is written once as an index (the BM25
    * df-table convention) and pair discovery reads it, instead of
    * re-running the selection window on each of this plan's four probes
    * of the frame. */
  def fingerprintPairsFrom(fps: DataFrame, maxDf: Int = 64,
      minJaccard: Double = 0.5): DataFrame = {
    val fp = fps.select(col("did"), col("h")).distinct()
    val sizes = fp.groupBy("did").agg(count(lit(1)).as("sz"))
    val rare = fp.join(
      fp.groupBy("h").agg(countDistinct(col("did")).as("df"))
        .where(col("df") <= maxDf),
      "h")
    val shared = rare.as("a").join(rare.as("b"),
        col("a.h") === col("b.h") && col("a.did") < col("b.did"))
      .groupBy(col("a.did").as("did_a"), col("b.did").as("did_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnRenamed("did", "did_a")
        .withColumnRenamed("sz", "sz_a"), "did_a")
      .join(sizes.withColumnRenamed("did", "did_b")
        .withColumnRenamed("sz", "sz_b"), "did_b")
      .withColumn("jaccard", round(
        col("n_shared").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_shared")), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("did_a"), col("did_b"), col("n_shared"), col("jaccard"))
  }

  /** The winnowed fingerprint HASH SET as a per-row array column —
    * window minima only: set membership does not need selection
    * positions, and the min VALUE per window is independent of the tie
    * rule, so this equals `fingerprints(...).select(h)` per doc exactly
    * (WinnowSpec pins it). Computed entirely with codegen'd array HOFs:
    * zero shuffle, usable in a streaming plan where window functions are
    * unavailable. */
  def fingerprintHashes(text: Column, k: Int = 3, w: Int = 4): Column = {
    val ws = split(text, " ")
    val hs = when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - lit(k - 1)),
        i => graft.functions.HashExpressions.polyHash(
          concat_ws(" ", slice(ws, i, lit(k))))))
      .otherwise(array().cast("array<bigint>"))
    val m = size(hs)
    when(m > 0, array_distinct(transform(
      sequence(lit(1), greatest(m - lit(w - 1), lit(1))),
      j => array_min(slice(hs, j, lit(w))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** DuckDB fragment of [[fingerprints]] over the [[SpanDedupOps.gramCteSql]]
    * gram CTE named `g`: the selected-(pos, h) rows, pre-distinct. */
  def fingerprintCteSql(w: Int): String =
    s"""SELECT DISTINCT did,
       |  CAST($PosBase - (sel % $PosBase) AS INTEGER) AS pos,
       |  CAST(sel // $PosBase AS BIGINT) AS h
       |FROM (
       |  SELECT did, pos,
       |    count(*) OVER (PARTITION BY did) AS m,
       |    min(h * $PosBase + ($PosBase - pos)) OVER (
       |      PARTITION BY did ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS sel
       |  FROM g)
       |WHERE pos <= greatest(m - ${w - 1}, 1)""".stripMargin
}
