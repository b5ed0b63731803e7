package graft.queries
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextHash._
import graft.operators.{DedupOps, MultimodalOps, PQOps, RetrievalOps, SimilarityOps, TextOps}
import graft.queries.PipelineShared._

/** Pipeline band (r17 verdict item 7 split): ANN ladder, PQ/IVF tiers, layout & governance (q82-q109, q185).
  * Blocks moved verbatim from the former monolithic Pipeline
  * object; helpers live in [[PipelineShared]]. */
private[queries] object PipelineBandAnnLayout {

  private[queries] val q82 = QueryDef(
    "q82_ann_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
      def id = col("vec_id")
      def v = col("embedding")
      // Shared truth + fitted/encoded artifacts from [[AnnHarnessMemo]]
      // (r11 item 2 made truth once-per-QUERY; r17 item 4 makes all
      // five build-once artifacts once-per-PROCESS — the production
      // lifecycle, leaving the timed reps measuring SEARCH)
      val f = AnnHarnessMemo.frames(s, d)
      val cells = emb.where(col("vec_id") < 8)
      val lsh = SimilarityOps.lshTopK(emb, queries, id, v, LSH_BITS, LSH_K)
      val ivfFixed = SimilarityOps.ivfTopK(emb, queries, cells, id, v,
        LSH_K)
      val ivfLearned = SimilarityOps.ivfTopK(
        emb, queries, f.cent, id, v, LSH_K, nProbe = 2)
      // compression-ladder tiers (round-12): the PQ fixed-codebook
      // shortlist and the binary sign screen, recall-gated like the rest —
      // a quantizer or distance regression drops the row
      val pqShort = PQOps.pqTopK(f.pqIdx, queries, id, v, 20, 8)
      val binShort = SimilarityOps.binarySignTopK(emb, queries, id, v,
        DIM, 50)
      // the production 100 TB path: coarse cells prune, PQ codes score —
      // its recall compounds nProbe cell misses with PQ distortion, so it
      // gets its own gated row (r10 verdict item 1)
      val ivfpqShort = PQOps.ivfPqTopKIndexed(f.ivfpqIdx, queries,
        cells, id, v, 20, 2, 8)
      // IVFADC (q101): same budget and probing, residual-coded — the
      // accuracy the centroid offset + centered residual buy is what
      // this row gates
      val ivfadcShort = PQOps.ivfPqResidualTopKIndexed(f.ivfadcIdx,
        queries, cells, id, v, 20, 2, 8)
      SimilarityOps.annRecall(f.truth, lsh, "lsh")
        .unionAll(SimilarityOps.annRecall(f.truth, ivfFixed, "ivf_fixed"))
        .unionAll(SimilarityOps.annRecall(f.truth, ivfLearned, "ivf_learned"))
        .unionAll(SimilarityOps.annRecall(f.truth, pqShort, "pq_short20"))
        .unionAll(SimilarityOps.annRecall(f.truth, binShort, "bin_short50"))
        .unionAll(SimilarityOps.annRecall(f.truth, ivfpqShort, "ivfpq_short20"))
        .unionAll(SimilarityOps.annRecall(f.truth, ivfadcShort, "ivfadc_short20"))
        .where(col("recall") >= AnnRecallFloor)
    },
    None)

  /** The q82 ground-truth frame, hash-gated on its own (r14 verdict
    * item 5): the recall harness's learned tiers are not
    * SQL-expressible, but the brute-force truth they are all measured
    * AGAINST is plain relational top-k — every (query, neighbor, rank,
    * cosine) row replayed by DuckDB from the same parquet, so the
    * bench's most expensive entry is now half-auditable: a broken
    * truth (distance kernel, norm guard, tie order) fails THIS hash
    * gate, and PipelineOpsSpec pins q82's recall numbers against this
    * exact frame. Same arguments as q82's `truth` leg by construction
    * ([[SimilarityOps.bruteForceTopK]], queries = vec_id < 10,
    * k = LSH_K). */
  private[queries] val q185 = QueryDef(
    "q185_ann_truth",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.bruteForceTopK(
        emb, emb.where(col("vec_id") < 10),
        col("vec_id"), col("embedding"), LSH_K)
    },
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm
       |  FROM v WHERE vec_id < 10),
       |p AS (SELECT q.qid, v.vec_id AS nid,
       |    CASE WHEN q.qnrm * v.nrm > 0
       |      THEN round(${dotSql("q.qe", "v.e", DIM)}
       |        / (q.qnrm * v.nrm), 6) END AS cos_sim
       |  FROM q JOIN v ON v.vec_id <> q.qid)
       |SELECT qid AS query_id, rk, nid AS neighbor_id, cos_sim FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY qid ORDER BY cos_sim DESC, nid)
       |    AS BIGINT) AS rk
       |  FROM p
       |) t WHERE rk <= $LSH_K""".stripMargin)
  private[queries] val q83 = QueryDef(
    "q83_containment_coordinated",
    (s, d) => DedupOps.coordinatedContainmentPairs(
      Tables.documents(s, d), col("doc_id"), col("text"), SHINGLE_W,
      SketchK, SketchT, maxDf = DedupOps.MaxPostingDf,
      minSupport = CoordMinSupport),
    s"""WITH $shingleCte,
       |shf AS (SELECT s.doc_id, s.h FROM sh s JOIN (
       |    SELECT h FROM sh GROUP BY h
       |    HAVING count(*) <= ${DedupOps.MaxPostingDf}) ok ON ok.h = s.h),
       |bk AS (SELECT doc_id, h FROM (
       |    SELECT doc_id, h,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rk
       |    FROM shf) t
       |  WHERE rk <= $SketchK),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bk a JOIN bk b ON a.h = b.h AND a.doc_id < b.doc_id),
       |m AS (SELECT c.doc_a, c.doc_b, x.h,
       |    max(CASE WHEN x.doc_id = c.doc_a THEN 1 ELSE 0 END) AS ina,
       |    max(CASE WHEN x.doc_id = c.doc_b THEN 1 ELSE 0 END) AS inb
       |  FROM cand c JOIN bk x ON x.doc_id IN (c.doc_a, c.doc_b)
       |  GROUP BY 1, 2, 3),
       |v AS (SELECT * FROM (SELECT m.*,
       |    row_number() OVER (PARTITION BY doc_a, doc_b ORDER BY h) AS rk
       |  FROM m) r WHERE rk <= $SketchK),
       |s AS (SELECT doc_a, doc_b,
       |    CAST(count(*) AS BIGINT) AS n_sample,
       |    CAST(sum(ina * inb) AS BIGINT) AS n_both,
       |    sum(ina) AS nva, sum(inb) AS nvb
       |  FROM v GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_sample, n_both,
       |  CASE WHEN nva >= $CoordMinSupport
       |    THEN CAST(n_both AS DOUBLE) / CAST(nva AS DOUBLE) END
       |    AS containment_ab_est,
       |  CASE WHEN nvb >= $CoordMinSupport
       |    THEN CAST(n_both AS DOUBLE) / CAST(nvb AS DOUBLE) END
       |    AS containment_ba_est
       |FROM s
       |WHERE greatest(
       |    coalesce(CASE WHEN nva >= $CoordMinSupport
       |      THEN CAST(n_both AS DOUBLE) / CAST(nva AS DOUBLE) END, -1),
       |    coalesce(CASE WHEN nvb >= $CoordMinSupport
       |      THEN CAST(n_both AS DOUBLE) / CAST(nvb AS DOUBLE) END, -1))
       |  >= $SketchT""".stripMargin)

  /** Incremental semantic dedup ([[SimilarityOps.incrementalSemanticDedup]])
    * — arriving vectors (vec_id % 5 = 0, the "delta") screened against the
    * pre-assigned rest of the corpus under the q43 fixed centroid set.
    * Oracle replays assignment + same-cell cosine screen relationally. */
  private[queries] val q84 = QueryDef(
    "q84_semantic_dedup_incremental",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.where(col("vec_id") < 8)
      SimilarityOps.incrementalSemanticDedup(
        emb.where(pmod(col("vec_id"), lit(5)) === 0),
        SimilarityOps.assignCells(
          emb.where(pmod(col("vec_id"), lit(5)) =!= 0), cents,
          col("vec_id"), col("embedding")),
        cents, col("vec_id"), col("embedding"), COSINE_T)
    },
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings),
       |cents AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM v WHERE vec_id < 8),
       |assign AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT a.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY (CASE WHEN a.nrm * c.cnrm > 0 THEN round(${dotSql("a.e", "c.ce", DIM)} / (a.nrm * c.cnrm), 6) END) DESC,
       |                 c.cid) AS crk
       |    FROM v a CROSS JOIN cents c) t WHERE crk = 1),
       |hits AS (
       |  SELECT DISTINCT dv.vec_id
       |  FROM v dv
       |  JOIN assign da ON da.vec_id = dv.vec_id AND dv.vec_id % 5 = 0
       |  JOIN assign ca ON ca.cell = da.cell AND ca.vec_id % 5 <> 0
       |  JOIN v cv ON cv.vec_id = ca.vec_id
       |  WHERE (CASE WHEN dv.nrm * cv.nrm > 0
       |    THEN round(${dotSql("dv.e", "cv.e", DIM)} / (dv.nrm * cv.nrm), 6) END)
       |    >= $COSINE_T)
       |SELECT a.vec_id, a.cell, (h.vec_id IS NULL) AS kept
       |FROM assign a LEFT JOIN hits h ON h.vec_id = a.vec_id
       |WHERE a.vec_id % 5 = 0""".stripMargin)

  /** Cluster-size audit ([[DedupOps.clusterStats]]) over the q51 cluster
    * chain — the dedup report row set (how many clusters of each size,
    * how many docs a keep-one pass removes). */
  private[queries] val q85 = QueryDef(
    "q85_cluster_stats",
    (s, d) => DedupOps.clusterStats(
      DedupOps.dedupClusters(
        DedupOps.lshCandidatePairs(DedupOps.minhashSignatures(
          Tables.documents(s, d), col("doc_id"), col("text"), SHINGLE_W)),
        "doc_a", "doc_b")),
    s"""WITH RECURSIVE $clusterChainCtes,
       |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       |  FROM reach GROUP BY a),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n
       |  FROM cl GROUP BY 1)
       |SELECT n AS cluster_size,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(n * count(*) AS BIGINT) AS n_docs
       |FROM sz GROUP BY n""".stripMargin)

  /** Leakage-safe train/val/test split ([[TextOps.leakageSafeSplit]]):
    * q45's independent hash split leaks near-duplicates across splits — a
    * test doc's 0.9-Jaccard twin lands in train and no decontamination
    * pass can see it (it IS the same corpus). Here the q51 near-dup
    * cluster moves as ONE unit: every member takes the bucket of the
    * cluster's min content hash (id-independent — re-ingestion with fresh
    * doc ids reproduces the split), plus the 1/|cluster| duplicate-aware
    * sample weight. Oracle: the q51 recursive-CTE cluster chain, a left
    * join for singletons, and the same bucket arithmetic. */
  private[queries] val q88 = QueryDef(
    "q88_leakage_safe_split",
    (s, d) => TextOps.leakageSafeSplit(
      Tables.documents(s, d), col("doc_id"), col("text"),
      DedupOps.dedupClusters(
        DedupOps.lshCandidatePairs(DedupOps.minhashSignatures(
          Tables.documents(s, d), col("doc_id"), col("text"), SHINGLE_W)),
        "doc_a", "doc_b")),
    s"""WITH RECURSIVE $clusterChainCtes,
       |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       |  FROM reach GROUP BY a),
       |base AS (SELECT doc_id, ${polyHashSql("text")} AS own_hash
       |  FROM documents),
       |g AS (SELECT b.doc_id,
       |    COALESCE(cl.cluster_id, b.doc_id) AS cluster_id, b.own_hash
       |  FROM base b LEFT JOIN cl ON cl.doc_id = b.doc_id),
       |pc AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |    min(own_hash) AS grp_hash
       |  FROM g GROUP BY 1)
       |SELECT g.doc_id, g.cluster_id, pc.n_members,
       |  1.0 / pc.n_members AS sample_weight,
       |  pc.grp_hash % 100 AS bucket,
       |  CASE WHEN pc.grp_hash % 100 < 80 THEN 'train'
       |       WHEN pc.grp_hash % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM g JOIN pc ON pc.cluster_id = g.cluster_id""".stripMargin)

  /** Image near-dup as a REGISTERED query (round-9, closing the verdict's
    * "media near-dup has no registered query" gap): REAL PNG payloads are
    * synthesized deterministically from the documents table
    * ([[MultimodalOps.syntheticImageCorpus]] — binary can't cross the
    * DuckDB oracle but pair rows of BIGINTs can, the q42/q82 precedent),
    * then the full production pipeline runs: ImageIO decode → 64-bit
    * dHash → 8×8-band pigeonhole discovery → exact bit_count(xor)
    * verify. Planted decode→re-encode twins guarantee hamming-0 pairs
    * (non-empty, rows-checkable); planted resize variants exercise the
    * perceptual tolerance; planted truncated payloads must be dropped by
    * the `ok` gate — a codec, banding, or integrity regression all move
    * the row count. No SQL oracle: ImageIO's area-average resample is
    * not expressible in DuckDB. */
  private[queries] val q86 = QueryDef(
    "q86_image_neardup",
    (s, d) => MediaNearDup.imageOp(MediaNearDup.imageCorpus(s, d))(s),
    None)

  /** Audio near-dup as a REGISTERED query — the audio face of [[q86]]:
    * REAL WAV payloads from the documents table
    * ([[MultimodalOps.syntheticAudioCorpus]]), then PCM decode →
    * energy-envelope hash → the shared banded discovery. Planted
    * half-volume twins hash identically by amplitude-scale invariance
    * (hamming 0 — deterministic non-empty output); truncated payloads
    * must flag `ok = false` and stay out of the pairs. */
  private[queries] val q87 = QueryDef(
    "q87_audio_neardup",
    (s, d) => MediaNearDup.audioOp(MediaNearDup.audioCorpus(s, d))(s),
    None)

  /** Video near-dup as a REGISTERED query — the video face of [[q86]],
    * closing the last spec-only modality: REAL Y4M payloads from the
    * documents table ([[MultimodalOps.syntheticVideoCorpus]]), then the
    * full production pipeline: pure-JVM Y4M decode → per-frame luma
    * dHash → banded discovery over EVERY frame hash → frame-set verify
    * with match fraction normalized over the smaller video. Planted
    * decode→re-encode twins match at fraction 1.0 (deterministic
    * non-empty output); planted FRAME-STRIDE twins (every 2nd frame)
    * exercise the trimmed-copy recall guarantee; truncated payloads must
    * flag `ok = false` and stay out of the pairs — codec, hashing,
    * banding, and verify regressions all move the row count. No SQL
    * oracle: the Y4M decode is not expressible in DuckDB. */
  private[queries] val q89 = QueryDef(
    "q89_video_neardup",
    (s, d) => MediaNearDup.videoOp(MediaNearDup.videoCorpus(s, d))(s),
    None)
  private[queries] val q90 = QueryDef(
    "q90_zorder_cells",
    (s, d) => {
      val ev = Tables.events(s, d)
      val rs = graft.operators.LayoutOps
        .columnRanges(ev, Seq("value", "user_id"))
      val z = graft.operators.LayoutOps.zValue(
        rs.map { case (c, lo, hi) => (col(c), lo, hi) }, bits = ZBITS)
      ev.withColumn("_z", z)
        .groupBy(shiftright(col("_z"), ZBITS).as("cell"))
        .agg(count(lit(1)).as("n"), min(col("_z")).as("z_min"),
          max(col("_z")).as("z_max"))
    }, {
      val maxBin = (1 << ZBITS) - 1
      def bin(c: String, lo: String, hi: String) =
        s"CAST(least(greatest(coalesce(round(((CAST($c AS DOUBLE) - $lo)" +
          s" / ($hi - $lo)) * $maxBin.0), 0.0), 0.0), $maxBin.0) AS BIGINT)"
      val terms = (0 until ZBITS).flatMap(b => Seq(
        s"(((b0 >> $b) & 1) << ${b * 2})",
        s"(((b1 >> $b) & 1) << ${b * 2 + 1})"))
      s"""WITH r AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo0,
         |  CAST(MAX(value) AS DOUBLE) AS hi0,
         |  CAST(MIN(user_id) AS DOUBLE) AS lo1,
         |  CAST(MAX(user_id) AS DOUBLE) AS hi1 FROM events),
         |b AS (SELECT ${bin("value", "lo0", "hi0")} AS b0,
         |  ${bin("user_id", "lo1", "hi1")} AS b1 FROM events, r),
         |z AS (SELECT ${terms.mkString(" | ")} AS z FROM b)
         |SELECT z >> $ZBITS AS cell, COUNT(*) AS n,
         |  MIN(z) AS z_min, MAX(z) AS z_max
         |FROM z GROUP BY 1""".stripMargin
    })

  /** Compaction plan ([[graft.operators.LayoutOps.compactionPlan]]) —
    * the OPTIMIZE-planning half of the write-side layout family: a
    * synthetic small-file audit derived from `orders` (one "file" per
    * 1000-key range, so file sizes vary with TPC-H's sparse key stride)
    * binned to ~2500-row rewrite groups by the distributed-prefix-sum
    * rule over the clustering order. The oracle replays the cumsum
    * window, the floor binning, and the per-bin aggregates — the
    * adjacency-preserving assignment is hash-pinned, which is the
    * property that keeps per-file ranges disjoint after the rewrite. */
  private[queries] val q102 = QueryDef(
    "q102_compaction_plan",
    (s, d) => {
      val o = Tables.orders(s, d)
      val audit = o.groupBy((col("o_orderkey") / 1000).cast("long")
          .as("file"))
        .agg(count(lit(1)).as("n_rows"), min(col("o_orderkey")).as("k_min"))
      graft.operators.LayoutOps.compactionPlan(audit, col("file"),
        col("n_rows"), col("k_min"), 2500L)
    },
    s"""WITH a AS (SELECT CAST(floor(o_orderkey / 1000) AS BIGINT) AS file,
       |    CAST(count(*) AS BIGINT) AS n_rows, min(o_orderkey) AS k_min
       |  FROM orders GROUP BY 1),
       |p AS (SELECT file, n_rows,
       |    coalesce(sum(n_rows) OVER (ORDER BY k_min, file
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b4
       |  FROM a),
       |b AS (SELECT file, n_rows,
       |    CAST(floor(b4 / 2500.0) AS BIGINT) AS bin FROM p)
       |SELECT file, n_rows, bin,
       |  CAST(sum(n_rows) OVER (PARTITION BY bin) AS BIGINT) AS bin_rows,
       |  CAST(count(*) OVER (PARTITION BY bin) AS BIGINT) AS bin_files,
       |  (count(*) OVER (PARTITION BY bin)) > 1 AS needs_compaction
       |FROM b""".stripMargin)

  /** Temperature-flattened source mix ([[TextOps.temperatureMix]],
    * alpha = 0.5): per-doc sampling weights plus the deterministic
    * hash-realized copy counts. The oracle recomputes the whole chain —
    * sqrt weights (exactly-rounded on both engines), the decimal-path
    * weight total (VARCHAR hop per the DuckDB cast convention), and the
    * shuffleShards mixed-hash draw — so a drift in any of the binning,
    * the Σ discipline, or the draw arithmetic fails the hash. */
  private[queries] val q91 = QueryDef(
    "q91_temperature_mix",
    (s, d) => TextOps.temperatureMix(
      Tables.documents(s, d), col("doc_id"), col("text"), col("source"),
      alpha = 0.5),
    s"""WITH c AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_src
       |  FROM documents GROUP BY source),
       |w AS (SELECT source, n_src, sqrt(CAST(n_src AS DOUBLE)) AS w FROM c),
       |t AS (SELECT CAST(SUM(n_src) AS BIGINT) AS n_total,
       |    CAST(CAST(SUM(CAST(w AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
       |      AS w_total FROM w),
       |r AS (SELECT source, n_src,
       |    CAST(n_src AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_raw,
       |    w / w_total AS p_temp
       |  FROM w, t),
       |d AS (SELECT doc_id, source,
       |    (((((${polyHashSql("text")} * 31 + doc_id) % $P + $P) % $P)
       |      * 2654435761) % $P) % 1000000 AS draw
       |  FROM documents)
       |SELECT d.doc_id, d.source, r.n_src, r.p_raw, r.p_temp,
       |  r.p_temp / r.p_raw AS boost,
       |  CAST(floor(r.p_temp / r.p_raw) AS BIGINT) +
       |    (CASE WHEN CAST(draw AS DOUBLE) <
       |      (r.p_temp / r.p_raw - floor(r.p_temp / r.p_raw)) * 1000000.0
       |     THEN 1 ELSE 0 END) AS n_copies
       |FROM d JOIN r USING (source)""".stripMargin)

  /** Int8 scalar quantization digest ([[SimilarityOps.sq8Digest]]): the
    * embedding memory-footprint scale path (4 bytes/dim → 1) registered
    * through per-vector scalars — code checksum/range, reconstructed norm,
    * max reconstruction error — each either order-free (int sum, min, max)
    * or a fixed-order fold rounded at 1e-6, so the whole quantizer
    * (stats pass, clamp/round rule, reconstruction arithmetic) is
    * hash-pinned against DuckDB computing the identical chain. */
  private[queries] val q92 = QueryDef(
    "q92_embedding_sq8",
    (s, d) => SimilarityOps.sq8Digest(
      Tables.embeddings(s, d), col("vec_id"), col("embedding"), DIM),
    s"""WITH $sq8Ctes
       |SELECT vec_id,
       |  CAST(list_reduce(list_prepend(0, c), (x,y) -> x + y) AS BIGINT) AS code_sum,
       |  list_reduce(c, (x,y) -> least(x,y)) AS code_min,
       |  list_reduce(c, (x,y) -> greatest(x,y)) AS code_max,
       |  round(sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1,$DIM),
       |    i -> (mn[i] + c[i]*sc[i]) * (mn[i] + c[i]*sc[i]))), (x,y) -> x + y)), 6) AS recon_nrm,
       |  round(list_reduce(list_prepend(0.0, list_transform(generate_series(1,$DIM),
       |    i -> abs(CAST(e[i] AS DOUBLE) - (mn[i] + c[i]*sc[i])))), (x,y) -> greatest(x,y)), 6) AS max_err
       |FROM q""".stripMargin)

  /** Near-dup discovery over the QUANTIZED corpus
    * ([[SimilarityOps.sq8NearDupPairsBucketed]]) — q46's multi-table
    * sign-LSH re-expressed on SQ8 codes: buckets from reconstructed signs,
    * the exact reconstructed-cosine verify fused into the bucket join.
    * The oracle reconstructs the same vectors from the same codes and runs
    * the same banding, so ANY drift in the quantizer or the reconstructed
    * scoring moves pairs and fails the hash. Proves the float corpus can
    * be discarded post-encode without losing the dedup capability. */
  private[queries] val q93 = QueryDef(
    "q93_sq8_neardup",
    (s, d) => SimilarityOps.sq8NearDupPairsBucketed(
      Tables.embeddings(s, d), col("vec_id"), col("embedding"), COSINE_T,
      LSH_BITS, LSH_TABLES, DIM), {
      val bands = (0 until LSH_TABLES).map { t =>
        val bits = (1 to LSH_BITS).map(j =>
          s"(CASE WHEN re[${t * LSH_BITS + j}] > 0 THEN ${1 << (j - 1)} ELSE 0 END)")
          .mkString(" + ")
        s"SELECT vec_id, $t AS tbl, $bits AS bucket FROM n"
      }.mkString("\nUNION ALL\n")
      s"""WITH $sq8Ctes,
         |v AS (SELECT vec_id,
         |  list_transform(generate_series(1,$DIM), i -> mn[i] + c[i]*sc[i]) AS re FROM q),
         |n AS (SELECT vec_id, re,
         |  sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1,$DIM),
         |    i -> re[i] * re[i])), (x,y) -> x + y)) AS nrm FROM v),
         |b AS (
         |$bands),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM b x JOIN b y ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT vec_a, vec_b, cos_sim FROM (
         |  SELECT cd.vec_a, cd.vec_b,
         |    CASE WHEN a.nrm * bb.nrm > 0 THEN
         |      round(list_reduce(list_prepend(0.0, list_transform(generate_series(1,$DIM),
         |        i -> a.re[i] * bb.re[i])), (x,y) -> x + y) / (a.nrm * bb.nrm), 6) END AS cos_sim
         |  FROM cand cd JOIN n a ON cd.vec_a = a.vec_id JOIN n bb ON cd.vec_b = bb.vec_id
         |) t WHERE cos_sim >= $COSINE_T""".stripMargin
    })

  /** Product-quantized ANN top-k with a FIXED deterministic codebook
    * ([[PQOps.pqIndex]]/[[PQOps.pqTopK]], codebook = the first [[PQ_K]]
    * corpus rows — the q43 fixed-sample precedent): 64 floats become 8
    * byte-codes, and search runs asymmetrically against the
    * reconstructions, floats discarded post-encode. The oracle recomputes
    * the whole chain — per-subspace argmin assignment (fixed-order
    * squared-L2, tie → smallest entry), glued reconstructions, and the
    * subspace-grouped ADC fold — so encode, codebook slicing, and the
    * ranking rule are all hash-pinned. */
  private[queries] val q94 = QueryDef(
    "q94_pq_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      PQOps.pqTopK(
        PQOps.pqIndex(emb, emb.where(col("vec_id") < PQ_K),
          col("vec_id"), col("embedding"), PQ_M, PQ_SUB),
        emb.where(col("vec_id") < 10), col("vec_id"), col("embedding"),
        LSH_K, PQ_SUB)
    }, {
      def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
      val subDist = (e: String, ce: String, sIdx: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i -> " +
          sq(s"CAST($e[$sIdx*$PQ_SUB+i] AS DOUBLE)",
            s"CAST($ce[$sIdx*$PQ_SUB+i] AS DOUBLE)") + ")), (x,y) -> x + y)"
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |cb AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $PQ_K),
         |dists AS (
         |  SELECT a.vec_id, c.cid, s.s, ${subDist("a.e", "c.ce", "s.s")} AS dist
         |  FROM v a CROSS JOIN cb c CROSS JOIN generate_series(0,${PQ_M - 1}) AS s(s)),
         |codes AS (SELECT vec_id, s, cid AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
         |    FROM dists) t WHERE rk = 1),
         |recon AS (
         |  SELECT d.vec_id, flatten(list(d.sub ORDER BY d.s)) AS re FROM (
         |    SELECT codes.vec_id, codes.s,
         |      list_transform(cb.ce[codes.s*$PQ_SUB+1 : codes.s*$PQ_SUB+$PQ_SUB],
         |        x -> CAST(x AS DOUBLE)) AS sub
         |    FROM codes JOIN cb ON cb.cid = codes.code) d GROUP BY d.vec_id),
         |scored AS (
         |  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
         |    round(list_reduce(list_prepend(0.0, list_transform(generate_series(0,${PQ_M - 1}), s ->
         |      list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i ->
         |        ${sq(s"CAST(q.e[s*$PQ_SUB+i] AS DOUBLE)", s"r.re[s*$PQ_SUB+i]")})),
         |        (u,w) -> u + w))), (u,w) -> u + w), 6) AS adc_dist
         |  FROM v q JOIN recon r ON q.vec_id < 10 AND r.vec_id <> q.vec_id)
         |SELECT query_id, rk, neighbor_id, adc_dist FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rk
         |  FROM scored) t WHERE rk <= $LSH_K""".stripMargin
    })

  /** PQ top-k with a LEARNED codebook — per-subspace k-means glued into
    * full-dimension entries ([[PQOps.pqLearnCodebook]]), the quantizer
    * that actually tracks the data distribution (q48's learned-vs-fixed
    * contract, here for PQ). Full oracle since r14 (the q48/q134
    * frozen-model treatment over the q94 replay chain): the dump-time
    * thunk embeds the memoized codebook and DuckDB independently
    * replays subspace assignment, reconstruction, ADC scoring, and the
    * final ranking; the recall floor against exact float search stays
    * pinned in PQSpec. */
  private[queries] val q95 = QueryDef(
    "q95_pq_topk_learned",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      PQOps.pqTopK(
        PqIndexMemo.frame(s, d),
        emb.where(col("vec_id") < 10), col("vec_id"), col("embedding"),
        LSH_K, PQ_SUB)
    },
    Some(() => {
      val sfDir = sys.props.getOrElse("graft.verify.sfdir",
        "/root/testdata/sf0.001")
      val cbRows = PqCodebookMemo.rows(
          org.apache.spark.sql.SparkSession.active, sfDir)
        .map { case (cid, e) =>
          s"($cid, [${e.map(f =>
            java.lang.Double.toString(f.toDouble)).mkString(",")}])"
        }.mkString(",")
      def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
      val subDist = (e: String, ce: String, sIdx: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i -> " +
          sq(s"CAST($e[$sIdx*$PQ_SUB+i] AS DOUBLE)",
            s"CAST($ce[$sIdx*$PQ_SUB+i] AS DOUBLE)") + ")), (x,y) -> x + y)"
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |cb AS (SELECT CAST(cid AS BIGINT) AS cid, ce
         |  FROM (VALUES $cbRows) t(cid, ce)),
         |dists AS (
         |  SELECT a.vec_id, c.cid, s.s, ${subDist("a.e", "c.ce", "s.s")} AS dist
         |  FROM v a CROSS JOIN cb c CROSS JOIN generate_series(0,${PQ_M - 1}) AS s(s)),
         |codes AS (SELECT vec_id, s, cid AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
         |    FROM dists) t WHERE rk = 1),
         |recon AS (
         |  SELECT d.vec_id, flatten(list(d.sub ORDER BY d.s)) AS re FROM (
         |    SELECT codes.vec_id, codes.s,
         |      list_transform(cb.ce[codes.s*$PQ_SUB+1 : codes.s*$PQ_SUB+$PQ_SUB],
         |        x -> CAST(x AS DOUBLE)) AS sub
         |    FROM codes JOIN cb ON cb.cid = codes.code) d GROUP BY d.vec_id),
         |scored AS (
         |  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
         |    round(list_reduce(list_prepend(0.0, list_transform(generate_series(0,${PQ_M - 1}), s ->
         |      list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i ->
         |        ${sq(s"CAST(q.e[s*$PQ_SUB+i] AS DOUBLE)", s"r.re[s*$PQ_SUB+i]")})),
         |        (u,w) -> u + w))), (u,w) -> u + w), 6) AS adc_dist
         |  FROM v q JOIN recon r ON q.vec_id < 10 AND r.vec_id <> q.vec_id)
         |SELECT query_id, rk, neighbor_id, adc_dist FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rk
         |  FROM scored) t WHERE rk <= $LSH_K""".stripMargin
    }))

  /** PQ shortlist + exact re-rank ([[PQOps.pqRerankTopK]]) — the full
    * production ANN composition: codes prune the corpus to a top-
    * [[PQ_SHORTLIST]] shortlist (q94's fixed-codebook chain), exact
    * squared-L2 re-scores only those candidates. The oracle replays the
    * entire two-stage pipeline — PQ assignment, reconstruction, ADC
    * shortlist, then the three-dot exact distance and the final ranking —
    * so the composition's hand-off (shortlist membership!) is itself
    * hash-pinned: a pruning regression changes who gets re-ranked and
    * fails the gate even when the re-rank arithmetic is right. */
  private[queries] val q96 = QueryDef(
    "q96_pq_rerank",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
      PQOps.pqRerankTopK(
        PQOps.pqTopK(
          PQOps.pqIndex(emb, emb.where(col("vec_id") < PQ_K),
            col("vec_id"), col("embedding"), PQ_M, PQ_SUB),
          queries, col("vec_id"), col("embedding"), PQ_SHORTLIST, PQ_SUB),
        emb, queries, col("vec_id"), col("embedding"), LSH_K)
    }, {
      def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
      val subDist = (e: String, ce: String, sIdx: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i -> " +
          sq(s"CAST($e[$sIdx*$PQ_SUB+i] AS DOUBLE)",
            s"CAST($ce[$sIdx*$PQ_SUB+i] AS DOUBLE)") + ")), (x,y) -> x + y)"
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |cb AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $PQ_K),
         |dists AS (
         |  SELECT a.vec_id, c.cid, s.s, ${subDist("a.e", "c.ce", "s.s")} AS dist
         |  FROM v a CROSS JOIN cb c CROSS JOIN generate_series(0,${PQ_M - 1}) AS s(s)),
         |codes AS (SELECT vec_id, s, cid AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
         |    FROM dists) t WHERE rk = 1),
         |recon AS (
         |  SELECT d.vec_id, flatten(list(d.sub ORDER BY d.s)) AS re FROM (
         |    SELECT codes.vec_id, codes.s,
         |      list_transform(cb.ce[codes.s*$PQ_SUB+1 : codes.s*$PQ_SUB+$PQ_SUB],
         |        x -> CAST(x AS DOUBLE)) AS sub
         |    FROM codes JOIN cb ON cb.cid = codes.code) d GROUP BY d.vec_id),
         |shortlist AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS srk
         |    FROM (
         |      SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
         |        round(list_reduce(list_prepend(0.0, list_transform(generate_series(0,${PQ_M - 1}), s ->
         |          list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i ->
         |            ${sq(s"CAST(q.e[s*$PQ_SUB+i] AS DOUBLE)", s"r.re[s*$PQ_SUB+i]")})),
         |            (u,w) -> u + w))), (u,w) -> u + w), 6) AS adc_dist
         |      FROM v q JOIN recon r ON q.vec_id < 10 AND r.vec_id <> q.vec_id) a
         |  ) b WHERE srk <= $PQ_SHORTLIST)
         |SELECT query_id, rk, neighbor_id, l2_dist FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY l2_dist, neighbor_id) AS BIGINT) AS rk
         |  FROM (
         |    SELECT sl.query_id, sl.neighbor_id,
         |      round(${dotSql("q.e", "q.e", DIM)} - 2.0 * ${dotSql("q.e", "n.e", DIM)}
         |        + ${dotSql("n.e", "n.e", DIM)}, 6) AS l2_dist
         |    FROM shortlist sl
         |    JOIN v q ON q.vec_id = sl.query_id
         |    JOIN v n ON n.vec_id = sl.neighbor_id) s
         |) t WHERE rk <= $LSH_K""".stripMargin
    })

  /** Snapshot diff ([[graft.operators.AuditOps.snapshotDiff]]) — corpus
    * version auditing: the "after" snapshot is derived from documents with
    * deterministic planted edits (mod-97 removals, mod-101 text revisions,
    * mod-103 re-keyed additions), so every status arm is exercised and
    * counted. The oracle replays the same derivation and the same
    * full-outer hash compare; a drift in the content canonicalization
    * (separator, column order, cast) or the join/status logic moves rows
    * between statuses and fails the hash. */
  private[queries] val q97 = QueryDef(
    "q97_snapshot_diff",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val after = docs.where(col("doc_id") % 97 =!= 0)
        .withColumn("text", when(col("doc_id") % 101 === 0,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
        .unionAll(docs.where(col("doc_id") % 103 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L))
      graft.operators.AuditOps.snapshotDiff(
        docs, after, col("doc_id"), Seq(col("text"), col("source")),
        keyName = "doc_id")
    }, {
      // mirror contentHash's NULL sentinel: coalesce each field to chr(0)
      // BEFORE concat_ws (both engines skip NULL args silently)
      val h = (t: String) => polyHashSql(
        s"concat_ws(chr(1), coalesce(CAST($t.text AS VARCHAR), chr(0)), " +
          s"coalesce(CAST($t.source AS VARCHAR), chr(0)))")
      s"""WITH chg AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 101 = 0 THEN text || ' [rev2]' ELSE text END AS text,
         |    source
         |  FROM documents WHERE doc_id % 97 <> 0),
         |adds AS (SELECT doc_id + 10000000 AS doc_id, text, source
         |  FROM documents WHERE doc_id % 103 = 0),
         |b AS (SELECT * FROM chg UNION ALL SELECT * FROM adds),
         |bh AS (SELECT a.doc_id, ${h("a")} AS before_hash FROM documents a),
         |ah AS (SELECT b.doc_id, ${h("b")} AS after_hash FROM b)
         |SELECT COALESCE(bh.doc_id, ah.doc_id) AS doc_id,
         |  CASE WHEN bh.doc_id IS NULL THEN 'added'
         |       WHEN ah.doc_id IS NULL THEN 'removed'
         |       WHEN before_hash <> after_hash THEN 'changed'
         |       ELSE 'unchanged' END AS status,
         |  before_hash, after_hash
         |FROM bh FULL OUTER JOIN ah ON bh.doc_id = ah.doc_id""".stripMargin
    })

  /** Hamming top-k over 64-bit sign fingerprints
    * ([[SimilarityOps.binarySignTopK]]) — the cheapest tier of the
    * embedding compression ladder (8 bytes + one bit_count per candidate),
    * the coarse screen in front of SQ8/PQ/exact stages. The oracle mirrors
    * the disjoint-bit sum encoding (two's-complement at bit 64, the q59
    * simhash convention), the xor/popcount distance, and the
    * (hamming, id) ranking — sign rule, packing, and ranking all
    * hash-pinned. */
  private[queries] val q98 = QueryDef(
    "q98_binary_ann",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.binarySignTopK(emb, emb.where(col("vec_id") < 10),
        col("vec_id"), col("embedding"), DIM, LSH_K)
    }, {
      val bits = (1 to DIM).map(i =>
        s"(CASE WHEN e[$i] > 0 THEN CAST(${1L << (i - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
        .mkString(" + ")
      s"""WITH sig AS (
         |  SELECT vec_id, CAST($bits AS BIGINT) AS s
         |  FROM (SELECT vec_id, embedding AS e FROM embeddings) t)
         |SELECT query_id, rk, neighbor_id, hamming FROM (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    CAST(bit_count(xor(q.s, n.s)) AS INTEGER) AS hamming,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY bit_count(xor(q.s, n.s)), n.vec_id) AS BIGINT) AS rk
         |  FROM sig q JOIN sig n ON q.vec_id < 10 AND n.vec_id <> q.vec_id
         |) t WHERE rk <= $LSH_K""".stripMargin
    })

  /** IVF-PQ ([[PQOps.ivfPqTopK]]) — the standard billion-scale ANN
    * composition: q43's cosine coarse cells prune, q94's PQ codes score,
    * floats appear nowhere after indexing. Fixed deterministic cells AND
    * codebook (the first [[PQ_K]] rows serve both roles), so the oracle
    * replays the ENTIRE composition — cell assignment, nProbe probing,
    * per-cell ADC scoring, final ranking — and a drift in either half or
    * in their hand-off (which candidates get scored) fails the hash. */
  private[queries] val q99 = QueryDef(
    "q99_ivfpq_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val sample = emb.where(col("vec_id") < PQ_K)
      PQOps.ivfPqTopK(emb, emb.where(col("vec_id") < 10), sample, sample,
        col("vec_id"), col("embedding"), LSH_K, nProbe = 2, PQ_M, PQ_SUB)
    }, {
      def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
      val subDist = (e: String, ce: String, sIdx: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i -> " +
          sq(s"CAST($e[$sIdx*$PQ_SUB+i] AS DOUBLE)",
            s"CAST($ce[$sIdx*$PQ_SUB+i] AS DOUBLE)") + ")), (x,y) -> x + y)"
      s"""WITH v AS (SELECT vec_id, embedding AS e,
         |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings),
         |cb AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM v WHERE vec_id < $PQ_K),
         |dists AS (
         |  SELECT a.vec_id, c.cid, s.s, ${subDist("a.e", "c.ce", "s.s")} AS dist
         |  FROM v a CROSS JOIN cb c CROSS JOIN generate_series(0,${PQ_M - 1}) AS s(s)),
         |codes AS (SELECT vec_id, s, cid AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
         |    FROM dists) t WHERE rk = 1),
         |recon AS (
         |  SELECT d.vec_id, flatten(list(d.sub ORDER BY d.s)) AS re FROM (
         |    SELECT codes.vec_id, codes.s,
         |      list_transform(cb.ce[codes.s*$PQ_SUB+1 : codes.s*$PQ_SUB+$PQ_SUB],
         |        x -> CAST(x AS DOUBLE)) AS sub
         |    FROM codes JOIN cb ON cb.cid = codes.code) d GROUP BY d.vec_id),
         |csim AS (
         |  SELECT a.vec_id, c.cid,
         |    CASE WHEN a.nrm * c.cnrm > 0 THEN
         |      round(${dotSql("a.e", "c.ce", DIM)} / (a.nrm * c.cnrm), 6) END AS c_sim
         |  FROM v a CROSS JOIN cb c),
         |assign AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY c_sim DESC NULLS LAST, cid) AS crk FROM csim) t
         |  WHERE crk = 1),
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY c_sim DESC NULLS LAST, cid) AS crk
         |    FROM csim WHERE vec_id < 10) t WHERE crk <= 2),
         |scored AS (
         |  SELECT p.query_id, r.vec_id AS neighbor_id, an.cell,
         |    round(list_reduce(list_prepend(0.0, list_transform(generate_series(0,${PQ_M - 1}), s ->
         |      list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i ->
         |        ${sq(s"CAST(q.e[s*$PQ_SUB+i] AS DOUBLE)", s"r.re[s*$PQ_SUB+i]")})),
         |        (u,w) -> u + w))), (u,w) -> u + w), 6) AS adc_dist
         |  FROM probes p
         |  JOIN assign an ON an.cell = p.cell
         |  JOIN recon r ON r.vec_id = an.vec_id AND r.vec_id <> p.query_id
         |  JOIN v q ON q.vec_id = p.query_id)
         |SELECT query_id, rk, neighbor_id, cell, adc_dist FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rk
         |  FROM scored) t WHERE rk <= $LSH_K""".stripMargin
    })

  /** IVFADC — IVF-PQ over CELL RESIDUALS ([[PQOps.ivfPqResidualTopK]]),
    * the composition production billion-scale ANN actually deploys: the
    * coarse cell carries the EXACT centroid offset and PQ quantizes only
    * the small centered residual, so the same 8-byte code budget buys
    * less distortion than q99's raw-vector coding. Fixed deterministic
    * geometry keeps it oracle-expressible: cells = first [[PQ_K]] corpus
    * rows (q99's), residual codebook = the residuals of corpus rows
    * [[PQ_K]]..2·[[PQ_K]]−1 re-idd to 0..7 (nonzero by construction —
    * the first-8 rows' own residuals are identically zero since each IS
    * its cell's centroid). The oracle replays assignment, the FLOAT
    * residual subtraction (DuckDB REAL arithmetic is IEEE-single
    * bit-identical to Spark's `zip_with` subtraction — measured), the
    * per-subspace argmin over residual space, recon glue, probing, and
    * the residual-vs-residual ADC — the full IVFADC chain hash-pinned. */
  private[queries] val q101 = QueryDef(
    "q101_ivfadc_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cells = emb.where(col("vec_id") < PQ_K)
      val rcb = PQOps.cellResiduals(
          emb.where(col("vec_id") >= PQ_K && col("vec_id") < 2 * PQ_K),
          cells, col("vec_id"), col("embedding"))
        .select((col("vec_id") - PQ_K).as("vec_id"),
          col("res").as("embedding"))
      PQOps.ivfPqResidualTopK(emb, emb.where(col("vec_id") < 10), cells,
        rcb, col("vec_id"), col("embedding"), LSH_K, nProbe = 2,
        PQ_M, PQ_SUB)
    }, {
      def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
      val subDist = (e: String, ce: String, sIdx: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i -> " +
          sq(s"CAST($e[$sIdx*$PQ_SUB+i] AS DOUBLE)",
            s"CAST($ce[$sIdx*$PQ_SUB+i] AS DOUBLE)") + ")), (x,y) -> x + y)"
      s"""WITH v AS (SELECT vec_id, embedding AS e,
         |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings),
         |cb AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM v WHERE vec_id < $PQ_K),
         |csim AS (
         |  SELECT a.vec_id, c.cid,
         |    CASE WHEN a.nrm * c.cnrm > 0 THEN
         |      round(${dotSql("a.e", "c.ce", DIM)} / (a.nrm * c.cnrm), 6) END AS c_sim
         |  FROM v a CROSS JOIN cb c),
         |assign AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY c_sim DESC NULLS LAST, cid) AS crk FROM csim) t
         |  WHERE crk = 1),
         |res AS (
         |  SELECT a.vec_id, an.cell,
         |    list_transform(generate_series(1,$DIM), i -> a.e[i] - c.ce[i]) AS r
         |  FROM v a JOIN assign an ON an.vec_id = a.vec_id
         |  JOIN cb c ON c.cid = an.cell),
         |rcb AS (SELECT vec_id - $PQ_K AS cid, r AS ce FROM res
         |  WHERE vec_id >= $PQ_K AND vec_id < ${2 * PQ_K}),
         |dists AS (
         |  SELECT a.vec_id, c.cid, s.s, ${subDist("a.r", "c.ce", "s.s")} AS dist
         |  FROM res a CROSS JOIN rcb c CROSS JOIN generate_series(0,${PQ_M - 1}) AS s(s)),
         |codes AS (SELECT vec_id, s, cid AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
         |    FROM dists) t WHERE rk = 1),
         |recon AS (
         |  SELECT d.vec_id, flatten(list(d.sub ORDER BY d.s)) AS re FROM (
         |    SELECT codes.vec_id, codes.s,
         |      list_transform(rcb.ce[codes.s*$PQ_SUB+1 : codes.s*$PQ_SUB+$PQ_SUB],
         |        x -> CAST(x AS DOUBLE)) AS sub
         |    FROM codes JOIN rcb ON rcb.cid = codes.code) d GROUP BY d.vec_id),
         |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY c_sim DESC NULLS LAST, cid) AS crk
         |    FROM csim WHERE vec_id < 10) t WHERE crk <= 2),
         |qres AS (
         |  SELECT p.query_id, p.cell,
         |    list_transform(generate_series(1,$DIM), i -> q.e[i] - c.ce[i]) AS qr
         |  FROM probes p JOIN v q ON q.vec_id = p.query_id
         |  JOIN cb c ON c.cid = p.cell),
         |scored AS (
         |  SELECT p.query_id, r.vec_id AS neighbor_id, p.cell,
         |    round(list_reduce(list_prepend(0.0, list_transform(generate_series(0,${PQ_M - 1}), s ->
         |      list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i ->
         |        ${sq(s"CAST(p.qr[s*$PQ_SUB+i] AS DOUBLE)", s"r.re[s*$PQ_SUB+i]")})),
         |        (u,w) -> u + w))), (u,w) -> u + w), 6) AS adc_dist
         |  FROM qres p
         |  JOIN assign an ON an.cell = p.cell
         |  JOIN recon r ON r.vec_id = an.vec_id AND r.vec_id <> p.query_id)
         |SELECT query_id, rk, neighbor_id, cell, adc_dist FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rk
         |  FROM scored) t WHERE rk <= $LSH_K""".stripMargin
    })

  /** Incremental snapshot audit ([[graft.operators.AuditOps
    * .snapshotDeltaAudit]]) — q97's ingest-time face: a re-crawl DELTA
    * (every third doc, a fifth of those revised, plus genuinely new keys)
    * classified added | changed | unchanged against the persisted
    * (key, hash) index of the previous snapshot, WITHOUT recomputing the
    * snapshot side. The oracle replays the index build, the row-local
    * delta hash (same chr(1)/chr(0) canonicalization as q97), and the
    * left-join classification — so the index/delta hash agreement the
    * incremental contract rests on is itself hash-pinned. */
  private[queries] val q100 = QueryDef(
    "q100_snapshot_delta",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val idx = graft.operators.AuditOps.snapshotHashIndex(
        docs, col("doc_id"), Seq(col("text"), col("source")),
        keyName = "doc_id")
      val delta = docs.where(col("doc_id") % 3 === 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
        .unionAll(docs.where(col("doc_id") % 103 === 0)
          .withColumn("doc_id", col("doc_id") + 20000000L))
      graft.operators.AuditOps.snapshotDeltaAudit(
        delta, idx, col("doc_id"), Seq(col("text"), col("source")),
        keyName = "doc_id")
    }, {
      val h = (t: String) => polyHashSql(
        s"concat_ws(chr(1), coalesce(CAST($t.text AS VARCHAR), chr(0)), " +
          s"coalesce(CAST($t.source AS VARCHAR), chr(0)))")
      s"""WITH dl AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END AS text,
         |    source
         |  FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id + 20000000 AS doc_id, text, source
         |  FROM documents WHERE doc_id % 103 = 0),
         |ih AS (SELECT a.doc_id, ${h("a")} AS snapshot_hash FROM documents a),
         |dh AS (SELECT b.doc_id, ${h("b")} AS delta_hash FROM dl b)
         |SELECT dh.doc_id,
         |  CASE WHEN ih.doc_id IS NULL THEN 'added'
         |       WHEN snapshot_hash <> delta_hash THEN 'changed'
         |       ELSE 'unchanged' END AS status,
         |  snapshot_hash, delta_hash
         |FROM dh LEFT JOIN ih ON dh.doc_id = ih.doc_id""".stripMargin
    })

  /** Incremental semantic screen with BOTH sides in PQ code space
    * ([[PQOps.pqSemanticScreen]] over [[PQOps.pqCellIndex]]) — the q84
    * contract (same delta/corpus split, same cell-local compare, same
    * (vec_id, cell, kept) schema) at the deepest compression tier:
    * ~8 bytes/vector static side, every compare m table gathers, no
    * reconstruction materialized anywhere. The oracle replays raw-vector
    * cell assignment (q84's CTE), the q94 encode chain, reconstructed
    * norms, and the subspace-grouped reconstructed cosine — codebook,
    * table arithmetic, and the keep decision all hash-pinned. */
  private[queries] val q103 = QueryDef(
    "q103_pq_semantic_screen",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.where(col("vec_id") < 8)
      val idx = PQOps.pqCellIndex(
        emb.where(pmod(col("vec_id"), lit(5)) =!= 0), cents, cents,
        col("vec_id"), col("embedding"), PQ_M, PQ_SUB)
      PQOps.pqSemanticScreen(
        emb.where(pmod(col("vec_id"), lit(5)) === 0), idx, cents, cents,
        col("vec_id"), col("embedding"), COSINE_T, PQ_M, PQ_SUB)
    }, {
      def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
      val subDist = (e: String, ce: String, sIdx: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i -> " +
          sq(s"CAST($e[$sIdx*$PQ_SUB+i] AS DOUBLE)",
            s"CAST($ce[$sIdx*$PQ_SUB+i] AS DOUBLE)") + ")), (x,y) -> x + y)"
      val gdot = (x: String, y: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(0,${PQ_M - 1}), s -> " +
          s"list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i -> " +
          s"$x[s*$PQ_SUB+i] * $y[s*$PQ_SUB+i])), (u,w) -> u + w))), (u,w) -> u + w)"
      s"""WITH v AS (SELECT vec_id, embedding AS e,
         |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings),
         |cb AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM v WHERE vec_id < 8),
         |csim AS (
         |  SELECT a.vec_id, c.cid,
         |    CASE WHEN a.nrm * c.cnrm > 0 THEN
         |      round(${dotSql("a.e", "c.ce", DIM)} / (a.nrm * c.cnrm), 6) END AS c_sim
         |  FROM v a CROSS JOIN cb c),
         |assign AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY c_sim DESC NULLS LAST, cid) AS crk FROM csim) t
         |  WHERE crk = 1),
         |dists AS (
         |  SELECT a.vec_id, c.cid, s.s, ${subDist("a.e", "c.ce", "s.s")} AS dist
         |  FROM v a CROSS JOIN cb c CROSS JOIN generate_series(0,${PQ_M - 1}) AS s(s)),
         |codes AS (SELECT vec_id, s, cid AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
         |    FROM dists) t WHERE rk = 1),
         |recon AS (
         |  SELECT d.vec_id, flatten(list(d.sub ORDER BY d.s)) AS re FROM (
         |    SELECT codes.vec_id, codes.s,
         |      list_transform(cb.ce[codes.s*$PQ_SUB+1 : codes.s*$PQ_SUB+$PQ_SUB],
         |        x -> CAST(x AS DOUBLE)) AS sub
         |    FROM codes JOIN cb ON cb.cid = codes.code) d GROUP BY d.vec_id),
         |rn AS (SELECT vec_id, re, sqrt(${gdot("re", "re")}) AS rnrm FROM recon),
         |hits AS (
         |  SELECT DISTINCT dv.vec_id
         |  FROM rn dv
         |  JOIN assign da ON da.vec_id = dv.vec_id AND dv.vec_id % 5 = 0
         |  JOIN assign ca ON ca.cell = da.cell AND ca.vec_id % 5 <> 0
         |  JOIN rn cv ON cv.vec_id = ca.vec_id
         |  WHERE (CASE WHEN dv.rnrm * cv.rnrm > 0
         |    THEN round(${gdot("dv.re", "cv.re")} / (dv.rnrm * cv.rnrm), 6) END)
         |    >= $COSINE_T)
         |SELECT a.vec_id, a.cell, (h.vec_id IS NULL) AS kept
         |FROM assign a LEFT JOIN hits h ON h.vec_id = a.vec_id
         |WHERE a.vec_id % 5 = 0""".stripMargin
    })

  /** Takedown propagation: the deletion list (every 97th doc) expanded to
    * byte-exact mirrors and verified near-duplicates, one row per
    * affected doc with its strongest reason and smallest triggering
    * listed id ([[DedupOps.takedownPropagation]]). The oracle replays the
    * list, the text-equality mirror join, the q32/q33 band-discovery +
    * exact-Jaccard verify chain, and the priority resolution. */
  private[queries] val q104 = QueryDef(
    "q104_takedown_propagation",
    (s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.takedownPropagation(docs,
        docs.where(col("doc_id") % 97 === 0).select("doc_id"),
        col("doc_id"), col("text"), SHINGLE_W, JACCARD_T)
    },
    s"""WITH $sigCte,
       |del AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
       |bands AS (
       |  SELECT doc_id, 0 AS band,
       |    ${bandBucketSql((0 to 3).map(i => s"m$i"))} AS b FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band,
       |    ${bandBucketSql((4 to 7).map(i => s"m$i"))} AS b FROM sig),
       |cand AS (
       |  SELECT DISTINCT x.doc_id, y.doc_id AS src
       |  FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.b = y.b
       |    AND x.doc_id <> y.doc_id
       |  JOIN del ON y.doc_id = del.doc_id),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
       |  FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_id, c.src, CAST(count(*) AS BIGINT) AS n_common
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.doc_id
       |  JOIN sh b ON b.doc_id = c.src AND b.h = a.h
       |  GROUP BY 1, 2),
       |near AS (
       |  SELECT i.doc_id, min(i.src) AS src_id
       |  FROM inter i
       |  JOIN sizes sa ON i.doc_id = sa.doc_id
       |  JOIN sizes sb ON i.src = sb.doc_id
       |  WHERE CAST(n_common AS DOUBLE)
       |    / CAST(sa.n + sb.n - n_common AS DOUBLE) >= $JACCARD_T
       |  GROUP BY 1),
       |ex AS (
       |  SELECT d.doc_id, min(l.doc_id) AS src_id
       |  FROM documents d
       |  JOIN (SELECT doc_id, text FROM documents JOIN del USING (doc_id)) l
       |    ON d.text = l.text AND d.doc_id <> l.doc_id
       |  GROUP BY 1),
       |allr AS (
       |  SELECT doc_id, 'listed' AS reason, doc_id AS src_id, 0 AS pri
       |  FROM del
       |  UNION ALL SELECT doc_id, 'exact_copy', src_id, 1 FROM ex
       |  UNION ALL SELECT doc_id, 'near_dup', src_id, 2 FROM near)
       |SELECT doc_id, reason, src_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY pri, src_id) AS rk FROM allr) t
       |WHERE rk = 1""".stripMargin)

  /** Quantization-drift monitor ([[PQOps.quantizationDrift]]): the PQ
    * codebook's reconstruction error on a drifted delta (every 7th
    * vector OFFSET by +2 per component in single-precision — a region
    * the codebook never saw; float arithmetic is bit-exact cross-engine,
    * the cellResiduals precedent) vs its error on the corpus it
    * represents; the delta row must flag a re-fit (DriftSpec pins the
    * flag). The oracle replays the q94 encode chain on both sides, the
    * subspace-grouped ADC error, the decimal-exact means, and the ratio
    * gate — so the number that triggers production re-fits is itself
    * hash-pinned. */
  private[queries] val q105 = QueryDef(
    "q105_quantization_drift",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      PQOps.quantizationDrift(
        emb,
        emb.where(col("vec_id") % 7 === 0)
          .withColumn("embedding",
            transform(col("embedding"), x => x + lit(2.0f))),
        emb.where(col("vec_id") < PQ_K),
        col("vec_id"), col("embedding"), PQ_M, PQ_SUB)
    }, {
      def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
      val subDist = (e: String, ce: String, sIdx: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i -> " +
          sq(s"CAST($e[$sIdx*$PQ_SUB+i] AS DOUBLE)",
            s"CAST($ce[$sIdx*$PQ_SUB+i] AS DOUBLE)") + ")), (x,y) -> x + y)"
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |cb AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $PQ_K),
         |uni AS (
         |  SELECT 'baseline' AS side, vec_id, e FROM v
         |  UNION ALL
         |  SELECT 'delta', vec_id, list_transform(e, x -> x + CAST(2.0 AS REAL))
         |  FROM v WHERE vec_id % 7 = 0),
         |dists AS (
         |  SELECT u.side, u.vec_id, c.cid, s.s, ${subDist("u.e", "c.ce", "s.s")} AS dist
         |  FROM uni u CROSS JOIN cb c CROSS JOIN generate_series(0,${PQ_M - 1}) AS s(s)),
         |codes AS (SELECT side, vec_id, s, cid AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY side, vec_id, s
         |      ORDER BY dist, cid) AS rk FROM dists) t WHERE rk = 1),
         |recon AS (
         |  SELECT d.side, d.vec_id, flatten(list(d.sub ORDER BY d.s)) AS re FROM (
         |    SELECT codes.side, codes.vec_id, codes.s,
         |      list_transform(cb.ce[codes.s*$PQ_SUB+1 : codes.s*$PQ_SUB+$PQ_SUB],
         |        x -> CAST(x AS DOUBLE)) AS sub
         |    FROM codes JOIN cb ON cb.cid = codes.code) d GROUP BY d.side, d.vec_id),
         |err AS (
         |  SELECT u.side, u.vec_id,
         |    list_reduce(list_prepend(0.0, list_transform(generate_series(0,${PQ_M - 1}), s ->
         |      list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i ->
         |        ${sq(s"CAST(u.e[s*$PQ_SUB+i] AS DOUBLE)", s"r.re[s*$PQ_SUB+i]")})),
         |        (x,y) -> x + y))), (x,y) -> x + y) AS e2
         |  FROM uni u JOIN recon r ON u.side = r.side AND u.vec_id = r.vec_id),
         |st AS (
         |  SELECT side, CAST(count(*) AS BIGINT) AS n,
         |    round(CAST(CAST(SUM(CAST(e2 AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
         |      / count(*), 6) AS mean_err,
         |    round(max(e2), 6) AS max_err
         |  FROM err GROUP BY side)
         |SELECT st.side, st.n, st.mean_err, st.max_err,
         |  CASE WHEN st.side = 'baseline' THEN 1.0
         |       WHEN b.bm > 0 THEN round(st.mean_err / b.bm, 6) END AS err_ratio,
         |  CASE WHEN st.side = 'baseline' THEN FALSE
         |       ELSE coalesce(CASE WHEN b.bm > 0
         |         THEN round(st.mean_err / b.bm, 6) >= 1.5 END, FALSE)
         |  END AS refit
         |FROM st CROSS JOIN
         |  (SELECT mean_err AS bm FROM st WHERE side = 'baseline') b""".stripMargin
    })

  /** Diversity-aware sampling ([[SimilarityOps.diversitySample]]):
    * ~100 vectors drawn with per-cell quotas ∝ √n_cell over the q43
    * cell geometry — head cells downsampled harder, coverage over skew.
    * The oracle replays cell assignment, the decimal-exact weight total,
    * the fixed-order millionth thresholds, and the avalanched id draw —
    * every kept/dropped decision hash-pinned. */
  private[queries] val q106 = QueryDef(
    "q106_diversity_sample",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.diversitySample(emb, emb.where(col("vec_id") < 8),
        col("vec_id"), col("embedding"), 0.5, 100L)
    },
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings),
       |cb AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM v WHERE vec_id < 8),
       |csim AS (
       |  SELECT a.vec_id, c.cid,
       |    CASE WHEN a.nrm * c.cnrm > 0 THEN
       |      round(${dotSql("a.e", "c.ce", DIM)} / (a.nrm * c.cnrm), 6) END AS c_sim
       |  FROM v a CROSS JOIN cb c),
       |assign AS (SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY c_sim DESC NULLS LAST, cid) AS crk FROM csim) t
       |  WHERE crk = 1),
       |cnt AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_cell
       |  FROM assign GROUP BY cell),
       |wt AS (SELECT cell, n_cell, sqrt(CAST(n_cell AS DOUBLE)) AS w FROM cnt),
       |tot AS (SELECT CAST(CAST(SUM(CAST(w AS DECIMAL(28,10))) AS VARCHAR)
       |    AS DOUBLE) AS wtot FROM wt),
       |thr AS (SELECT cell, least(1000000, CAST(floor(
       |    ((100.0 * (w / wtot)) / CAST(n_cell AS DOUBLE)) * 1000000.0)
       |    AS BIGINT)) AS thr FROM wt CROSS JOIN tot)
       |SELECT a.vec_id, a.cell,
       |  (((a.vec_id * 2654435761) % 1000000007) % 1000000) < t.thr AS kept
       |FROM assign a JOIN thr t USING (cell)""".stripMargin)

  /** BPE tokenizer fit ([[BpeOps.bpeLearn]]): 16 merges learned over the
    * corpus word-frequency table — iterative distributed argmax, not
    * SQL-expressible (each rank's pair counts depend on every earlier
    * rewrite) → rows-only driver check; the merge sequence itself is
    * pinned against a hand-computed Sennrich fixture in BpeSpec, and the
    * greedy rewrite + round-trip contracts are spec-gated there. */
  private[queries] val q107 = QueryDef(
    "q107_bpe_merges",
    (s, d) => graft.operators.BpeOps.bpeLearn(
      graft.operators.BpeOps.wordFreqs(Tables.documents(s, d), col("text")),
      16),
    None)

  /** Source-interleaved training order ([[TextOps.interleavedOrder]]):
    * round-robin across sources, shuffled within each — same-source runs
    * impossible until sources exhaust. The oracle replays the avalanched
    * draw, the per-source rank window, and the closed-form position
    * (rounds-before + within-round slot) relationally — the exact
    * permutation is hash-pinned. */
  private[queries] val q108 = QueryDef(
    "q108_interleaved_order",
    (s, d) => TextOps.interleavedOrder(
      Tables.documents(s, d), col("doc_id"), col("text"), col("source")),
    s"""WITH ranked AS (
       |  SELECT doc_id, source,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
       |      AS BIGINT) AS r
       |  FROM (SELECT doc_id, source,
       |      ((((${polyHashSql("text")} * 31 + doc_id) % $P + $P) % $P)
       |        * 2654435761) % $P AS k
       |    FROM documents) t),
       |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n
       |  FROM documents GROUP BY source)
       |SELECT x.doc_id, x.source, x.r AS rank_in_source,
       |  CAST(sum(least(c.n, x.r - 1))
       |    + sum(CASE WHEN c.source < x.source AND c.n >= x.r
       |        THEN 1 ELSE 0 END) + 1 AS BIGINT) AS global_pos
       |FROM ranked x CROSS JOIN cnt c
       |GROUP BY x.doc_id, x.source, x.r""".stripMargin)

  /** OPQ-lite: PQ search over the VARIANCE-BALANCED dimension permutation
    * ([[PQOps.balancedPermutation]] — the rotation-free eigenvalue-
    * allocation heuristic) — q94's exact chain with every vector, query,
    * and codebook entry permuted first. The oracle replays the
    * decimal-exact per-dim variances, the (var desc, dim) ranking, the
    * round-robin dealing, the permuted gather, and the whole q94
    * encode/search chain — so the permutation itself (the learned part)
    * is hash-pinned; the distortion WIN over the contiguous split is
    * PQSpec's job (it needs learned codebooks and a skewed corpus). */
  private[queries] val q109 = QueryDef(
    "q109_pq_permuted",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val vars = PQOps.dimVariances(emb, col("embedding"), DIM)
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
      val perm = PQOps.balancedPermutation(vars, PQ_M, PQ_SUB)
      val embP = emb.select(col("vec_id"),
        PQOps.permuteExpr(col("embedding"), perm).as("embedding"))
      PQOps.pqTopK(
        PQOps.pqIndex(embP, embP.where(col("vec_id") < PQ_K),
          col("vec_id"), col("embedding"), PQ_M, PQ_SUB),
        embP.where(col("vec_id") < 10), col("vec_id"), col("embedding"),
        LSH_K, PQ_SUB)
    }, {
      def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
      val subDist = (e: String, ce: String, sIdx: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i -> " +
          sq(s"CAST($e[$sIdx*$PQ_SUB+i] AS DOUBLE)",
            s"CAST($ce[$sIdx*$PQ_SUB+i] AS DOUBLE)") + ")), (x,y) -> x + y)"
      s"""WITH v0 AS (SELECT vec_id, embedding AS e FROM embeddings),
         |ux AS (SELECT t.i AS dim, CAST(e[t.i] AS DOUBLE) AS x
         |  FROM v0, UNNEST(generate_series(1, $DIM)) AS t(i)),
         |vars AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
         |    CAST(CAST(SUM(CAST(x AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS s1,
         |    CAST(CAST(SUM(CAST(x*x AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS s2
         |  FROM ux GROUP BY dim),
         |vr AS (SELECT dim, (s2 - s1*s1/n)/n AS var FROM vars),
         |perm AS (SELECT dim,
         |    CAST(row_number() OVER (ORDER BY var DESC, dim) - 1 AS BIGINT) AS rk
         |  FROM vr),
         |pmap AS (SELECT ((rk % $PQ_M) * $PQ_SUB + rk // $PQ_M + 1) AS outpos,
         |    dim AS srcdim FROM perm),
         |v AS (SELECT v0.vec_id, list(e[p.srcdim] ORDER BY p.outpos) AS e
         |  FROM v0 CROSS JOIN pmap p GROUP BY v0.vec_id),
         |cb AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $PQ_K),
         |dists AS (
         |  SELECT a.vec_id, c.cid, s.s, ${subDist("a.e", "c.ce", "s.s")} AS dist
         |  FROM v a CROSS JOIN cb c CROSS JOIN generate_series(0,${PQ_M - 1}) AS s(s)),
         |codes AS (SELECT vec_id, s, cid AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
         |    FROM dists) t WHERE rk = 1),
         |recon AS (
         |  SELECT d.vec_id, flatten(list(d.sub ORDER BY d.s)) AS re FROM (
         |    SELECT codes.vec_id, codes.s,
         |      list_transform(cb.ce[codes.s*$PQ_SUB+1 : codes.s*$PQ_SUB+$PQ_SUB],
         |        x -> CAST(x AS DOUBLE)) AS sub
         |    FROM codes JOIN cb ON cb.cid = codes.code) d GROUP BY d.vec_id),
         |scored AS (
         |  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
         |    round(list_reduce(list_prepend(0.0, list_transform(generate_series(0,${PQ_M - 1}), s ->
         |      list_reduce(list_prepend(0.0, list_transform(generate_series(1,$PQ_SUB), i ->
         |        ${sq(s"CAST(q.e[s*$PQ_SUB+i] AS DOUBLE)", s"r.re[s*$PQ_SUB+i]")})),
         |        (u,w) -> u + w))), (u,w) -> u + w), 6) AS adc_dist
         |  FROM v q JOIN recon r ON q.vec_id < 10 AND r.vec_id <> q.vec_id)
         |SELECT query_id, rk, neighbor_id, adc_dist FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rk
         |  FROM scored) t WHERE rk <= $LSH_K""".stripMargin
    })
}
