package graft.queries
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextHash._
import graft.operators.{DedupOps, MultimodalOps, PQOps, RetrievalOps, SimilarityOps, TextOps}
import graft.queries.PipelineShared._

/** Pipeline band (r17 verdict item 7 split): dedup, near-dup, text quality, sampling, packing, containment (q30-q81).
  * Blocks moved verbatim from the former monolithic Pipeline
  * object; helpers live in [[PipelineShared]]. */
private[queries] object PipelineBandDedupText {

  // ----------------------------------------------------------------- dedup

  private[queries] val q30 = QueryDef(
    "q30_dedup_exact",
    (s, d) => DedupOps.exactDedupStats(
      Tables.documents(s, d), col("lang"), col("text")),
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
      |  CAST(count(DISTINCT text) AS BIGINT) AS n_unique
      |FROM documents GROUP BY lang""".stripMargin)

  private[queries] val q31 = QueryDef(
    "q31_minhash_signatures",
    (s, d) => DedupOps.minhashSignatures(
      Tables.documents(s, d), col("doc_id"), col("text"), SHINGLE_W),
    s"""WITH $sigCte
       |SELECT * FROM sig""".stripMargin)

  private[queries] val q32 = QueryDef(
    "q32_lsh_candidate_pairs",
    (s, d) => DedupOps.lshCandidatePairs(DedupOps.minhashSignatures(
      Tables.documents(s, d), col("doc_id"), col("text"), SHINGLE_W)),
    s"""WITH $sigCte,
       |bands AS (
       |  SELECT doc_id, 0 AS band,
       |    ${bandBucketSql((0 to 3).map(i => s"m$i"))} AS b FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band,
       |    ${bandBucketSql((4 to 7).map(i => s"m$i"))} AS b FROM sig)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.b = y.b AND x.doc_id < y.doc_id""".stripMargin)

  private[queries] val q33 = QueryDef(
    "q33_jaccard_pairs",
    (s, d) => DedupOps.jaccardOnCandidates(
      Tables.documents(s, d), col("doc_id"), col("text"), SHINGLE_W, JACCARD_T),
    s"""WITH $jaccardPairsCtes
       |SELECT doc_a, doc_b, n_common, jaccard FROM jp""".stripMargin)

  private[queries] val q34 = QueryDef(
    "q34_simhash",
    (s, d) => DedupOps.simhash(Tables.documents(s, d), col("doc_id"), col("text")),
    {
      val sums = (0 until 16)
        .map(j => s"SUM(CASE WHEN (h >> $j) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
        .mkString(", ")
      val bits = (0 until 16)
        .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH words AS (
         |  SELECT DISTINCT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
         |hashes AS (SELECT doc_id, ${polyHashSql("w")} AS h FROM words),
         |sums AS (SELECT doc_id, $sums FROM hashes GROUP BY doc_id)
         |SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM sums""".stripMargin
    })

  // ------------------------------------------------------------ similarity

  private[queries] val q35 = QueryDef(
    "q35_cosine_neardup",
    (s, d) => SimilarityOps.cosinePairs(
      Tables.embeddings(s, d), col("vec_id"), col("embedding"), COSINE_T),
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings)
       |SELECT vec_a, vec_b, cos_sim FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    CASE WHEN a.nrm * b.nrm > 0 THEN round(${dotSql("a.e", "b.e", DIM)} / (a.nrm * b.nrm), 6) END AS cos_sim
       |  FROM v a JOIN v b ON a.vec_id < b.vec_id
       |) t WHERE cos_sim >= $COSINE_T""".stripMargin)

  /** Near-dup pair discovery via multi-table sign-LSH — q35's scale path:
    * bucket-equality hash self-joins (PlanSpec asserts no nested-loop join)
    * instead of the all-pairs theta join. 4 tables × 4 sign bits over
    * disjoint component ranges (recall ≈ 1-(1-p)⁴, p = (1-θ/π)^bits). */
  private[queries] val q46 = QueryDef(
    "q46_cosine_neardup_bucketed",
    (s, d) => SimilarityOps.cosinePairsBucketed(
      Tables.embeddings(s, d), col("vec_id"), col("embedding"), COSINE_T,
      LSH_BITS, LSH_TABLES),
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings),
       |b AS (
       |  ${(0 until LSH_TABLES).map(t =>
            s"SELECT vec_id, $t AS tbl, " +
              s"${signBucketAtSql("e", LSH_BITS, t * LSH_BITS)} AS bucket FROM v")
            .mkString("\n  UNION ALL\n  ")}),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM b x JOIN b y
       |    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
       |SELECT vec_a, vec_b, cos_sim FROM (
       |  SELECT c.vec_a, c.vec_b,
       |    CASE WHEN a.nrm * b.nrm > 0 THEN round(${dotSql("a.e", "b.e", DIM)} / (a.nrm * b.nrm), 6) END AS cos_sim
       |  FROM cand c
       |  JOIN v a ON c.vec_a = a.vec_id
       |  JOIN v b ON c.vec_b = b.vec_id
       |) t WHERE cos_sim >= $COSINE_T""".stripMargin)

  private[queries] val q36 = QueryDef(
    "q36_ann_brute_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.bruteForceTopK(
        emb, emb.where(col("vec_id") < 10), col("vec_id"), col("embedding"),
        ANN_K)
    },
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CASE WHEN q.nrm * c.nrm > 0 THEN round(${dotSql("q.e", "c.e", DIM)} / (q.nrm * c.nrm), 6) END AS cos_sim
       |  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
       |SELECT query_id, rk, neighbor_id, cos_sim FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM scored
       |) t WHERE rk <= $ANN_K""".stripMargin)

  private[queries] val q37 = QueryDef(
    "q37_ann_lsh_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.lshTopK(
        emb, emb.where(col("vec_id") < 10), col("vec_id"), col("embedding"),
        LSH_BITS, LSH_K)
    },
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm,
       |    ${signBucketSql("embedding", LSH_BITS)} AS bucket FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.bucket,
       |    CASE WHEN q.nrm * c.nrm > 0 THEN round(${dotSql("q.e", "c.e", DIM)} / (q.nrm * c.nrm), 6) END AS cos_sim
       |  FROM v q JOIN v c
       |    ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id)
       |SELECT query_id, rk, neighbor_id, bucket, cos_sim FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM scored
       |) t WHERE rk <= $LSH_K""".stripMargin)

  /** IVF-style ANN: coarse-quantize to the highest-cosine centroid (first 8
    * vectors as a deterministic centroid set), search within the cell. */
  private[queries] val q43 = QueryDef(
    "q43_ann_ivf_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.ivfTopK(
        emb, emb.where(col("vec_id") < 10), emb.where(col("vec_id") < 8),
        col("vec_id"), col("embedding"), LSH_K)
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
       |scored AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, an.cell,
       |    CASE WHEN q.nrm * n.nrm > 0 THEN round(${dotSql("q.e", "n.e", DIM)} / (q.nrm * n.nrm), 6) END AS cos_sim
       |  FROM v q
       |  JOIN assign aq ON q.vec_id = aq.vec_id AND q.vec_id < 10
       |  JOIN assign an ON an.cell = aq.cell
       |  JOIN v n ON n.vec_id = an.vec_id AND n.vec_id <> q.vec_id)
       |SELECT query_id, rk, neighbor_id, cell, cos_sim FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM scored
       |) t WHERE rk <= $LSH_K""".stripMargin)

  private[queries] val q51 = QueryDef(
    "q51_dedup_clusters",
    (s, d) => DedupOps.dedupClusters(
      DedupOps.lshCandidatePairs(DedupOps.minhashSignatures(
        Tables.documents(s, d), col("doc_id"), col("text"), SHINGLE_W)),
      "doc_a", "doc_b"),
    s"""WITH RECURSIVE $clusterChainCtes
       |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       |FROM reach GROUP BY a""".stripMargin)
  private[queries] val q52 = QueryDef(
    "q52_stratified_sample",
    (s, d) => TextOps.stratifiedSample(
      Tables.documents(s, d), col("doc_id"), col("text"), col("lang"),
      SampleFractions.toMap),
    s"""SELECT doc_id, lang AS stratum
       |FROM (SELECT doc_id, lang,
       |        ${sampleBucketSql(polyHashSql("text"), 10000)} AS bkt
       |      FROM documents) t
       |WHERE bkt < CASE lang ${SampleFractions.map { case (k, f) =>
          s"WHEN '$k' THEN ${math.round(f * 10000)}" }.mkString(" ")}
       | ELSE 0 END""".stripMargin)

  /** Corpus-level vocabulary: top-k words by document frequency. */
  private[queries] val q53 = QueryDef(
    "q53_vocabulary",
    (s, d) => TextOps.vocabulary(
      Tables.documents(s, d), col("doc_id"), col("text"), 20),
    """SELECT word,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
      |  CAST(count(*) AS BIGINT) AS term_freq
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |      FROM documents) t
      |GROUP BY word
      |ORDER BY doc_freq DESC, word
      |LIMIT 20""".stripMargin)

  /** Row-local repetition/boilerplate screen over the documents table. */
  private[queries] val q49 = QueryDef(
    "q49_repetition_score",
    (s, d) => TextOps.repetitionScore(
      Tables.documents(s, d), col("doc_id"), col("text")),
    """SELECT doc_id,
      |  CAST(len(ws) AS BIGINT) AS n_words,
      |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
      |  1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dup_word_ratio,
      |  CAST(list_max(list_transform(list_distinct(ws),
      |    w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE) / len(ws) AS top_word_ratio
      |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t""".stripMargin)

  /** PII pattern counts; the synthetic corpus contains none (all-zero
    * output still hash-gates the cross-engine regex/count plumbing), and
    * the patterns' match behavior is unit-tested on a fixture with real
    * emails/phones/URLs (PipelineOpsSpec). */
  private[queries] val q50 = QueryDef(
    "q50_pii_scan",
    (s, d) => TextOps.piiScan(
      Tables.documents(s, d), col("doc_id"), col("text")),
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '${TextOps.EmailRe}')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '${TextOps.PhoneRe}')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(text, '${TextOps.UrlRe}')) AS BIGINT) AS n_urls
       |FROM documents""".stripMargin)

  /** IVF with LEARNED centroids (deterministic-seed k-means over the
    * corpus) — the IVF-real production shape: learned cells track the data
    * distribution where q43's fixed-sample quantizer is arbitrary.
    * Recall@k of learned vs fixed is measured in PipelineOpsSpec.
    * Full oracle since r14 (the q134 frozen-model pattern): the k-means
    * fit itself is not SQL-expressible, but the fitted centroids are
    * FROZEN BYTES — the oracle thunk embeds them as a VALUES table at
    * dump time and DuckDB independently replays the distributed half
    * (cosine cell assignment, nProbe probing, in-cell top-k) with the
    * same left-fold dot products, so the ASSIGNMENT and SEARCH
    * semantics are hash-gated even though the fit stays a Spark ML
    * concern. */
  private[queries] val q48 = QueryDef(
    "q48_ann_ivf_learned",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.ivfTopK(
        emb, emb.where(col("vec_id") < 10),
        CentroidMemo.frame(s, d, 8),
        col("vec_id"), col("embedding"), LSH_K, nProbe = 2)
    },
    Some(() => {
      s"""WITH v AS (SELECT vec_id, embedding AS e,
         |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm
         |  FROM embeddings),
         |${centroidValuesCte(8)},
         |asgc AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT a.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY (CASE WHEN a.nrm * c.cnrm > 0
         |          THEN round(${dotSql("a.e", "c.ce", DIM)}
         |            / (a.nrm * c.cnrm), 6) END) DESC,
         |        c.cid) AS crk
         |    FROM v a CROSS JOIN cents c) t WHERE crk = 1),
         |asgq AS (SELECT vec_id, cid AS qcell FROM (
         |    SELECT a.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY (CASE WHEN a.nrm * c.cnrm > 0
         |          THEN round(${dotSql("a.e", "c.ce", DIM)}
         |            / (a.nrm * c.cnrm), 6) END) DESC,
         |        c.cid) AS crk
         |    FROM v a CROSS JOIN cents c WHERE a.vec_id < 10) t
         |  WHERE crk <= 2),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, an.cell,
         |    CASE WHEN q.nrm * n.nrm > 0
         |      THEN round(${dotSql("q.e", "n.e", DIM)}
         |        / (q.nrm * n.nrm), 6) END AS cos_sim
         |  FROM v q
         |  JOIN asgq aq ON q.vec_id = aq.vec_id
         |  JOIN asgc an ON an.cell = aq.qcell
         |  JOIN v n ON n.vec_id = an.vec_id AND n.vec_id <> q.vec_id)
         |SELECT query_id, rk, neighbor_id, cell, cos_sim FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id)
         |    AS BIGINT) AS rk
         |  FROM scored
         |) t WHERE rk <= $LSH_K""".stripMargin
    }))

  // ------------------------------------------------------------------ text

  private[queries] val q38 = QueryDef(
    "q38_langid",
    (s, d) => TextOps.langId(Tables.documents(s, d), col("doc_id"), col("text")),
    {
      val scores = TextOps.LangProfiles.map { case (lang, stop) =>
        val list = stop.map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(ws, w -> list_contains($list, w))) AS DOUBLE)" +
          s" / CAST(len(ws) AS DOUBLE) AS score_$lang"
      }.mkString(",\n  ")
      val best = TextOps.LangProfiles.map(p => s"score_${p._1}")
        .mkString("greatest(", ", ", ")")
      val pred = TextOps.LangProfiles.map { case (lang, _) =>
        s"WHEN score_$lang = best AND best > 0 THEN '$lang'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |scored AS (SELECT doc_id,
         |  $scores
         |FROM words),
         |wb AS (SELECT *, $best AS best FROM scored)
         |SELECT doc_id, score_en, score_de, score_es, score_fr,
         |  $pred AS pred_lang
         |FROM wb""".stripMargin
    })

  private[queries] val q39 = QueryDef(
    "q39_quality_score",
    (s, d) => TextOps.qualityScore(Tables.documents(s, d), col("doc_id"), col("text")),
    {
      val allStop = TextOps.LangProfiles.flatMap(_._2).distinct
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH base AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS n_words,
         |    CAST(length(text) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS avg_word_len,
         |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         |      / CAST(length(text) AS DOUBLE) AS digit_ratio,
         |    CAST(len(list_filter(ws, w -> list_contains($allStop, w))) AS DOUBLE)
         |      / CAST(len(ws) AS DOUBLE) AS stopword_ratio
         |  FROM base)
         |SELECT doc_id, n_words, avg_word_len, digit_ratio, stopword_ratio,
         |  0.5 * stopword_ratio
         |    + 0.3 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
         |    + 0.2 * (1.0 - digit_ratio) AS quality_score
         |FROM m""".stripMargin
    })

  private[queries] val q40 = QueryDef(
    "q40_token_counts",
    (s, d) => TextOps.tokenCounts(Tables.documents(s, d), col("doc_id"), col("text")),
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens,
      |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS n_bpe_est
      |FROM documents""".stripMargin)

  private[queries] val q41 = QueryDef(
    "q41_fingerprint",
    (s, d) => TextOps.fingerprint(Tables.documents(s, d), col("doc_id"), col("text")),
    s"""SELECT doc_id, ${polyHashSql("text")} AS fingerprint
       |FROM documents""".stripMargin)

  // ------------------------------------------------------------ multimodal

  private[queries] val q42 = QueryDef(
    "q42_multimodal_metadata",
    (s, d) => MultimodalOps.mediaMetadata(
      Tables.documents(s, d), col("doc_id"), col("text")),
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS content_md5,
      |  md5(substr(text, 1, 16)) AS frame_md5
      |FROM documents""".stripMargin)

  /** Deterministic hash-based train/val/test split, summarized per
    * (lang, split). Content-hash bucketing beats RNG sampling at scale:
    * reproducible across runs/partitionings/engines — which is also what
    * makes it oracle-able at all. */
  private[queries] val q45 = QueryDef(
    "q45_train_split",
    (s, d) => TextOps.hashSplit(Tables.documents(s, d), col("doc_id"),
        col("text"), keep = Seq(col("lang")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n")),
    s"""SELECT lang,
       |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM (SELECT lang, ${polyHashSql("text")} % 100 AS b FROM documents) t
       |GROUP BY 1, 2""".stripMargin)
  private[queries] val q54 = QueryDef(
    "q54_pack_sequences",
    (s, d) => TextOps.packSequences(
      Tables.documents(s, d), col("doc_id"), col("text"), PackBudget),
    s"""WITH t AS (SELECT doc_id,
       |    CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS toks
       |  FROM documents),
       |c AS (SELECT doc_id, toks,
       |    sum(toks) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS strt
       |  FROM t)
       |SELECT CAST(strt // $PackBudget AS BIGINT) AS chunk_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(toks) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1""".stripMargin)
  private[queries] val q55 = QueryDef(
    "q55_contamination",
    (s, d) => TextOps.contamination(
      Tables.documents(s, d), col("doc_id"), col("text"), ContamW),
    s"""WITH ${shingleCteW(ContamW)},
       |spl AS (SELECT doc_id,
       |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT doc_id, ${polyHashSql("text")} % 100 AS b FROM documents) t),
       |tr AS (SELECT DISTINCT h FROM sh JOIN spl ON sh.doc_id = spl.doc_id
       |  WHERE split = 'train'),
       |te AS (SELECT sh.doc_id, sh.h FROM sh JOIN spl ON sh.doc_id = spl.doc_id
       |  WHERE split = 'test')
       |SELECT te.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(count(tr.h) AS BIGINT) AS n_in_train,
       |  CAST(count(tr.h) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination
       |FROM te LEFT JOIN tr ON te.h = tr.h
       |GROUP BY te.doc_id""".stripMargin)

  /** Per-source curation audit over documents.source. */
  private[queries] val q56 = QueryDef(
    "q56_source_stats",
    (s, d) => TextOps.sourceStats(
      Tables.documents(s, d), col("source"), col("text"), col("n_chars")),
    {
      s"""WITH base AS (
         |  SELECT source, text, n_chars, string_split(text, ' ') AS ws FROM documents),
         |m AS (SELECT source, text, n_chars,
         |    $qualityCompositeSql AS q
         |  FROM base)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT text) AS BIGINT) AS n_unique_texts,
         |  1.0 - CAST(count(DISTINCT text) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_ratio,
         |  avg(n_chars) AS avg_chars,
         |  round(avg(q), 6) AS avg_quality
         |FROM m GROUP BY source""".stripMargin
    })
  private[queries] val q57 = QueryDef(
    "q57_tfidf_topk",
    (s, d) => TextOps.tfidfTopK(
      Tables.documents(s, d), col("doc_id"), col("text"), TfidfK),
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2),
       |dfreq AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM w GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |s AS (SELECT doc_id, word, tf, df,
       |    round(tf * ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)), 6) AS tfidf
       |  FROM tf JOIN dfreq USING (word) CROSS JOIN n)
       |SELECT doc_id, rk, word, tf, df, tfidf FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY doc_id ORDER BY tfidf DESC, word) AS BIGINT) AS rk FROM s
       |) t WHERE rk <= $TfidfK""".stripMargin)

  /** Embedding-space class statistics per embeddings.label. */
  private[queries] val q58 = QueryDef(
    "q58_label_stats",
    (s, d) => SimilarityOps.labelStats(
      Tables.embeddings(s, d), col("label"), col("embedding"), DIM),
    s"""WITH v AS (SELECT label, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings),
       |comp AS (SELECT label, i, round(avg(CAST(e[i] AS DOUBLE)), 6) AS c
       |  FROM v, UNNEST(generate_series(1, $DIM)) AS t(i)
       |  GROUP BY 1, 2),
       |cent AS (SELECT label, list(c ORDER BY i) AS ce FROM comp GROUP BY label),
       |j AS (SELECT v.label, v.nrm,
       |    sqrt(${dotSql("ce", "ce", DIM)}) AS cnrm,
       |    ${dotSql("e", "ce", DIM)} AS d
       |  FROM v JOIN cent ON v.label = cent.label)
       |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       |  round(avg(nrm), 6) AS avg_norm,
       |  round(avg(CASE WHEN nrm * cnrm > 0 THEN round(d / (nrm * cnrm), 6) END), 6) AS avg_cos_centroid
       |FROM j GROUP BY label""".stripMargin)
  private[queries] val q59 = QueryDef(
    "q59_simhash_pairs",
    (s, d) => DedupOps.simhashPairs(
      DedupOps.simhash(Tables.documents(s, d), col("doc_id"), col("text"),
        SimhashBits), bits = SimhashBits)
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"),
        // per-pair AVALANCHED hash, then sum: a plain linear sum
        // (31·a + b) collides across different pair sets, letting
        // divergent engines agree by accident
        sum(pmod(pmod(pmod(col("doc_a"), lit(P)) * lit(1000003L)
          + col("doc_b"), lit(P)) * lit(2654435761L), lit(P)))
          .as("pair_checksum")),
    {
      val bandBits = SimhashBits / 4
      val mask = (1L << bandBits) - 1
      val sums = (0 until SimhashBits)
        .map(j => s"SUM(CASE WHEN (h >> $j) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
        .mkString(", ")
      val bits = (0 until SimhashBits)
        .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH words AS (
         |  SELECT DISTINCT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
         |hashes AS (SELECT doc_id, ${polyHashSql("w")} AS h FROM words),
         |sums AS (SELECT doc_id, $sums FROM hashes GROUP BY doc_id),
         |s AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM sums),
         |bands AS (SELECT doc_id, simhash, b, (simhash >> (b * $bandBits)) & $mask AS v
         |  FROM s, UNNEST(generate_series(0, 3)) AS t(b)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
         |pairs AS (
         |  SELECT doc_a, doc_b,
         |    CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
         |  FROM cand
         |  JOIN s sa ON doc_a = sa.doc_id
         |  JOIN s sb ON doc_b = sb.doc_id
         |  WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3)
         |SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(((((doc_a % $P) * 1000003 + doc_b) % $P) * 2654435761) % $P) AS BIGINT) AS pair_checksum
         |FROM pairs GROUP BY hamming""".stripMargin
    })

  /** Cumulative curation-funnel survivor counts (one pass, 5 rows). */
  private[queries] val q60 = QueryDef(
    "q60_filter_funnel",
    (s, d) => TextOps.filterFunnel(
      Tables.documents(s, d), col("doc_id"), col("text")),
    {
      val piiFree = Seq(TextOps.EmailRe, TextOps.PhoneRe, TextOps.UrlRe)
        .map(re => s"len(regexp_extract_all(text, '$re')) = 0")
        .mkString("(", " AND ", ")")
      s"""WITH base AS (
         |  SELECT text, string_split(text, ' ') AS ws FROM documents),
         |m AS (SELECT
         |    len(ws) >= ${TextOps.DefaultMinWords} AS p1,
         |    1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE) <= ${TextOps.DefaultMaxDupRatio} AS p2,
         |    $qualityCompositeSql >= ${TextOps.DefaultMinQuality} AS p3,
         |    $piiFree AS p4
         |  FROM base),
         |f AS (SELECT CAST(count(*) AS BIGINT) AS s0,
         |    CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         |    CAST(sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         |    CAST(sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
         |  FROM m)
         |SELECT 0 AS stage_idx, 'input' AS stage, s0 AS n_surviving FROM f
         |UNION ALL SELECT 1, 'min_words', s1 FROM f
         |UNION ALL SELECT 2, 'max_dup_ratio', s2 FROM f
         |UNION ALL SELECT 3, 'min_quality', s3 FROM f
         |UNION ALL SELECT 4, 'pii_free', s4 FROM f""".stripMargin
    })

  /** Incremental (delta-vs-corpus) dedup — the ingest-time production
    * shape: the new batch (doc_id ≡ 0 mod 10 here) is screened against the
    * existing corpus's LSH band buckets; survivors are appended. The corpus
    * side takes PRECOMPUTED signatures, so a real deployment maintains the
    * index incrementally instead of re-shingling 100 TB per batch. */
  private[queries] val q61 = QueryDef(
    "q61_incremental_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d)
      def sig(side: org.apache.spark.sql.DataFrame) =
        DedupOps.minhashSignatures(side, col("doc_id"), col("text"), SHINGLE_W)
      DedupOps.incrementalDedup(
        sig(docs.where(col("doc_id") % 10 === 0)),
        sig(docs.where(col("doc_id") % 10 =!= 0)))
    },
    s"""WITH $sigCte,
       |bands AS (
       |  SELECT doc_id, 0 AS band,
       |    ${bandBucketSql((0 to 3).map(i => s"m$i"))} AS b FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band,
       |    ${bandBucketSql((4 to 7).map(i => s"m$i"))} AS b FROM sig),
       |hit AS (
       |  SELECT DISTINCT x.doc_id
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.b = y.b AND y.doc_id % 10 <> 0
       |  WHERE x.doc_id % 10 = 0)
       |SELECT sig.* FROM sig ANTI JOIN hit ON sig.doc_id = hit.doc_id
       |WHERE sig.doc_id % 10 = 0""".stripMargin)

  /** Cross-doc duplicate n-gram coverage — the passage-level boilerplate
    * screen (docs unique as pages but assembled from shared shingles). */
  private[queries] val q62 = QueryDef(
    "q62_dup_ngram_coverage",
    (s, d) => TextOps.dupNgramCoverage(
      Tables.documents(s, d), col("doc_id"), col("text"), SHINGLE_W),
    s"""WITH $shingleCte,
       |hd AS (SELECT h, CAST(count(*) AS BIGINT) AS nd FROM sh GROUP BY h)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
       |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS dup_coverage
       |FROM sh JOIN hd USING (h)
       |GROUP BY doc_id""".stripMargin)

  /** Quality-aware cluster representatives: per near-dup cluster, keep the
    * highest-[[TextOps.qualityComposite]] member (smallest id on rounded
    * ties) — what a real pipeline keeps, vs q51's arbitrary smallest id. */
  private[queries] val q63 = QueryDef(
    "q63_keep_best",
    (s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.keepBestInCluster(
        docs, col("doc_id"), TextOps.qualityComposite(col("text")),
        DedupOps.dedupClusters(
          DedupOps.lshCandidatePairs(DedupOps.minhashSignatures(
            docs, col("doc_id"), col("text"), SHINGLE_W)),
          "doc_a", "doc_b"))
    },
    s"""WITH RECURSIVE $sigCte,
       |bands AS (
       |  SELECT doc_id, 0 AS band,
       |    ${bandBucketSql((0 to 3).map(i => s"m$i"))} AS b FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band,
       |    ${bandBucketSql((4 to 7).map(i => s"m$i"))} AS b FROM sig),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.b = y.b AND x.doc_id < y.doc_id),
       |und AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM und
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
       |labels AS (
       |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       |  FROM reach GROUP BY a),
       |q AS (SELECT doc_id, round($qualityCompositeSql, 6) AS q
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents) b0),
       |r AS (SELECT l.cluster_id, l.doc_id, q.q,
       |    row_number() OVER (PARTITION BY l.cluster_id
       |      ORDER BY q.q DESC, l.doc_id) AS rk
       |  FROM labels l JOIN q USING (doc_id))
       |SELECT cluster_id,
       |  CAST(count(*) AS BIGINT) AS n_members,
       |  max(CASE WHEN rk = 1 THEN doc_id END) AS keep_id,
       |  max(CASE WHEN rk = 1 THEN q END) AS keep_quality
       |FROM r GROUP BY cluster_id""".stripMargin)
  private[queries] val q64 = QueryDef(
    "q64_corpus_mix",
    (s, d) => TextOps.corpusMix(
      Tables.documents(s, d), col("doc_id"), col("text"), col("source"),
      MixWeights.toMap, MixBudget),
    {
      val totalW = MixWeights.map(_._2).sum
      val vals = MixWeights.map { case (k, w) =>
        s"('$k', CAST($w AS BIGINT))" }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS toks,
         |    ${sampleBucketSql(polyHashSql("text"), 1000000)} AS bkt
         |  FROM documents),
         |a AS (SELECT source, CAST(sum(toks) AS BIGINT) AS avail FROM t GROUP BY source),
         |wt(source, w) AS (VALUES $vals),
         |thr AS (SELECT a.source,
         |    least(w * $MixBudget * 1000000 // ($totalW * avail),
         |      CAST(1000000 AS BIGINT)) AS thr
         |  FROM a JOIN wt USING (source))
         |SELECT t.source,
         |  CAST(count(*) AS BIGINT) AS n_docs_kept,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens_kept,
         |  max(thr) AS keep_millionths
         |FROM t JOIN thr ON t.source = thr.source
         |WHERE bkt < thr
         |GROUP BY t.source""".stripMargin
    })
  private[queries] val q65 = QueryDef(
    "q65_chunk_docs",
    (s, d) => TextOps.chunkDocs(
      Tables.documents(s, d), col("doc_id"), col("text"), ChunkW, ChunkStride),
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
       |c AS (SELECT doc_id, ws, n, i AS chunk_idx
       |  FROM t, UNNEST(generate_series(0, (n - 1) // $ChunkStride)) AS u(i))
       |SELECT doc_id, chunk_idx,
       |  least($ChunkW, n - chunk_idx * $ChunkStride) AS n_chunk_words,
       |  ${polyHashSql(
           s"array_to_string(ws[chunk_idx * $ChunkStride + 1 : " +
             s"chunk_idx * $ChunkStride + $ChunkW], ' ')")} AS chunk_hash
       |FROM c""".stripMargin)

  /** Unigram-LM cross-entropy quality signal ([[TextOps.lmScore]]):
    * per-word surprisals rounded then summed as DECIMAL so the per-doc sum
    * is order-independent and engine-exact. */
  private[queries] val q66 = QueryDef(
    "q66_lm_score",
    (s, d) => TextOps.lmScore(Tables.documents(s, d), col("doc_id"), col("text")),
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |cnt AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
       |tot AS (SELECT sum(cnt) AS tot FROM cnt),
       |wlp AS (SELECT word,
       |    CAST(round(ln(CAST(tot AS DOUBLE) / CAST(cnt AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) AS lp
       |  FROM cnt CROSS JOIN tot),
       |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    sum(lp) AS s
       |  FROM w JOIN wlp USING (word) GROUP BY doc_id)
       |SELECT doc_id, n_tokens,
       |  round(CAST(s AS DOUBLE) / n_tokens, 6) AS cross_entropy
       |FROM d""".stripMargin)

  /** PII redaction ([[TextOps.piiRedact]]) — q50's transform counterpart;
    * the synthetic corpus holds no PII (fingerprints gate the cross-engine
    * replace chain; match behavior is fixture-tested in PipelineOpsSpec). */
  private[queries] val q67 = QueryDef(
    "q67_pii_redact",
    (s, d) => TextOps.piiRedact(Tables.documents(s, d), col("doc_id"), col("text")),
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '${TextOps.EmailRe}'))
       |    + len(regexp_extract_all(text, '${TextOps.PhoneRe}'))
       |    + len(regexp_extract_all(text, '${TextOps.UrlRe}')) AS BIGINT)
       |    AS n_redactions,
       |  CAST(length(r) AS BIGINT) AS redacted_len,
       |  ${polyHashSql("r")} AS redacted_fingerprint
       |FROM (SELECT doc_id, text,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '${TextOps.EmailRe}', '<EMAIL>', 'g'),
       |      '${TextOps.PhoneRe}', '<PHONE>', 'g'),
       |      '${TextOps.UrlRe}', '<URL>', 'g') AS r
       |  FROM documents) t""".stripMargin)
  private[queries] val q68 = QueryDef(
    "q68_containment",
    (s, d) => DedupOps.containmentOnCandidates(
      Tables.documents(s, d), col("doc_id"), col("text"), SHINGLE_W, ContainT),
    s"""WITH $sigCte,
       |bands AS (
       |  SELECT doc_id, 0 AS band,
       |    ${bandBucketSql((0 to 3).map(i => s"m$i"))} AS b FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band,
       |    ${bandBucketSql((4 to 7).map(i => s"m$i"))} AS b FROM sig),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.b = y.b AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_common
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND b.h = a.h
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_common,
       |  CAST(n_common AS DOUBLE) / CAST(sa.n AS DOUBLE) AS containment_a,
       |  CAST(n_common AS DOUBLE) / CAST(sb.n AS DOUBLE) AS containment_b
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE greatest(CAST(n_common AS DOUBLE) / CAST(sa.n AS DOUBLE),
       |  CAST(n_common AS DOUBLE) / CAST(sb.n AS DOUBLE)) >= $ContainT""".stripMargin)

  /** SemDeDup-shape semantic dedup ([[SimilarityOps.semanticDedup]]):
    * centroid-cell assignment (fixed deterministic sample, as q43 — the
    * learned-centroid variant is q48's contract), within-cell dominance
    * keep-set. */
  private[queries] val q69 = QueryDef(
    "q69_semantic_dedup",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.semanticDedup(
        emb, emb.where(col("vec_id") < 8), col("vec_id"), col("embedding"),
        COSINE_T)
    },
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings),
       |cents AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM v WHERE vec_id < 8),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT a.vec_id, c.cid AS cell,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY (CASE WHEN a.nrm * c.cnrm > 0 THEN round(${dotSql("a.e", "c.ce", DIM)} / (a.nrm * c.cnrm), 6) END) DESC,
       |                 c.cid) AS crk
       |    FROM v a CROSS JOIN cents c) t WHERE crk = 1),
       |pairs AS (
       |  SELECT x.vec_id AS va, y.vec_id AS vb
       |  FROM assign x
       |  JOIN assign y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  JOIN v a ON a.vec_id = x.vec_id
       |  JOIN v b ON b.vec_id = y.vec_id
       |  WHERE (CASE WHEN a.nrm * b.nrm > 0 THEN round(${dotSql("a.e", "b.e", DIM)} / (a.nrm * b.nrm), 6) END) >= $COSINE_T),
       |dropped AS (SELECT DISTINCT vb FROM pairs)
       |SELECT a.vec_id, a.cell, (d.vb IS NULL) AS kept
       |FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vb""".stripMargin)
  private[queries] val q70 = QueryDef(
    "q70_containment_prefix",
    (s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val big = base.where(col("doc_id") < 4)
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          t => t.getField("text")), " ").as("text"))
        .select(lit(1000000L).as("doc_id"), col("text"))
      val small = base.where(col("doc_id") === 1)
        .select(lit(1000001L).as("doc_id"),
          array_join(slice(split(col("text"), " "), 11, 6), " ").as("text"))
      DedupOps.containmentPrefixPairs(
        base.unionByName(big).unionByName(small),
        col("doc_id"), col("text"), SHINGLE_W, PrefixContainT)
    },
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT CAST(1000000 AS BIGINT),
       |    (SELECT string_agg(text, ' ' ORDER BY doc_id)
       |     FROM documents WHERE doc_id < 4)
       |  UNION ALL
       |  SELECT CAST(1000001 AS BIGINT),
       |    (SELECT array_to_string((string_split(text, ' '))[11:16], ' ')
       |     FROM documents WHERE doc_id = 1)),
       |${shingleCteOver(SHINGLE_W, "corpus")},
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
       |  FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS n_common
       |  FROM sh a JOIN sh b ON b.h = a.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_common,
       |  CAST(n_common AS DOUBLE) / CAST(sa.n AS DOUBLE) AS containment_a,
       |  CAST(n_common AS DOUBLE) / CAST(sb.n AS DOUBLE) AS containment_b
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE greatest(CAST(n_common AS DOUBLE) / CAST(sa.n AS DOUBLE),
       |  CAST(n_common AS DOUBLE) / CAST(sb.n AS DOUBLE))
       |  >= $PrefixContainT""".stripMargin)

  /** [[SimilarityOps.semanticDedup]] composed with the LEARNED coarse
    * quantizer ([[SimilarityOps.learnCentroids]]) — the production shape:
    * SemDeDup's cells must track the data distribution or near-dups land
    * in different cells and are silently KEPT. Measured on the test table
    * (PipelineOpsSpec): the learned 8-cell quantizer catches 24/62 of the
    * global dominance drop-set vs 18/62 for the q69 fixed sample, at the
    * same cell budget. Full oracle since r14 — the q48 frozen-centroid
    * treatment over the q69 replay chain: the dump-time thunk embeds the
    * memoized centroids and DuckDB independently replays assignment +
    * within-cell dominance. */
  private[queries] val q71 = QueryDef(
    "q71_semantic_dedup_learned",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.semanticDedup(
        emb, CentroidMemo.frame(s, d, 8),
        col("vec_id"), col("embedding"), COSINE_T)
    },
    Some(() => {
      s"""WITH v AS (SELECT vec_id, embedding AS e,
         |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm
         |  FROM embeddings),
         |${centroidValuesCte(8)},
         |assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT a.vec_id, c.cid AS cell,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY (CASE WHEN a.nrm * c.cnrm > 0
         |          THEN round(${dotSql("a.e", "c.ce", DIM)}
         |            / (a.nrm * c.cnrm), 6) END) DESC,
         |        c.cid) AS crk
         |    FROM v a CROSS JOIN cents c) t WHERE crk = 1),
         |pairs AS (
         |  SELECT x.vec_id AS va, y.vec_id AS vb
         |  FROM assign x
         |  JOIN assign y ON x.cell = y.cell AND x.vec_id < y.vec_id
         |  JOIN v a ON a.vec_id = x.vec_id
         |  JOIN v b ON b.vec_id = y.vec_id
         |  WHERE (CASE WHEN a.nrm * b.nrm > 0
         |    THEN round(${dotSql("a.e", "b.e", DIM)}
         |      / (a.nrm * b.nrm), 6) END) >= $COSINE_T),
         |dropped AS (SELECT DISTINCT vb FROM pairs)
         |SELECT a.vec_id, a.cell, (d.vb IS NULL) AS kept
         |FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vb"""
        .stripMargin
    }))
  private[queries] val q72 = QueryDef(
    "q72_containment_sketch",
    (s, d) => DedupOps.containmentSketchPairs(
      Tables.documents(s, d), col("doc_id"), col("text"), SHINGLE_W,
      SketchK, SketchT, maxDf = DedupOps.MaxPostingDf),
    s"""WITH $shingleCte,
       |shf AS (SELECT s.doc_id, s.h FROM sh s JOIN (
       |    SELECT h FROM sh GROUP BY h
       |    HAVING count(*) <= ${DedupOps.MaxPostingDf}) ok ON ok.h = s.h),
       |bk AS (SELECT doc_id, h FROM (
       |    SELECT doc_id, h,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rk
       |    FROM shf) t
       |  WHERE rk <= $SketchK),
       |bsz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sketch
       |  FROM bk GROUP BY doc_id),
       |hits AS (
       |  SELECT b.doc_id AS doc_a, s.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS n_hits
       |  FROM bk b JOIN shf s ON s.h = b.h AND s.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_hits, n_sketch,
       |  CAST(n_hits AS DOUBLE) / CAST(n_sketch AS DOUBLE) AS containment_est
       |FROM hits JOIN bsz ON hits.doc_a = bsz.doc_id
       |WHERE CAST(n_hits AS DOUBLE) / CAST(n_sketch AS DOUBLE)
       |  >= $SketchT""".stripMargin)
  private[queries] val q73 = QueryDef(
    "q73_line_dedup",
    (s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val next = base.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("_next"))
      val multi = base.join(next, "doc_id")
        .select(col("doc_id"),
          concat(col("text"), lit("\n"), col("_next"),
            when(col("doc_id") % 3 === 0, lit("\n" + LineBanner))
              .otherwise(lit(""))).as("text"))
      TextOps.lineDedup(multi, col("doc_id"), col("text"), LineMaxDf)
    },
    s"""WITH multi AS (
       |  SELECT a.doc_id, a.text || chr(10) || b.text ||
       |    CASE WHEN a.doc_id % 3 = 0 THEN chr(10) || '$LineBanner'
       |         ELSE '' END AS text
       |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
       |lns AS (
       |  SELECT doc_id, i AS pos, ls[i] AS line,
       |    ${polyHashSql("ls[i]")} AS h,
       |    CAST(length(ls[i]) AS BIGINT) AS llen
       |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM multi),
       |       UNNEST(generate_series(1, len(ls))) AS t(i)),
       |drop_set AS (
       |  SELECT h, llen FROM lns GROUP BY h, llen
       |  HAVING count(DISTINCT doc_id) >= $LineMaxDf),
       |ka AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |    ${polyHashSql("string_agg(line, chr(10) ORDER BY pos)")}
       |      AS clean_fingerprint
       |  FROM (SELECT lns.* FROM lns LEFT JOIN drop_set d
       |        ON lns.h = d.h AND lns.llen = d.llen
       |        WHERE d.h IS NULL) lk
       |  GROUP BY doc_id)
       |SELECT m.doc_id,
       |  CAST(len(string_split(m.text, chr(10))) AS BIGINT) AS n_lines,
       |  coalesce(ka.n_kept, 0) AS n_kept, ka.clean_fingerprint
       |FROM multi m LEFT JOIN ka USING (doc_id)""".stripMargin)

  /** Per-source unigram KL divergence vs the corpus
    * ([[TextOps.sourceDivergence]]) — corpus-QA drift signal. The weighted
    * sum rides the q66 DECIMAL pattern so both engines produce the exact
    * same total. */
  private[queries] val q74 = QueryDef(
    "q74_source_divergence",
    (s, d) => TextOps.sourceDivergence(
      Tables.documents(s, d), col("source"), col("text")),
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |sw AS (SELECT source, word, count(*) AS c_sw FROM w GROUP BY 1, 2),
      |cw AS (SELECT word, sum(c_sw) AS c_w FROM sw GROUP BY 1),
      |ns AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_vocab
      |  FROM sw GROUP BY 1),
      |tot AS (SELECT sum(c_w) AS n_total FROM cw),
      |terms AS (
      |  SELECT s.source, ns.n_tokens, ns.n_vocab,
      |    CAST(s.c_sw AS DECIMAL(20,0)) *
      |      CAST(round(ln((CAST(s.c_sw AS DOUBLE) * CAST(t.n_total AS DOUBLE))
      |          / (CAST(ns.n_tokens AS DOUBLE) * CAST(c.c_w AS DOUBLE))), 6)
      |        AS DECIMAL(18,6)) AS term
      |  FROM sw s JOIN cw c USING (word) JOIN ns USING (source)
      |  CROSS JOIN tot t)
      |SELECT source, n_tokens, n_vocab,
      |  round(CAST(sum(term) AS DOUBLE) / n_tokens, 6) AS kl_vs_corpus
      |FROM terms GROUP BY 1, 2, 3""".stripMargin)

  /** Cross-source syndication matrix: the q33 near-dup pair set grouped by
    * unordered source pair — which feeds copy from which (wire-service
    * syndication, mirror sites) and how much duplication stays
    * intra-source. Composition, not new machinery: pair discovery+verify
    * is [[DedupOps.jaccardOnCandidates]] unchanged; the source dimension
    * is doc-level and broadcast. */
  private[queries] val q78 = QueryDef(
    "q78_syndication_matrix",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val src = docs.select(col("doc_id"), col("source"))
      DedupOps.jaccardOnCandidates(
          docs, col("doc_id"), col("text"), SHINGLE_W, JACCARD_T)
        .join(broadcast(src.select(col("doc_id").as("doc_a"),
          col("source").as("_sa"))), "doc_a")
        .join(broadcast(src.select(col("doc_id").as("doc_b"),
          col("source").as("_sb"))), "doc_b")
        .select(least(col("_sa"), col("_sb")).as("source_a"),
          greatest(col("_sa"), col("_sb")).as("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"))
    },
    s"""WITH $jaccardPairsCtes
       |SELECT least(da.source, db.source) AS source_a,
       |  greatest(da.source, db.source) AS source_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs
       |FROM jp
       |JOIN documents da ON jp.doc_a = da.doc_id
       |JOIN documents db ON jp.doc_b = db.doc_id
       |GROUP BY 1, 2""".stripMargin)

  /** Bloom-pruned EXACT decontamination ([[TextOps.decontaminate]]): the
    * train-split documents overlapping the test split by ≥2 distinct
    * shingles. The oracle is pure relational (the Bloom stage only prunes;
    * the exact semi-join guarantees the same rows for any filter sizing). */
  private[queries] val q79 = QueryDef(
    "q79_decontaminate",
    (s, d) => TextOps.decontaminate(
      Tables.documents(s, d), col("doc_id"), col("text"), ContamW,
      minOverlap = 2, estimatedTestShingles = 1L << 20),
    s"""WITH ${shingleCteW(ContamW)},
       |spl AS (SELECT doc_id,
       |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT doc_id, ${polyHashSql("text")} % 100 AS b FROM documents) t),
       |te AS (SELECT DISTINCT h FROM sh JOIN spl ON sh.doc_id = spl.doc_id
       |  WHERE split = 'test'),
       |tr AS (SELECT sh.doc_id, sh.h FROM sh JOIN spl ON sh.doc_id = spl.doc_id
       |  WHERE split = 'train')
       |SELECT tr.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(count(te.h) AS BIGINT) AS n_in_test,
       |  CAST(count(te.h) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination
       |FROM tr LEFT JOIN te ON tr.h = te.h
       |GROUP BY tr.doc_id
       |HAVING count(te.h) >= 2""".stripMargin)

  /** Deterministic shuffle-and-shard ([[TextOps.shuffleShards]]): shard +
    * in-shard position as pure functions of (text, doc_id) — the
    * reproducible "random" order a training run consumes. The oracle
    * replays the same avalanched-hash arithmetic and window. */
  private[queries] val q80 = QueryDef(
    "q80_shuffle_shards",
    (s, d) => TextOps.shuffleShards(
      Tables.documents(s, d), col("doc_id"), col("text"), 16),
    s"""SELECT doc_id, k % 16 AS shard,
       |  CAST(row_number() OVER (PARTITION BY k % 16 ORDER BY k, doc_id)
       |    AS BIGINT) AS pos
       |FROM (SELECT doc_id,
       |    ((((${polyHashSql("text")} * 31 + doc_id) % $P + $P) % $P)
       |      * 2654435761) % $P AS k
       |  FROM documents) t""".stripMargin)

  /** Repeated-span removal ([[TextOps.removeRepeatedSpans]]): excise every
    * ≥5-token span whose 3-grams all repeat corpus-wide. The oracle
    * replays the position stream, frequency threshold, gaps-and-islands
    * run grouping, interval clipping, and row rebuild relationally. */
  private[queries] val q81 = QueryDef(
    "q81_remove_repeated_spans", {
      (s, d) => TextOps.removeRepeatedSpans(
        Tables.documents(s, d), col("doc_id"), col("text"), 3, 5)
    },
    s"""WITH words AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
       |possh AS (
       |  SELECT doc_id, i, ${polyHashSql("s")} AS h FROM (
       |    SELECT doc_id, i, ${wordShinglesSql(3)} AS s
       |    FROM words, UNNEST(generate_series(1, greatest(len(ws) - 2, 1))) AS t(i))),
       |dup AS (SELECT h FROM possh GROUP BY h HAVING count(*) >= 2),
       |runs AS (SELECT doc_id, i,
       |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS g
       |  FROM possh WHERE h IN (SELECT h FROM dup)),
       |iv AS (SELECT r.doc_id, min(r.i) AS a,
       |    least(max(r.i) + 2, len(w2.ws)) AS b
       |  FROM runs r JOIN words w2 USING (doc_id)
       |  GROUP BY r.doc_id, g, len(w2.ws)
       |  HAVING least(max(r.i) + 2, len(w2.ws)) - min(r.i) + 1 >= 5),
       |tok AS (SELECT doc_id, i AS pos, ws[i] AS word
       |  FROM words, UNNEST(generate_series(1, len(ws))) AS t(i)),
       |kept AS (SELECT t.* FROM tok t WHERE NOT EXISTS (
       |  SELECT 1 FROM iv WHERE iv.doc_id = t.doc_id
       |    AND t.pos BETWEEN iv.a AND iv.b)),
       |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |    ${polyHashSql("string_agg(word, ' ' ORDER BY pos)")} AS fp
       |  FROM kept GROUP BY doc_id),
       |ns AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
       |  FROM iv GROUP BY doc_id)
       |SELECT w3.doc_id,
       |  CAST(len(w3.ws) AS BIGINT) AS n_tokens,
       |  CAST(len(w3.ws) - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
       |  coalesce(ns.n_spans, CAST(0 AS BIGINT)) AS n_spans,
       |  ka.fp AS clean_fingerprint
       |FROM words w3
       |LEFT JOIN ka USING (doc_id) LEFT JOIN ns USING (doc_id)""".stripMargin)
}
