package graft.queries
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextHash._
import graft.operators.{DedupOps, MultimodalOps, PQOps, RetrievalOps, SimilarityOps, TextOps}
import graft.queries.PipelineShared._

/** Pipeline band (r17 verdict item 7 split): classifiers, curation funnel, retrieval (q110-q127).
  * Blocks moved verbatim from the former monolithic Pipeline
  * object; helpers live in [[PipelineShared]]. */
private[queries] object PipelineBandCuration {
  private[queries] val q110 = QueryDef(
    "q110_nb_langid",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.ClassifyOps.nbClassify(
        docs, col("text"), col("lang"),
        docs, col("doc_id"), col("text"), Some(col("lang")))
    }, {
      val ls = NbLangs
      val dec = "DECIMAL(18,6)"
      s"""WITH toks AS (SELECT doc_id, lang,
         |    unnest(string_split(text, ' ')) AS word FROM documents),
         |wc AS (SELECT word, lang, count(*) AS n FROM toks GROUP BY 1, 2),
         |cls AS (SELECT count(DISTINCT word) AS v,
         |    ${ls.map(l => s"count(*) FILTER (WHERE lang = '$l') AS tot_$l")
              .mkString(",\n    ")}
         |  FROM toks),
         |pri AS (SELECT
         |    ${ls.map(l => s"CAST(round(ln(count(*) FILTER (WHERE lang = '$l')" +
                s" / CAST(count(*) AS DOUBLE)), 6) AS $dec) AS pri_$l")
              .mkString(",\n    ")}
         |  FROM documents),
         |model AS (
         |  SELECT w.word,
         |    ${ls.map(l => s"CAST(round(ln(CAST(COALESCE(c_$l.n, 0) + 1 AS DOUBLE)" +
                s" / (cls.tot_$l + cls.v)), 6) AS $dec) AS lp_$l")
              .mkString(",\n    ")}
         |  FROM (SELECT DISTINCT word FROM toks) w CROSS JOIN cls
         |  ${ls.map(l => s"LEFT JOIN wc c_$l ON c_$l.word = w.word AND c_$l.lang = '$l'")
              .mkString("\n  ")}),
         |sums AS (SELECT t.doc_id, t.lang, count(*) AS n_tokens,
         |    ${ls.map(l => s"sum(m.lp_$l) AS s_$l").mkString(", ")}
         |  FROM toks t JOIN model m ON m.word = t.word GROUP BY 1, 2),
         |sc AS (SELECT doc_id, lang, n_tokens,
         |    ${ls.map(l => s"s_$l + pri.pri_$l AS sc_$l").mkString(", ")}
         |  FROM sums CROSS JOIN pri),
         |ranked AS (
         |  SELECT doc_id, lang, n_tokens, l AS pred_label, s AS score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, l) AS rk
         |  FROM (SELECT doc_id, lang, n_tokens,
         |      unnest([${ls.map(l => s"'$l'").mkString(", ")}]) AS l,
         |      unnest([${ls.map(l => s"sc_$l").mkString(", ")}]) AS s
         |    FROM sc) u)
         |SELECT doc_id, lang AS label, pred_label,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(CAST(score AS VARCHAR) AS DOUBLE) AS score
         |FROM ranked WHERE rk = 1""".stripMargin
    })

  /** CDC changeset apply ([[graft.operators.AuditOps.applyChangeSet]]):
    * MERGE-INTO semantics — latest seq wins per key, delete beats upsert
    * on a seq tie, snapshot flows through one anti join unshuffled. The
    * changeset is derived deterministically from the snapshot itself and
    * exercises every rule: superseded revisions (rev1 < rev2), plain
    * deletes, a delete/upsert seq TIE (the zombie row must not survive),
    * and fresh-key inserts. */
  private[queries] val q111 = QueryDef(
    "q111_cdc_merge",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val m = col("doc_id") % 7
      def change(rows: org.apache.spark.sql.DataFrame,
          idC: org.apache.spark.sql.Column,
          textC: org.apache.spark.sql.Column, seqV: Long, opV: String) =
        rows.select(idC.as("doc_id"), textC.as("text"), col("lang"),
          col("source"), length(textC).cast("long").as("n_chars"),
          lit(seqV).as("seq"), lit(opV).as("op"))
      val changes = Seq(
        change(docs.where(m === 1), col("doc_id"),
          concat(col("text"), lit(" [rev1]")), 1L, "upsert"),
        change(docs.where(m === 1), col("doc_id"),
          concat(col("text"), lit(" [rev2]")), 2L, "upsert"),
        change(docs.where(m === 0), col("doc_id"), col("text"), 1L, "delete"),
        change(docs.where(m === 2), col("doc_id"), col("text"), 3L, "delete"),
        change(docs.where(m === 2), col("doc_id"),
          concat(col("text"), lit(" [zombie]")), 3L, "upsert"),
        change(docs.where(m === 3), col("doc_id") + 10000L,
          concat(lit("new: "), col("text")), 1L, "upsert"))
        .reduce(_ unionByName _)
      graft.operators.AuditOps.applyChangeSet(docs, changes, "doc_id")
    },
    s"""WITH ch AS (
       |  SELECT doc_id, text || ' [rev1]' AS text, lang, source,
       |    CAST(length(text || ' [rev1]') AS BIGINT) AS n_chars,
       |    1 AS seq, 'upsert' AS op FROM documents WHERE doc_id % 7 = 1
       |  UNION ALL SELECT doc_id, text || ' [rev2]', lang, source,
       |    length(text || ' [rev2]'), 2, 'upsert'
       |    FROM documents WHERE doc_id % 7 = 1
       |  UNION ALL SELECT doc_id, text, lang, source, length(text),
       |    1, 'delete' FROM documents WHERE doc_id % 7 = 0
       |  UNION ALL SELECT doc_id, text, lang, source, length(text),
       |    3, 'delete' FROM documents WHERE doc_id % 7 = 2
       |  UNION ALL SELECT doc_id, text || ' [zombie]', lang, source,
       |    length(text || ' [zombie]'), 3, 'upsert'
       |    FROM documents WHERE doc_id % 7 = 2
       |  UNION ALL SELECT doc_id + 10000, 'new: ' || text, lang, source,
       |    length('new: ' || text), 1, 'upsert'
       |    FROM documents WHERE doc_id % 7 = 3),
       |win AS (SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY seq DESC, op,
       |        concat_ws(chr(1), coalesce(CAST(doc_id AS VARCHAR), chr(0)),
       |          coalesce(text, chr(0)), coalesce(lang, chr(0)),
       |          coalesce(source, chr(0)),
       |          coalesce(CAST(n_chars AS VARCHAR), chr(0)))) AS rk
       |    FROM ch) t
       |  WHERE rk = 1)
       |SELECT s.doc_id, s.text, s.lang, s.source, s.n_chars
       |FROM documents s ANTI JOIN win ON s.doc_id = win.doc_id
       |UNION ALL
       |SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT)
       |FROM win WHERE op = 'upsert'""".stripMargin)

  /** Zone-map pruning plan ([[graft.operators.LayoutOps.pruningPlan]]):
    * a user_id-clustered simulated layout (15 "files" of 10 ids each —
    * the q102 relational-layout convention) pruned by a conjunctive
    * interval predicate. The clustered column prunes to the predicate's
    * file range; the scattered `value` column's wide boxes hit almost
    * everywhere — the asymmetry that motivates Z-ordering, here
    * hash-pinned per file. */
  private[queries] val q112 = QueryDef(
    "q112_pruning_plan",
    (s, d) => {
      val ev = Tables.events(s, d)
      val audit = ev
        .groupBy((col("user_id") / 10).cast("long").as("file"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("user_id")).as("user_id_min"),
          max(col("user_id")).as("user_id_max"),
          min(col("value")).as("value_min"),
          max(col("value")).as("value_max"))
      graft.operators.LayoutOps.pruningPlan(audit, col("file"),
        col("n_rows"), Seq(("user_id", 35.0, 72.0), ("value", 0.0, 450.0)))
    },
    s"""WITH a AS (SELECT CAST(floor(user_id / 10) AS BIGINT) AS file,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    min(user_id) AS umin, max(user_id) AS umax,
       |    min(value) AS vmin, max(value) AS vmax
       |  FROM events GROUP BY 1)
       |SELECT file, n_rows,
       |  (CAST(umin AS DOUBLE) <= 72.0 AND CAST(umax AS DOUBLE) >= 35.0)
       |    AS user_id_hit,
       |  (vmin <= 450.0 AND vmax >= 0.0) AS value_hit,
       |  ((CAST(umin AS DOUBLE) <= 72.0 AND CAST(umax AS DOUBLE) >= 35.0)
       |    AND (vmin <= 450.0 AND vmax >= 0.0)) AS scan
       |FROM a""".stripMargin)

  /** Semantic contamination screen
    * ([[SimilarityOps.semanticContamination]]): corpus vectors within
    * cosine `COSINE_T` of any eval-set vector (vec_id < 25 plays the
    * benchmark), via the broadcast banded sign-LSH probe with cosine
    * verified inside the join. The embedding-space complement of
    * q55/q79's exact n-gram screens — paraphrased eval leakage that
    * exact matching cannot see. */
  private[queries] val q113 = QueryDef(
    "q113_semantic_contamination",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.semanticContamination(
        emb.where(col("vec_id") >= 25), emb.where(col("vec_id") < 25),
        col("vec_id"), col("embedding"), COSINE_T, LSH_BITS, LSH_TABLES)
    },
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm FROM embeddings),
       |cb AS (
       |  ${(0 until LSH_TABLES).map(t =>
            s"SELECT vec_id, e, nrm, $t AS tbl, " +
              s"${signBucketAtSql("e", LSH_BITS, t * LSH_BITS)} AS bucket " +
              "FROM v WHERE vec_id >= 25").mkString("\n  UNION ALL\n  ")}),
       |qb AS (
       |  ${(0 until LSH_TABLES).map(t =>
            s"SELECT vec_id, e, nrm, $t AS tbl, " +
              s"${signBucketAtSql("e", LSH_BITS, t * LSH_BITS)} AS bucket " +
              "FROM v WHERE vec_id < 25").mkString("\n  UNION ALL\n  ")}),
       |hits AS (
       |  SELECT c.vec_id, q.vec_id AS eval_id,
       |    CASE WHEN c.nrm * q.nrm > 0 THEN
       |      round(${dotSql("c.e", "q.e", DIM)} / (c.nrm * q.nrm), 6) END AS cos_sim
       |  FROM cb c JOIN qb q ON c.tbl = q.tbl AND c.bucket = q.bucket)
       |SELECT vec_id, eval_id, cos_sim FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY cos_sim DESC, eval_id) AS rk
       |  FROM hits WHERE cos_sim >= $COSINE_T) t
       |WHERE rk = 1""".stripMargin)
  private[queries] val q114 = QueryDef(
    "q114_margin_mining",
    (s, d) => {
      val emb = Tables.embeddings(s, d).where(col("vec_id") < 2000)
      SimilarityOps.marginMining(
        emb.where(col("vec_id") % 2 === 0),
        emb.where(col("vec_id") % 2 === 1),
        col("vec_id"), col("embedding"), MARGIN_K, 1.0)
    },
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm
       |  FROM embeddings WHERE vec_id < 2000),
       |fs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CASE WHEN q.nrm * c.nrm > 0 THEN round(${dotSql("q.e", "c.e", DIM)} / (q.nrm * c.nrm), 6) END AS cos_sim
       |  FROM v q JOIN v c ON q.vec_id % 2 = 0 AND c.vec_id % 2 = 1),
       |bs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CASE WHEN q.nrm * c.nrm > 0 THEN round(${dotSql("q.e", "c.e", DIM)} / (q.nrm * c.nrm), 6) END AS cos_sim
       |  FROM v q JOIN v c ON q.vec_id % 2 = 1 AND c.vec_id % 2 = 0),
       |fwd AS (SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
       |    FROM fs) t WHERE rk <= $MARGIN_K),
       |bwd AS (SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
       |    FROM bs) t WHERE rk <= $MARGIN_K),
       |fa AS (SELECT query_id AS src_id,
       |    SUM(CAST(cos_sim AS DECIMAL(18,6))) AS sx FROM fwd GROUP BY 1),
       |ba AS (SELECT query_id AS dst_id,
       |    SUM(CAST(cos_sim AS DECIMAL(18,6))) AS sy FROM bwd GROUP BY 1),
       |cand AS (
       |  SELECT f.query_id AS src_id, f.neighbor_id AS dst_id, f.cos_sim,
       |    round(f.cos_sim * ${2 * MARGIN_K}
       |      / CAST(CAST(fa.sx + ba.sy AS VARCHAR) AS DOUBLE), 6) AS margin
       |  FROM fwd f
       |  JOIN fa ON fa.src_id = f.query_id
       |  JOIN ba ON ba.dst_id = f.neighbor_id)
       |SELECT src_id, dst_id, cos_sim, margin FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY src_id ORDER BY margin DESC, dst_id) AS rk
       |  FROM cand) t
       |WHERE rk = 1 AND margin >= 1.0""".stripMargin)

  /** Percentile score calibration ([[TextOps.calibrateScores]]): q66's
    * unigram cross-entropy converted to within-LANGUAGE percentile
    * ranks, decile buckets, and a keep-best-70% decision — the CCNet
    * per-language calibration step that makes one threshold safe across
    * resource levels. */
  private[queries] val q115 = QueryDef(
    "q115_score_calibration",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // lang rides lmScore's aggregation key (r15: was a doc-cardinality
      // join-back onto the corpus)
      val scored = TextOps.lmScore(docs, col("doc_id"), col("text"),
        keep = Seq(col("lang")))
      TextOps.calibrateScores(scored, col("doc_id"),
        col("cross_entropy"), col("lang"), "lang", 10, 0.7)
    },
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
       |  FROM w JOIN wlp USING (word) GROUP BY doc_id),
       |ce AS (SELECT d.doc_id,
       |    round(CAST(s AS DOUBLE) / n_tokens, 6) AS score, doc.lang
       |  FROM d JOIN documents doc USING (doc_id)),
       |p AS (SELECT doc_id, lang, score,
       |    round(percent_rank() OVER (
       |      PARTITION BY lang ORDER BY score), 6) AS pct
       |  FROM ce)
       |SELECT doc_id, lang, score, pct,
       |  CAST(least(floor(pct * 10), 9.0) AS BIGINT) AS bucket,
       |  (pct <= 0.7) AS keep
       |FROM p""".stripMargin)

  /** Confusion matrix of the q110 classifier — the aggregate face a
    * pipeline actually monitors (per-class precision/recall inputs and
    * the disagreement rate CurationDemo's language audit thresholds):
    * per (label, pred_label) cell the doc count and its share of the
    * true-label row, millionth-rounded. */
  private[queries] val q116 = QueryDef(
    "q116_nb_confusion",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pred = graft.operators.ClassifyOps.nbClassify(
        docs, col("text"), col("lang"),
        docs, col("doc_id"), col("text"), Some(col("lang")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("label")
      pred.groupBy("label", "pred_label")
        .agg(count(lit(1)).as("n"))
        .withColumn("label_share",
          round(col("n") / sum(col("n")).over(w), 6))
    }, {
      val ls = NbLangs
      val dec = "DECIMAL(18,6)"
      // the q110 oracle chain, aggregated to (label, pred_label) cells
      s"""WITH toks AS (SELECT doc_id, lang,
         |    unnest(string_split(text, ' ')) AS word FROM documents),
         |wc AS (SELECT word, lang, count(*) AS n FROM toks GROUP BY 1, 2),
         |cls AS (SELECT count(DISTINCT word) AS v,
         |    ${ls.map(l => s"count(*) FILTER (WHERE lang = '$l') AS tot_$l")
              .mkString(",\n    ")}
         |  FROM toks),
         |pri AS (SELECT
         |    ${ls.map(l => s"CAST(round(ln(count(*) FILTER (WHERE lang = '$l')" +
                s" / CAST(count(*) AS DOUBLE)), 6) AS $dec) AS pri_$l")
              .mkString(",\n    ")}
         |  FROM documents),
         |model AS (
         |  SELECT w.word,
         |    ${ls.map(l => s"CAST(round(ln(CAST(COALESCE(c_$l.n, 0) + 1 AS DOUBLE)" +
                s" / (cls.tot_$l + cls.v)), 6) AS $dec) AS lp_$l")
              .mkString(",\n    ")}
         |  FROM (SELECT DISTINCT word FROM toks) w CROSS JOIN cls
         |  ${ls.map(l => s"LEFT JOIN wc c_$l ON c_$l.word = w.word AND c_$l.lang = '$l'")
              .mkString("\n  ")}),
         |sums AS (SELECT t.doc_id, t.lang,
         |    ${ls.map(l => s"sum(m.lp_$l) AS s_$l").mkString(", ")}
         |  FROM toks t JOIN model m ON m.word = t.word GROUP BY 1, 2),
         |sc AS (SELECT doc_id, lang,
         |    ${ls.map(l => s"s_$l + pri.pri_$l AS sc_$l").mkString(", ")}
         |  FROM sums CROSS JOIN pri),
         |pick AS (
         |  SELECT doc_id, lang, l AS pred_label,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, l) AS rk
         |  FROM (SELECT doc_id, lang,
         |      unnest([${ls.map(l => s"'$l'").mkString(", ")}]) AS l,
         |      unnest([${ls.map(l => s"sc_$l").mkString(", ")}]) AS s
         |    FROM sc) u),
         |cells AS (SELECT lang AS label, pred_label,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM pick WHERE rk = 1 GROUP BY 1, 2)
         |SELECT label, pred_label, n,
         |  round(n / CAST(sum(n) OVER (PARTITION BY label) AS DOUBLE), 6)
         |    AS label_share
         |FROM cells""".stripMargin
    })

  private[queries] val q117 = QueryDef(
    "q117_curation_funnel",
    (s, d) => {
      def cnt(i: Long, name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n"))
          .select(lit(i).as("stage_idx"), lit(name).as("stage"), col("n"))
      funnelStages(s, d).zipWithIndex.map { case ((name, _, surv), i) =>
        cnt(i.toLong, name, surv)
      }.reduce(_ unionAll _)
    }, {
      val piiFree = Seq(TextOps.EmailRe, TextOps.PhoneRe, TextOps.UrlRe)
        .map(re => s"len(regexp_extract_all(text, '$re')) = 0")
        .mkString("(", " AND ", ")")
      val mins = (0 until MinhashA.size)
        .map(i => s"min(${minhashPermSql("h", i)}) AS m$i").mkString(", ")
      s"""WITH RECURSIVE fun AS MATERIALIZED (
         |  SELECT doc_id, text, source FROM (
         |    SELECT doc_id, text, source, string_split(text, ' ') AS ws
         |    FROM documents) b
         |  WHERE len(ws) >= ${TextOps.DefaultMinWords}
         |    AND 1.0 - CAST(len(list_distinct(ws)) AS DOUBLE)
         |      / CAST(len(ws) AS DOUBLE) <= ${TextOps.DefaultMaxDupRatio}
         |    AND $qualityCompositeSql >= ${TextOps.DefaultMinQuality}
         |    AND $piiFree),
         |${repetitionCtes("fun", "gr")},
         |scr AS MATERIALIZED (SELECT f.* FROM fun f
         |  JOIN grkeep k USING (doc_id) WHERE k.keep),
         |dwords0 AS (SELECT doc_id AS did, string_split(text, ' ') AS ws
         |  FROM scr),
         |dg AS (${graft.operators.SpanDedupOps.gramCteSql(3, "dwords0")}),
         |ddup AS (SELECT h, glen, min(did) AS canon
         |  FROM dg GROUP BY 1, 2
         |  HAVING count(DISTINCT did) >= 4),
         |ddrop AS (SELECT DISTINCT dg.did, p AS pos
         |  FROM dg JOIN ddup USING (h, glen),
         |    UNNEST(generate_series(dg.pos, dg.pos + 2)) AS t(p)
         |  WHERE dg.did <> ddup.canon),
         |dtok AS (SELECT did, i AS pos, ws[i] AS w
         |  FROM dwords0, UNNEST(generate_series(1, len(ws))) AS t(i)),
         |dkept AS (SELECT dtok.did, dtok.pos, dtok.w FROM dtok
         |  LEFT JOIN ddrop ON dtok.did = ddrop.did AND dtok.pos = ddrop.pos
         |  WHERE ddrop.pos IS NULL),
         |dsp AS MATERIALIZED (SELECT s.doc_id, a.text, s.source
         |  FROM scr s JOIN (SELECT did,
         |      string_agg(w, ' ' ORDER BY pos) AS text
         |    FROM dkept GROUP BY did) a ON s.doc_id = a.did),
         |${shingleCteOver(SHINGLE_W, "dsp")},
         |sig AS MATERIALIZED (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
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
         |labels AS MATERIALIZED (
         |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         |  FROM reach GROUP BY a),
         |q AS (SELECT doc_id, round($qualityCompositeSql, 6) AS q
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
         |    FROM dsp) b0),
         |r AS (SELECT l.cluster_id, l.doc_id,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |      ORDER BY q.q DESC, l.doc_id) AS rk
         |  FROM labels l JOIN q USING (doc_id)),
         |dropdup AS (SELECT doc_id FROM r WHERE rk > 1),
         |dedup AS MATERIALIZED (SELECT * FROM dsp ANTI JOIN dropdup USING (doc_id)),
         |dwords AS (SELECT doc_id, string_split(text, ' ') AS ws FROM dedup),
         |dsh AS (
         |  SELECT DISTINCT doc_id, ${polyHashSql("s")} AS h FROM (
         |    SELECT doc_id, ${wordShinglesSql(ContamW)} AS s
         |    FROM dwords, UNNEST(generate_series(1,
         |      greatest(len(ws) - ${ContamW - 1}, 1))) AS t(i))),
         |spl AS (SELECT doc_id,
         |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM (SELECT doc_id, ${polyHashSql("text")} % 100 AS b
         |    FROM dedup) t2),
         |te AS (SELECT DISTINCT h FROM dsh JOIN spl USING (doc_id)
         |  WHERE split = 'test'),
         |trd AS (SELECT dsh.doc_id, dsh.h FROM dsh
         |  JOIN spl ON dsh.doc_id = spl.doc_id WHERE split = 'train'),
         |leaky AS (SELECT trd.doc_id FROM trd LEFT JOIN te ON trd.h = te.h
         |  GROUP BY trd.doc_id HAVING count(te.h) >= 2),
         |decon AS MATERIALIZED (SELECT * FROM dedup ANTI JOIN leaky USING (doc_id)),
         |${knModelCtes("decon", "kn")},
         |knlp AS (SELECT v, w,
         |    CAST(round(-ln($knPSql), 6) AS DECIMAL(18,6)) AS lp
         |  FROM kncvw JOIN knctx USING (v) JOIN kncont USING (w)
         |  CROSS JOIN kntot),
         |knce AS (SELECT b.doc_id,
         |    round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS ce
         |  FROM knbg b JOIN knlp USING (v, w) GROUP BY b.doc_id),
         |kncal AS (SELECT k.doc_id,
         |    round(percent_rank() OVER (
         |      PARTITION BY d.source ORDER BY k.ce), 6) AS pct
         |  FROM knce k JOIN decon d USING (doc_id)),
         |lmkept AS MATERIALIZED (SELECT decon.* FROM decon
         |  JOIN kncal USING (doc_id) WHERE pct <= 0.9),
         |t AS (SELECT doc_id, source,
         |    CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS toks,
         |    ${sampleBucketSql(polyHashSql("text"), 1000000)} AS bkt
         |  FROM lmkept),
         |a AS (SELECT source, CAST(sum(toks) AS BIGINT) AS avail
         |  FROM t GROUP BY source),
         |nsrc AS (SELECT CAST(count(*) AS BIGINT) AS k FROM a),
         |thr AS (SELECT a.source,
         |    least($MixBudget * 1000000 // (nsrc.k * avail),
         |      CAST(1000000 AS BIGINT)) AS thr
         |  FROM a CROSS JOIN nsrc),
         |mixed AS MATERIALIZED (SELECT t.doc_id, t.toks FROM t JOIN thr USING (source)
         |  WHERE bkt < thr),
         |c AS (SELECT doc_id, toks,
         |    sum(toks) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS strt
         |  FROM mixed),
         |chunks AS (SELECT DISTINCT CAST(strt // 512 AS BIGINT) AS chunk_id
         |  FROM c)
         |SELECT CAST(0 AS BIGINT) AS stage_idx, 'corpus' AS stage,
         |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n
         |UNION ALL SELECT 1, 'funnel',
         |  (SELECT CAST(count(*) AS BIGINT) FROM fun)
         |UNION ALL SELECT 2, 'gopher',
         |  (SELECT CAST(count(*) AS BIGINT) FROM scr)
         |UNION ALL SELECT 3, 'despanned',
         |  (SELECT CAST(count(*) AS BIGINT) FROM dsp)
         |UNION ALL SELECT 4, 'keep_best',
         |  (SELECT CAST(count(*) AS BIGINT) FROM dedup)
         |UNION ALL SELECT 5, 'decontaminated',
         |  (SELECT CAST(count(*) AS BIGINT) FROM decon)
         |UNION ALL SELECT 6, 'lm_perplexity',
         |  (SELECT CAST(count(*) AS BIGINT) FROM lmkept)
         |UNION ALL SELECT 7, 'mixed',
         |  (SELECT CAST(count(*) AS BIGINT) FROM mixed)
         |UNION ALL SELECT 8, 'chunks',
         |  (SELECT CAST(count(*) AS BIGINT) FROM chunks)""".stripMargin
    })

  /** Held-out confusion matrix of the NB classifier — the honest face of
    * q116: q110/q116 score the corpus the model was FITTED on, so their
    * accuracy is in-sample (a memorizing model would ace it). Here the
    * [[TextOps.hashSplit]] train buckets (content-hash < 80) fit the
    * model and the held-out 20% is scored — fit and eval never share a
    * document, so the matrix measures generalization. The entire chain
    * (split, fit, OOV-smoothed scoring of words the train vocabulary
    * never saw, argmax, cells) hash-pins against DuckDB: held-out tokens
    * LEFT-join the model and absent words take the `_oov_l` constants —
    * the one scoring path self-classification can never exercise.
    * ClassifyOpsSpec gates held-out accuracy above the modal-class
    * baseline. */
  private[queries] val q118 = QueryDef(
    "q118_nb_holdout_confusion",
    (s, d) => {
      // text/lang ride hashSplit's keep pass-through (r15: was a
      // docs ⋈ split self-join — the q183 cleanup applied here too)
      val withSplit = graft.operators.TextOps.hashSplit(
        Tables.documents(s, d), col("doc_id"), col("text"),
        keep = Seq(col("text"), col("lang")))
      val train = withSplit.where(col("split") === "train")
      val held = withSplit.where(col("split") =!= "train")
      val pred = graft.operators.ClassifyOps.nbClassify(
        train, col("text"), col("lang"),
        held, col("doc_id"), col("text"), Some(col("lang")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("label")
      pred.groupBy("label", "pred_label")
        .agg(count(lit(1)).as("n"))
        .withColumn("label_share",
          round(col("n") / sum(col("n")).over(w), 6))
    }, {
      val ls = NbLangs
      val dec = "DECIMAL(18,6)"
      val ph = graft.functions.TextHash.polyHashSql("text")
      s"""WITH train AS (SELECT * FROM documents WHERE $ph % 100 < 80),
         |held AS (SELECT * FROM documents WHERE $ph % 100 >= 80),
         |toks AS (SELECT doc_id, lang,
         |    unnest(string_split(text, ' ')) AS word FROM train),
         |cls AS (SELECT count(DISTINCT word) AS v,
         |    ${ls.map(l => s"count(*) FILTER (WHERE lang = '$l') AS tot_$l")
              .mkString(",\n    ")}
         |  FROM toks),
         |wc AS (SELECT word, lang, count(*) AS n FROM toks GROUP BY 1, 2),
         |pri AS (SELECT
         |    ${ls.map(l => s"CAST(round(ln(count(*) FILTER (WHERE lang = '$l')" +
                s" / CAST(count(*) AS DOUBLE)), 6) AS $dec) AS pri_$l")
              .mkString(",\n    ")}
         |  FROM train),
         |oov AS (SELECT
         |    ${ls.map(l => s"CAST(round(ln(1.0 / (cls.tot_$l + cls.v)), 6)" +
                s" AS $dec) AS oov_$l").mkString(",\n    ")}
         |  FROM cls),
         |model AS (
         |  SELECT w.word,
         |    ${ls.map(l => s"CAST(round(ln(CAST(COALESCE(c_$l.n, 0) + 1 AS DOUBLE)" +
                s" / (cls.tot_$l + cls.v)), 6) AS $dec) AS lp_$l")
              .mkString(",\n    ")}
         |  FROM (SELECT DISTINCT word FROM toks) w CROSS JOIN cls
         |  ${ls.map(l => s"LEFT JOIN wc c_$l ON c_$l.word = w.word AND c_$l.lang = '$l'")
              .mkString("\n  ")}),
         |htoks AS (SELECT doc_id, lang,
         |    unnest(string_split(text, ' ')) AS word FROM held),
         |sums AS (SELECT t.doc_id, t.lang,
         |    ${ls.map(l => s"sum(COALESCE(m.lp_$l, oov.oov_$l)) AS s_$l")
              .mkString(", ")}
         |  FROM htoks t LEFT JOIN model m ON m.word = t.word
         |  CROSS JOIN oov GROUP BY 1, 2),
         |sc AS (SELECT doc_id, lang,
         |    ${ls.map(l => s"s_$l + pri.pri_$l AS sc_$l").mkString(", ")}
         |  FROM sums CROSS JOIN pri),
         |pick AS (
         |  SELECT doc_id, lang, l AS pred_label,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, l) AS rk
         |  FROM (SELECT doc_id, lang,
         |      unnest([${ls.map(l => s"'$l'").mkString(", ")}]) AS l,
         |      unnest([${ls.map(l => s"sc_$l").mkString(", ")}]) AS s
         |    FROM sc) u),
         |cells AS (SELECT lang AS label, pred_label,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM pick WHERE rk = 1 GROUP BY 1, 2)
         |SELECT label, pred_label, n,
         |  round(n / CAST(sum(n) OVER (PARTITION BY label) AS DOUBLE), 6)
         |    AS label_share
         |FROM cells""".stripMargin
    })
  private[queries] val q119 = QueryDef(
    "q119_bm25_topk",
    (s, d) => {
      val docs = Tables.documents(s, d)
      RetrievalOps.bm25TopK(docs, col("doc_id"), col("text"),
        docs.where(col("doc_id") < 3), col("doc_id"), col("text"), BM25_K)
    },
    s"""WITH words AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents) t WHERE length(w) > 0),
       |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       |  FROM words GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
       |  FROM tf GROUP BY 1),
       |stats AS (SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       |    (SELECT avg(CAST(dl AS DOUBLE)) FROM dl) AS avgdl),
       |qt AS (SELECT DISTINCT doc_id AS query_id, w FROM words
       |  WHERE doc_id < 3),
       |dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf
       |  WHERE w IN (SELECT w FROM qt) GROUP BY w),
       |contrib AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(round(
       |      CAST(CAST(CAST(round(ln(1.0 +
       |          (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)), 6)
       |        AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE)
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)), 6)
       |      AS DECIMAL(18,6)) AS c
       |  FROM tf
       |  JOIN qt ON qt.w = tf.w
       |  JOIN dfq ON dfq.w = tf.w
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats),
       |sc AS (SELECT query_id, doc_id, sum(c) AS s,
       |    CAST(count(*) AS BIGINT) AS n_terms
       |  FROM contrib GROUP BY 1, 2),
       |ranked AS (SELECT query_id, doc_id, n_terms, s,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, doc_id) AS BIGINT) AS rk
       |  FROM sc)
       |SELECT query_id, rk, doc_id, n_terms,
       |  CAST(CAST(s AS VARCHAR) AS DOUBLE) AS score
       |FROM ranked WHERE rk <= $BM25_K""".stripMargin)

  /** Hybrid retrieval via reciprocal-rank fusion ([[RetrievalOps
    * .rrfFuse]], Cormack et al. 2009): the q119 lexical ranking and the
    * q36-shape vector ranking over the SAME query ids (doc 0-2 texts /
    * vec 0-2 embeddings), fused score-scale-free as
    * Σ round(1/(60+rank), 6). Both legs run at k=10 and the fusion
    * reports the top 5 — documents strong in either modality surface,
    * documents strong in both win. */
  private[queries] val q120 = QueryDef(
    "q120_hybrid_rrf",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val lex = RetrievalOps.bm25TopK(docs, col("doc_id"), col("text"),
        docs.where(col("doc_id") < 3), col("doc_id"), col("text"), 10)
      val vec = SimilarityOps.bruteForceTopK(
        emb, emb.where(col("vec_id") < 3), col("vec_id"), col("embedding"),
        10)
      RetrievalOps.rrfFuse(lex, vec, 5)
    },
    s"""WITH words AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents) t WHERE length(w) > 0),
       |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       |  FROM words GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
       |  FROM tf GROUP BY 1),
       |stats AS (SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       |    (SELECT avg(CAST(dl AS DOUBLE)) FROM dl) AS avgdl),
       |qt AS (SELECT DISTINCT doc_id AS query_id, w FROM words
       |  WHERE doc_id < 3),
       |dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf
       |  WHERE w IN (SELECT w FROM qt) GROUP BY w),
       |contrib AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(round(
       |      CAST(CAST(CAST(round(ln(1.0 +
       |          (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)), 6)
       |        AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE)
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)), 6)
       |      AS DECIMAL(18,6)) AS c
       |  FROM tf
       |  JOIN qt ON qt.w = tf.w
       |  JOIN dfq ON dfq.w = tf.w
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats),
       |sc AS (SELECT query_id, doc_id, sum(c) AS s FROM contrib
       |  GROUP BY 1, 2),
       |lex AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, doc_id) AS BIGINT) AS rk
       |  FROM sc QUALIFY rk <= 10),
       |v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm
       |  FROM embeddings),
       |vscored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CASE WHEN q.nrm * c.nrm > 0
       |      THEN round(${dotSql("q.e", "c.e", DIM)} / (q.nrm * c.nrm), 6)
       |    END AS cos_sim
       |  FROM v q JOIN v c ON q.vec_id < 3 AND q.vec_id <> c.vec_id),
       |vec AS (SELECT query_id, neighbor_id AS doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM vscored QUALIFY rk <= 10),
       |fused AS (
       |  SELECT COALESCE(l.query_id, vv.query_id) AS query_id,
       |    COALESCE(l.doc_id, vv.doc_id) AS doc_id,
       |    l.rk AS lex_rk, vv.rk AS vec_rk,
       |    COALESCE(CAST(round(1.0 / (60 + l.rk), 6) AS DECIMAL(18,6)),
       |      CAST(0 AS DECIMAL(18,6))) +
       |    COALESCE(CAST(round(1.0 / (60 + vv.rk), 6) AS DECIMAL(18,6)),
       |      CAST(0 AS DECIMAL(18,6))) AS f
       |  FROM lex l FULL OUTER JOIN vec vv
       |    ON l.query_id = vv.query_id AND l.doc_id = vv.doc_id)
       |SELECT query_id, rk, doc_id, lex_rk, vec_rk,
       |  CAST(CAST(f AS VARCHAR) AS DOUBLE) AS fused
       |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY f DESC, doc_id) AS BIGINT) AS rk FROM fused) z
       |WHERE rk <= 5""".stripMargin)

  /** DSIR importance weighting ([[RetrievalOps.dsirWeights]], Xie et al.
    * NeurIPS 2023): every document weighted by how much more likely its
    * tokens are under the TARGET unigram distribution (the English slice
    * plays the target domain) than under the whole-corpus distribution —
    * the importance-resampling score that steers a 100 TB crawl toward a
    * desired domain. Selection composes with q115's percentile
    * calibration; this query pins the weights themselves. */
  private[queries] val q121 = QueryDef(
    "q121_dsir_weights",
    (s, d) => {
      val docs = Tables.documents(s, d)
      RetrievalOps.dsirWeights(docs, col("doc_id"), col("text"),
        docs.where(col("lang") === "en"), col("text"))
    },
    s"""WITH rt AS (SELECT w FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
       |  WHERE length(w) > 0),
       |tt AS (SELECT w FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents
       |    WHERE lang = 'en') t WHERE length(w) > 0),
       |rc AS (SELECT w, CAST(count(*) AS BIGINT) AS rc FROM rt GROUP BY w),
       |tc AS (SELECT w, CAST(count(*) AS BIGINT) AS tc FROM tt GROUP BY w),
       |vocab AS (SELECT w FROM rc UNION SELECT w FROM tc),
       |sizes AS (SELECT
       |    (SELECT sum(rc) FROM rc) AS rtot,
       |    (SELECT sum(tc) FROM tc) AS ttot,
       |    (SELECT count(*) FROM vocab) AS v),
       |lr AS (SELECT vocab.w,
       |    CAST(round(ln((COALESCE(tc.tc, 0) + 1)
       |        / CAST(sizes.ttot + sizes.v AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) -
       |    CAST(round(ln((COALESCE(rc.rc, 0) + 1)
       |        / CAST(sizes.rtot + sizes.v AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) AS lr
       |  FROM vocab LEFT JOIN rc ON rc.w = vocab.w
       |  LEFT JOIN tc ON tc.w = vocab.w CROSS JOIN sizes),
       |dw AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents) t WHERE length(w) > 0),
       |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    sum(lr) AS s
       |  FROM dw JOIN lr ON lr.w = dw.w GROUP BY doc_id)
       |SELECT doc_id, n_tokens,
       |  CAST(CAST(s AS VARCHAR) AS DOUBLE) AS log_weight,
       |  round(CAST(CAST(s AS VARCHAR) AS DOUBLE) / n_tokens, 6)
       |    AS avg_log_weight
       |FROM s""".stripMargin)

  /** Incremental BM25 index maintenance ([[RetrievalOps
    * .bm25StatsUpdate]]): the df table and scalar stats of a 90% corpus
    * folded with the remaining 10% as a new-document delta — and the
    * oracle computes the SAME statistics over the full corpus directly,
    * so the hash match IS the maintenance invariant
    * `update(stats(A), B) ≡ stats(A ∪ B)`. This is what retires the
    * standing-query index's "re-fit → restart" recompute: a delta folds
    * in with one word-keyed merge + one 1-row addition. */
  private[queries] val q122 = QueryDef(
    "q122_bm25_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
      val delta = docs.where(col("doc_id") % 10 === 0)
      val (df1, st1) = RetrievalOps.bm25StatsUpdate(
        RetrievalOps.bm25CorpusDf(corpus, col("doc_id"), col("text")),
        RetrievalOps.bm25CorpusStats(corpus, col("doc_id"), col("text")),
        delta, col("doc_id"), col("text"))
      df1.crossJoin(broadcast(st1))
        .select(col("word"), col("df"), col("n_docs"), col("n_docs_tok"),
          col("n_tokens"))
    },
    s"""WITH words AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents) t WHERE length(w) > 0),
       |d AS (SELECT w AS word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM words GROUP BY 1),
       |st AS (SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       |    (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM words)
       |      AS n_docs_tok,
       |    (SELECT CAST(count(*) AS BIGINT) FROM words) AS n_tokens)
       |SELECT word, df, n_docs, n_docs_tok, n_tokens
       |FROM d CROSS JOIN st""".stripMargin)

  /** Retrieval-quality gate ([[RetrievalOps.ndcgAtK]]): nDCG@10 of the
    * lexical and the hybrid rankings against cosine-graded relevance —
    * the q82 recall-gate pattern applied to ranked retrieval. Query docs
    * (ids < 3) are excluded from both corpora so self-matches cannot
    * flatter either leg; relevance is the clamped rounded cosine of the
    * query/doc embeddings (unjudged = 0, the standard convention). The
    * vector leg's nDCG would be 1 by construction (it IS the relevance
    * order), so the report carries the two rankings whose quality is NOT
    * definitional. */
  private[queries] val q123 = QueryDef(
    "q123_retrieval_ndcg",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val corpusD = docs.where(col("doc_id") >= 3)
      val corpusE = emb.where(col("vec_id") >= 3)
      val qD = docs.where(col("doc_id") < 3)
      val qE = emb.where(col("vec_id") < 3)
      val lex = RetrievalOps.bm25TopK(corpusD, col("doc_id"), col("text"),
        qD, col("doc_id"), col("text"), 10)
      val vec = SimilarityOps.bruteForceTopK(corpusE, qE,
        col("vec_id"), col("embedding"), 10)
      val hybrid = RetrievalOps.rrfFuse(lex, vec, 10)
      val rels = SimilarityOps.bruteForceTopK(corpusE, qE,
        col("vec_id"), col("embedding"), 1000000)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          greatest(coalesce(col("cos_sim"), lit(0.0)), lit(0.0))
            .cast("decimal(18,6)").as("rel"))
      def face(name: String, ranking: org.apache.spark.sql.DataFrame) =
        RetrievalOps.ndcgAtK(
          ranking.select(col("query_id"), col("doc_id"), col("rk")),
          rels, 10)
          .select(lit(name).as("method"), col("query_id"),
            col("dcg"), col("idcg"), col("ndcg"))
      face("lexical",
        lex.select(col("query_id"), col("doc_id"), col("rk")))
        .unionAll(face("hybrid",
          hybrid.select(col("query_id"), col("doc_id"), col("rk"))))
    },
    s"""WITH v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm
       |  FROM embeddings),
       |vcos AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |    CASE WHEN q.nrm * c.nrm > 0
       |      THEN round(${dotSql("q.e", "c.e", DIM)} / (q.nrm * c.nrm), 6)
       |    END AS cos_sim
       |  FROM v q JOIN v c ON q.vec_id < 3 AND c.vec_id >= 3),
       |rel AS (SELECT query_id, doc_id,
       |    CAST(greatest(COALESCE(cos_sim, 0), 0) AS DECIMAL(18,6)) AS rel
       |  FROM vcos),
       |vec AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS rk
       |  FROM vcos QUALIFY rk <= 10),
       |corp AS (SELECT * FROM documents WHERE doc_id >= 3),
       |words AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM corp) t WHERE length(w) > 0),
       |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       |  FROM words GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
       |  FROM tf GROUP BY 1),
       |stats AS (SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM corp) AS n_docs,
       |    (SELECT avg(CAST(dl AS DOUBLE)) FROM dl) AS avgdl),
       |qt AS (SELECT DISTINCT doc_id AS query_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents WHERE doc_id < 3) t WHERE length(w) > 0),
       |dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf
       |  WHERE w IN (SELECT w FROM qt) GROUP BY w),
       |contrib AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(round(
       |      CAST(CAST(CAST(round(ln(1.0 +
       |          (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)), 6)
       |        AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE)
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)), 6)
       |      AS DECIMAL(18,6)) AS c
       |  FROM tf
       |  JOIN qt ON qt.w = tf.w
       |  JOIN dfq ON dfq.w = tf.w
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats),
       |sc AS (SELECT query_id, doc_id, sum(c) AS s FROM contrib
       |  GROUP BY 1, 2),
       |lex AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, doc_id) AS BIGINT) AS rk
       |  FROM sc QUALIFY rk <= 10),
       |fused AS (
       |  SELECT COALESCE(l.query_id, vv.query_id) AS query_id,
       |    COALESCE(l.doc_id, vv.doc_id) AS doc_id,
       |    COALESCE(CAST(round(1.0 / (60 + l.rk), 6) AS DECIMAL(18,6)),
       |      CAST(0 AS DECIMAL(18,6))) +
       |    COALESCE(CAST(round(1.0 / (60 + vv.rk), 6) AS DECIMAL(18,6)),
       |      CAST(0 AS DECIMAL(18,6))) AS f
       |  FROM lex l FULL OUTER JOIN vec vv
       |    ON l.query_id = vv.query_id AND l.doc_id = vv.doc_id),
       |hyb AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY f DESC, doc_id) AS BIGINT) AS rk
       |  FROM fused QUALIFY rk <= 10),
       |idcg AS (SELECT query_id,
       |    sum(CAST(round(CAST(CAST(rel AS VARCHAR) AS DOUBLE)
       |      / log2(irk + 1), 6) AS DECIMAL(18,6))) AS idcg
       |  FROM (SELECT query_id, rel,
       |      CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY rel DESC, doc_id) AS BIGINT) AS irk
       |    FROM rel) t WHERE irk <= 10 GROUP BY query_id),
       |faces AS (
       |  SELECT 'lexical' AS method, query_id, doc_id, rk FROM lex
       |  UNION ALL SELECT 'hybrid', query_id, doc_id, rk FROM hyb),
       |dcg AS (SELECT method, f.query_id,
       |    sum(CAST(round(CAST(CAST(COALESCE(rel.rel,
       |        CAST(0 AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
       |      / log2(f.rk + 1), 6) AS DECIMAL(18,6))) AS dcg
       |  FROM faces f LEFT JOIN rel
       |    ON rel.query_id = f.query_id AND rel.doc_id = f.doc_id
       |  GROUP BY 1, 2)
       |SELECT d.method, d.query_id,
       |  CAST(CAST(d.dcg AS VARCHAR) AS DOUBLE) AS dcg,
       |  CAST(CAST(i.idcg AS VARCHAR) AS DOUBLE) AS idcg,
       |  CASE WHEN i.idcg > 0 THEN
       |    round(CAST(CAST(d.dcg AS VARCHAR) AS DOUBLE)
       |      / CAST(CAST(i.idcg AS VARCHAR) AS DOUBLE), 6)
       |  ELSE 0.0 END AS ndcg
       |FROM dcg d JOIN idcg i ON d.query_id = i.query_id""".stripMargin)
  private[queries] val q124 = QueryDef(
    "q124_span_corruption",
    (s, d) => graft.operators.TextOps.spanCorruptionMask(
      Tables.documents(s, d), col("doc_id"), col("text"),
      SpanMaskRate, SpanMean),
    {
      val maxL = 2 * SpanMean - 1
      val thr = math.round(SpanMaskRate / SpanMean * 1e6)
      s"""WITH base AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws,
         |    ((${polyHashSql("text")} * 31 + doc_id) % $P + $P) % $P AS mix
         |  FROM documents),
         |pos AS (SELECT doc_id, i, ws[i] AS tok,
         |    ((mix + i) * 2654435761) % $P AS d
         |  FROM base, UNNEST(generate_series(1, len(ws))) AS t(i)),
         |sp AS (SELECT doc_id, i, tok,
         |    (d % 1000000 < $thr) AS st,
         |    1 + (d // 1000000) % $maxL AS ln
         |  FROM pos),
         |mk AS (SELECT p.doc_id, p.i AS j, p.tok,
         |    max(CASE WHEN s.st AND p.i < s.i + s.ln THEN 1 ELSE 0 END)
         |      AS m
         |  FROM sp p LEFT JOIN sp s
         |    ON s.doc_id = p.doc_id AND s.i BETWEEN p.i - ${maxL - 1} AND p.i
         |  GROUP BY 1, 2, 3),
         |rn AS (SELECT doc_id, j, tok, m,
         |    CASE WHEN m = 1 AND COALESCE(lag(m) OVER w, 0) = 0
         |      THEN 1 ELSE 0 END AS rs
         |  FROM mk WINDOW w AS (PARTITION BY doc_id ORDER BY j)),
         |kk AS (SELECT doc_id, j, tok, m, rs,
         |    sum(rs) OVER (PARTITION BY doc_id ORDER BY j) - 1 AS k
         |  FROM rn),
         |strs AS (SELECT doc_id,
         |    COALESCE(string_agg(
         |      CASE WHEN m = 0 THEN tok
         |        WHEN rs = 1 THEN '<extra_id_' || k || '>' END,
         |      ' ' ORDER BY j), '') AS inp,
         |    COALESCE(string_agg(
         |      CASE WHEN m = 1 AND rs = 1
         |          THEN '<extra_id_' || k || '> ' || tok
         |        WHEN m = 1 THEN tok END,
         |      ' ' ORDER BY j), '') AS tgt,
         |    CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(m) AS BIGINT) AS n_masked,
         |    CAST(sum(rs) AS BIGINT) AS n_spans
         |  FROM kk GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_masked, n_spans,
         |  CAST(length(inp) AS BIGINT) AS input_len,
         |  CASE WHEN inp = '' THEN 0 ELSE ${polyHashSql("inp")} END
         |    AS input_fp,
         |  -- string_split('', '') yields [''] and unicode('') = -1 in
         |  -- DuckDB, so the empty string must hash to 0 explicitly (the
         |  -- Spark expression's value)
         |  CASE WHEN tgt = '' THEN 0 ELSE ${polyHashSql("tgt")} END
         |    AS target_fp
         |FROM strs""".stripMargin
    })

  /** Prefix-LM pair construction ([[TextOps.prefixLmSplit]]) — the
    * sequential-denoising companion to q124: deterministic hash-drawn
    * split of every doc into non-empty prefix/continuation, both sides'
    * fingerprints hash-pinned. */
  private[queries] val q125 = QueryDef(
    "q125_prefix_lm_split",
    (s, d) => graft.operators.TextOps.prefixLmSplit(
      Tables.documents(s, d), col("doc_id"), col("text")),
    s"""WITH base AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws,
       |    ((((${polyHashSql("text")} * 31 + doc_id) % $P + $P) % $P)
       |      * 2654435761) % $P AS d
       |  FROM documents),
       |sp AS (SELECT doc_id, ws, len(ws) AS n,
       |    CASE WHEN len(ws) >= 2 THEN 1 + d % (len(ws) - 1)
       |      ELSE len(ws) END AS s
       |  FROM base),
       |strs AS (SELECT doc_id, n, s,
       |    array_to_string(ws[1:s], ' ') AS pre,
       |    CASE WHEN n > s THEN array_to_string(ws[s+1:n], ' ')
       |      ELSE '' END AS tgt
       |  FROM sp)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |  CAST(s AS BIGINT) AS split_at,
       |  CASE WHEN pre = '' THEN 0 ELSE ${polyHashSql("pre")} END
       |    AS prefix_fp,
       |  CASE WHEN tgt = '' THEN 0 ELSE ${polyHashSql("tgt")} END
       |    AS target_fp
       |FROM strs""".stripMargin)

  /** Gopher repetition rules ([[TextOps.gopherRepetition]], Rae et al.
    * 2021 Table A1): thirteen per-document self-repetition signals + the
    * keep verdict at the published thresholds, all hash-pinned — the
    * oracle replays line/paragraph duplicate accounting, top-n-gram
    * selection (count >= 2, lexicographic ties), and per-character
    * duplicated-n-gram coverage through the shared [[repetitionCtes]]
    * chain (q117 threads the same chain over its funnel survivors). The
    * corpus has no newlines, so the line/paragraph legs gate the zero
    * path here; RepetitionSpec pins them on multi-line fixtures against
    * the reference model. */
  private[queries] val q126 = QueryDef(
    "q126_repetition_signals",
    (s, d) => TextOps.gopherRepetition(
      Tables.documents(s, d), col("doc_id"), col("text")),
    s"""WITH ${repetitionCtes("documents", "rg")}
       |SELECT * FROM rgkeep""".stripMargin)

  /** DPR-style hard-negative mining ([[RetrievalOps.hardNegatives]],
    * Karpukhin et al. 2020): per query the top lexically-confusable
    * candidates that fail the semantic-positive check, in BM25 order —
    * the oracle replays the full q120 lexical chain, the candidate
    * cosines (NULL-guarded), the NOT-positive filter (NULL ⇒ negative,
    * the unverifiable-stays-negative convention), and the re-rank. The
    * query doc itself (cosine 1) is excluded by the positive check, not
    * by an id rule — the same mechanism that removes any other true
    * positive. */
  private[queries] val q127 = QueryDef(
    "q127_hard_negatives",
    (s, d) => {
      val docs = Tables.documents(s, d)
      RetrievalOps.hardNegatives(docs, col("doc_id"), col("text"),
        docs.where(col("doc_id") < 3), col("doc_id"), col("text"),
        Tables.embeddings(s, d), col("vec_id"), col("embedding"),
        10, COSINE_T, 5)
    },
    s"""WITH words AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents) t WHERE length(w) > 0),
       |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       |  FROM words GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
       |  FROM tf GROUP BY 1),
       |stats AS (SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       |    (SELECT avg(CAST(dl AS DOUBLE)) FROM dl) AS avgdl),
       |qt AS (SELECT DISTINCT doc_id AS query_id, w FROM words
       |  WHERE doc_id < 3),
       |dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf
       |  WHERE w IN (SELECT w FROM qt) GROUP BY w),
       |contrib AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(round(
       |      CAST(CAST(CAST(round(ln(1.0 +
       |          (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)), 6)
       |        AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE)
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)), 6)
       |      AS DECIMAL(18,6)) AS c
       |  FROM tf
       |  JOIN qt ON qt.w = tf.w
       |  JOIN dfq ON dfq.w = tf.w
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats),
       |sc AS (SELECT query_id, doc_id, sum(c) AS s FROM contrib
       |  GROUP BY 1, 2),
       |lex AS (SELECT query_id, doc_id, s,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, doc_id) AS BIGINT) AS rk
       |  FROM sc QUALIFY rk <= 10),
       |v AS (SELECT vec_id, embedding AS e,
       |    sqrt(${dotSql("embedding", "embedding", DIM)}) AS nrm
       |  FROM embeddings),
       |cand AS (SELECT l.query_id, l.rk AS bm25_rk, l.doc_id,
       |    CAST(CAST(l.s AS VARCHAR) AS DOUBLE) AS bm25_score,
       |    CASE WHEN q.nrm * c.nrm > 0
       |      THEN round(${dotSql("q.e", "c.e", DIM)} / (q.nrm * c.nrm), 6)
       |    END AS cos_sim
       |  FROM lex l
       |  LEFT JOIN v q ON q.vec_id = l.query_id
       |  LEFT JOIN v c ON c.vec_id = l.doc_id),
       |neg AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY bm25_rk) AS BIGINT) AS neg_rk
       |  FROM cand WHERE NOT COALESCE(cos_sim >= $COSINE_T, FALSE))
       |SELECT query_id, neg_rk, doc_id, bm25_rk, bm25_score, cos_sim
       |FROM neg WHERE neg_rk <= 5""".stripMargin)
}
