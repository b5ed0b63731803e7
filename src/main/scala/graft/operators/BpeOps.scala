package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer FITTING — the piece of a training-data
  * pipeline that turns the curated corpus into the model's own
  * vocabulary (public method: Sennrich, Haddow, Birch, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016; the
  * word-frequency formulation is the reference implementation's).
  *
  * The fit runs on the WORD-FREQUENCY table, not the corpus: pair counts
  * are identical whether summed over 100 TB of text or over its
  * vocab-sized `(word, freq)` aggregate, so one corpus-wide word count
  * (the [[TextOps.vocabulary]] shuffle) reduces every subsequent
  * iteration to vocab-scale work — the standard trick that makes BPE
  * fitting tractable at scale (production fits additionally sample; the
  * operator takes whatever frame it is given). Each of the `numMerges`
  * iterations is one distributed pair-count aggregation plus a 1-row
  * argmax collect (count desc, then lexicographic — fully
  * deterministic), then a row-local fold rewrites the symbol arrays;
  * intermediate tables are persisted and released iteration-over-
  * iteration (the q48 lifecycle rule) so lineage never re-derives the
  * whole chain.
  *
  * Symbols follow the paper: a word is its characters plus a terminal
  * [[EndOfWord]] marker, so learned units distinguish "est-" from
  * "-est". Merging is the greedy LEFT-TO-RIGHT non-overlapping rewrite
  * ("aaa" + merge (a,a) → ["aa","a"]), expressed as an `aggregate` HOF —
  * codegen'd column arithmetic, no UDF. */
object BpeOps {

  /** Terminal symbol closing every word (the paper's `</w>`). */
  val EndOfWord = "</w>"

  /** `(word, freq)` over whitespace words — the fit input. */
  def wordFreqs(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(text, " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** A word as its BPE start symbols: characters + [[EndOfWord]]. */
  def toSymbols(word: Column): Column =
    concat(filter(split(word, ""), s => s =!= ""), array(lit(EndOfWord)))

  /** A word as BYTE-level BPE start symbols: its UTF-8 octets as
    * uppercase hex pairs (Spark `hex()` casing), NO end-of-word marker
    * — the GPT-2-family base alphabet (Radford et al. 2019 §2.2): 256
    * symbols cover every input, so the apply can never emit UNK and
    * `decode ∘ encode` is the identity by construction. Hex-pair
    * strings keep the whole fit/apply machinery ([[mergePair]],
    * [[bpeLearn]], [[graft.functions.BpeEncode]]) verbatim: a merge is
    * still string concatenation, and a merged token's byte payload is
    * just its hex unpaired. */
  def toByteSymbols(word: Column): Column = {
    val h = hex(encode(word, "UTF-8"))
    // empty-word guard (r16 advice): sequence(1, 0) DESCENDS in Spark
    // ([1, 0]), which would mint two phantom ''-symbols; an empty word
    // has no byte symbols. wordFreqs/preTokenFreqs never produce empty
    // words, but the helper is a public operator. NULL passthrough (r17
    // advice): only the genuinely EMPTY word maps to the empty array — a
    // NULL word stays NULL (`length(h) === 0` is NULL for NULL input, so
    // neither branch fires and the `when` chain yields NULL).
    when(length(h) > 0,
      transform(sequence(lit(1), (length(h) / lit(2)).cast("int")),
        i => h.substr(i * 2 - 1, lit(2))))
      .when(length(h) === 0, array().cast("array<string>"))
  }

  /** Greedy left-to-right non-overlapping rewrite of one merge over a
    * symbol array — the BPE inner loop as a stateless fold: append each
    * symbol, except when the accumulator's last element is `left` and
    * the symbol is `right`, in which case the pair collapses to
    * `left+right` (and, having consumed the left, cannot chain into an
    * overlapping second merge — the "aaa" case). */
  def mergePair(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, t) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(left) && t === lit(right),
        concat(slice(acc, lit(1), size(acc) - lit(1)),
          array(lit(left + right))))
        .otherwise(concat(acc, array(t))))

  /** Learn `numMerges` merges over `freqs` (a [[wordFreqs]] frame).
    * Returns `(rank, left, right, pair_count)` in learn order; stops
    * early when no pair reaches `minPairCount` (merging noise pairs
    * below it buys vocabulary slots nothing). Iterative by nature —
    * each rank's counts depend on every earlier rewrite — so the driver
    * coordinates `numMerges` vocab-scale jobs; the corpus itself is
    * touched only by the one [[wordFreqs]] aggregation. */
  def bpeLearn(freqs: DataFrame, numMerges: Int,
      minPairCount: Long = 2L,
      symbolize: Column => Column = toSymbols): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = freqs.sparkSession
    import spark.implicits._
    // Lineage discipline (the q51 checkpoint lifecycle): a persist()
    // chain caches DATA but the analyzed plan still nests — after k
    // rewrites every new query re-analyzes k stacked fold projections,
    // so iteration cost grows with k and the fit goes quadratic
    // (measured: 16 merges at sf0.1 took ~100 s chained vs ~5 s with
    // per-iteration plan truncation). Each round therefore eagerly
    // localCheckpoints the rewritten table — its plan collapses to the
    // materialized RDD — and frees the superseded round's blocks. The
    // table is also compacted up front: vocab-scale rows on the corpus's
    // full partition width would spend the loop's tiny jobs on task
    // scheduling.
    def freeCheckpoint(df: DataFrame): Unit =
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    var words = freqs.repartition(4)
      .select(symbolize(col("word")).as("toks"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    try {
      var done = false
      var rank = 0L
      while (!done && rank < numMerges) {
        val best = words
          .select(explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - lit(1)),
            slice(col("toks"), lit(2), size(col("toks")) - lit(1)),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("freq"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.isEmpty || best.head.getLong(2) < minPairCount) done = true
        else {
          val (l, r, n) = (best.head.getString(0), best.head.getString(1),
            best.head.getLong(2))
          merges += ((rank, l, r, n))
          val next = words.select(mergePair(col("toks"), l, r).as("toks"),
            col("freq")).localCheckpoint(true)
          freeCheckpoint(words) // superseded: next is already materialized
          words = next
          rank += 1
        }
      }
    } finally freeCheckpoint(words)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** PRODUCTION-SCALE fit (r16 verdict item 4 — the SentencePiece /
    * HF-trainer shape): cap the word-frequency table to its `maxWords`
    * highest-frequency rows (freq desc, word asc — deterministic),
    * collect that BOUNDED frame once, and run the merge loop
    * DRIVER-SIDE over the in-memory table. [[bpeLearn]]'s distributed
    * loop is exact but serializes `numMerges` cluster rounds — at a
    * real 32k–100k vocabulary that is tens of thousands of SEQUENTIAL
    * distributed jobs (scheduling alone dominates), which does not
    * survive 100×. Here the cluster does ONE corpus-scale aggregation
    * (the [[wordFreqs]] input, the only thing that touches the 100 TB)
    * plus one vocab-scale top-k; the 32k merge iterations then touch
    * only the local frequency table — the published trainer recipe
    * (HuggingFace `BpeTrainer` / SentencePiece both fit over an
    * in-memory word-count table). The head-capped table is the right
    * sample: pair counts are freq-weighted, so rank-(maxWords+1)
    * tail words contribute at most their (tiny) frequency to any
    * count. Per-iteration semantics are IDENTICAL to [[bpeLearn]] —
    * same frequency-multiplicity pair counting, same
    * (count desc, left, right) UTF8-binary argmax, same greedy
    * left-to-right non-overlapping rewrite — so
    * `bpeLearnSampled(freqs, n, maxWords ≥ |freqs|)` ≡
    * `bpeLearn(freqs, n)` exactly (the BpeSpec parity pin). Returns
    * [[bpeLearn]]'s `(rank, left, right, pair_count)` frame. */
  def bpeLearnSampled(freqs: DataFrame, numMerges: Int,
      maxWords: Int = 1 << 16, minPairCount: Long = 2L,
      byteLevel: Boolean = false): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = freqs.sparkSession
    import spark.implicits._
    val top = freqs.orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)].collect()
    val words = top.map { case (w, f) => (localSymbols(w, byteLevel), f) }
    localMergeLoop(words, numMerges, minPairCount)
      .toDF("rank", "left", "right", "pair_count")
  }

  /** [[toSymbols]]/[[toByteSymbols]] on a driver-side string: same
    * code-UNIT split as Spark's `split(w, "")` (a surrogate pair is two
    * symbols on both paths), same uppercase hex as `hex()`. */
  private[operators] def localSymbols(w: String,
      byteLevel: Boolean): Array[String] =
    if (byteLevel)
      w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xff}%02X")
    else w.toArray.map(_.toString) :+ EndOfWord

  /** UTF8-binary string order — Spark's `orderBy` collation for the
    * argmax tie-break (Java `compareTo` differs on supplementary
    * chars). */
  private[operators] def utf8Lt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  /** The driver-side merge loop: per iteration one pair-count pass
    * (frequency multiplicity, exactly the zip_with-slices explode),
    * the (count desc, left, right) argmax, and the greedy
    * non-overlapping rewrite. */
  private def localMergeLoop(words0: Array[(Array[String], Long)],
      numMerges: Int, minPairCount: Long)
      : Seq[(Long, String, String, Long)] = {
    var words = words0
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var rank = 0L
    var done = false
    while (!done && rank < numMerges) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, f) =>
        var i = 0
        while (i + 1 < s.length) {
          val p = (s(i), s(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      var bestP: (String, String) = null
      var bestN = 0L
      counts.foreach { case (p, n) =>
        if (bestP == null || n > bestN ||
            (n == bestN && (utf8Lt(p._1, bestP._1) ||
              (p._1 == bestP._1 && utf8Lt(p._2, bestP._2)))))
          { bestP = p; bestN = n }
      }
      if (bestP == null || bestN < minPairCount) done = true
      else {
        out += ((rank, bestP._1, bestP._2, bestN))
        val merged = bestP._1 + bestP._2
        words = words.map { case (s, f) =>
          (rewriteLocal(s, bestP._1, bestP._2, merged), f) }
        rank += 1
      }
    }
    out.toSeq
  }

  /** Greedy left-to-right non-overlapping rewrite — [[mergePair]]'s
    * scan form (a merge consumes its left, so "aaa" + (a,a) →
    * ["aa","a"], byte-equal to the fold: a fold-merged token `l+r`
    * can never re-match `l`, since symbols are non-empty). */
  private[operators] def rewriteLocal(s: Array[String], l: String,
      r: String, merged: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        b += merged
        i += 2
      } else {
        b += s(i)
        i += 1
      }
    }
    b.result()
  }

  /** Tokens of `text` under an ORDERED merge list as a COMPOSABLE
    * expression: per word, the char symbols folded through every merge in
    * rank order, flattened across words. One expression node chain per
    * merge — this is the executable SPEC of the apply semantics (each
    * fold is [[mergePair]], auditable), and the parity reference
    * [[bpeTokensCompiled]] is pinned against in BpeSpec. Plan size grows
    * with the merge count, so it is only the right form for bounded merge
    * lists; production tokenization is [[bpeTokensCompiled]]. */
  def bpeTokensExpr(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(
      filter(split(text, " "), w => length(w) > 0),
      w => merges.foldLeft(toSymbols(w)) { case (s, (l, r)) =>
        mergePair(s, l, r) }))

  /** Tokens of `text` under an ORDERED merge list, COMPILED
    * ([[graft.functions.BpeEncode]]): the merge table is data inside one
    * codegen'd expression, not plan structure — the plan is the same
    * three nodes at 16 merges or 32 k, and the per-word cost is
    * O(len^2) rank probes independent of vocabulary size (plus a
    * per-thread word cache for the Zipf head). Same function as
    * [[bpeTokensExpr]] — fold-by-rank semantics, parity pinned in
    * BpeSpec — at production vocabulary scale (the r11 verdict item 3;
    * MicroBench bpe_apply_* rows measure the chain's blow-up vs this). */
  def bpeTokensCompiled(spark: org.apache.spark.sql.SparkSession,
      text: Column, merges: Seq[(String, String)]): Column = {
    graft.functions.BpeExpressions.register(spark)
    graft.functions.BpeExpressions.bpeEncode(text, merges)
  }

  /** Per-doc tokenization under a learned merge table ([[bpeLearn]]
    * output — collected in rank order; merge tables are vocab-sized by
    * construction, the broadcast-side convention), on the compiled
    * vocabulary-scale-safe path. Output `(doc_id, tokens, n_tokens)`. */
  def bpeTokenize(docs: DataFrame, id: Column, text: Column,
      merges: DataFrame): DataFrame = {
    val m = merges.orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val toks = bpeTokensCompiled(docs.sparkSession, text, m)
    docs.select(id.as("doc_id"), toks.as("tokens"),
      size(toks).cast("long").as("n_tokens"))
  }

  /** Tokenizer fertility / compression audit — the per-group QA table a
    * multilingual tokenizer fit is judged by (the fertility comparisons
    * of the XLM-R / BLOOM tokenizer analyses): per `group` (language,
    * source), exact-long sums of whitespace words, fitted-BPE tokens,
    * and word characters, plus the two ratios tokenizer QA thresholds —
    * `fertility` = tokens per word (how many subwords a word shatters
    * into under the fitted vocabulary) and `chars_per_token` (the
    * inverse compression rate). A group whose fertility is an outlier
    * is under-served by the vocabulary — its text costs proportionally
    * more sequence positions per word — which is the trigger for
    * re-fitting on a rebalanced sample ([[TextOps.temperatureMix]]).
    * `n_chars` counts WORD characters (the tokens partition exactly
    * those, the round-trip contract), so chars/token and chars/word
    * share one denominator universe. One row-local compiled-encode pass
    * ([[bpeTokensCompiled]]) + one group-sized aggregation; ratios are
    * doubles off exact long sums, rounded 1e-6. */
  def tokenizerFertility(docs: DataFrame, id: Column, text: Column,
      group: Column, merges: DataFrame): DataFrame = {
    val m = merges.orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val toks = bpeTokensCompiled(docs.sparkSession, text, m)
    val words = filter(split(text, " "), w => length(w) > 0)
    docs
      .select(group.as("grp"),
        size(words).cast("long").as("_w"),
        size(toks).cast("long").as("_t"),
        aggregate(words, lit(0L), (acc, x) => acc + length(x).cast("long"))
          .as("_c"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_w")).as("n_words"),
        sum(col("_t")).as("n_tokens"), sum(col("_c")).as("n_chars"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          round(col("n_tokens").cast("double") / col("n_words"), 6)))
      .withColumn("chars_per_token",
        when(col("n_tokens") > 0,
          round(col("n_chars").cast("double") / col("n_tokens"), 6)))
  }

  /** GPT-style pre-tokenization pattern (Radford et al. 2019 §2.2's
    * published regex, reformulated WITHOUT the trailing-whitespace
    * lookahead `\s+(?!\S)` so RE2 — the oracle engine's regex — and
    * Java agree): contraction suffixes split off, letters / numbers /
    * other-symbols form runs each carrying an optional LEADING space,
    * whitespace runs survive as their own tokens. The alternation
    * covers every character class, so the matches PARTITION the input
    * exactly — `concat(preTokens) == text`, the identity the spec pins.
    *
    * On its own this pattern keeps a multi-whitespace run as ONE
    * pre-token; the published pattern's lookahead instead donates the
    * run's last char to the next token. [[gptPreTokenize]] restores
    * that fidelity with a lookahead-free pre-split (see
    * [[GptWsSplitPattern]]) — this pattern is then applied per
    * segment, where the two formulations agree.
    *
    * The whitespace class is EXPLICIT — the full Unicode
    * White_Space=Yes set ([[GptWsClass]]) spelled out code point by
    * code point rather than `\s`, for TWO reasons: the engines'
    * shorthand classes disagree (Java's `\s` is ASCII-without-NBSP,
    * RE2's omits vertical tab), and the published GPT-2 pattern's `\s`
    * is PYTHON `regex`, which IS Unicode-aware — U+00A0 (NBSP, what
    * `&nbsp;`-derived HTML text carries), the typographic spaces
    * U+2000–U+200A, the line/paragraph separators, U+202F/U+205F, and
    * the ideographic space U+3000 are all whitespace to the reference
    * tokenizer (r17 verdict item 1; r16 left them in the 'other
    * symbols' run, which made token streams on web/CJK text
    * incomparable to any real GPT-2 tokenizer). The explicit class
    * keeps Java, RE2, and the compiled kernel in exact lockstep and
    * preserves the partition identity. Only U+0020 itself can ride a
    * run's ` ?` or be donated across a `\s+(?!\S)` boundary — the
    * published pattern's ` ?` is a LITERAL space, so an NBSP or
    * ideographic space at a run boundary stands alone like a tab. */
  val GptWsClass: String =
    """ \t\n\x0B\f\r\x{0085}\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}"""

  val GptPreTokenPattern: String =
    s"""'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^$GptWsClass\\p{L}\\p{N}]+|[$GptWsClass]+"""

  /** The lookahead-free twin of the published pattern's `\s+(?!\S)`
    * (r16 verdict item 3): inside any whitespace run of ≥ 2 chars
    * followed by non-whitespace, mark a boundary BEFORE the run's last
    * char — exactly where `\s+(?!\S)`'s backtracking ends its match.
    * One global regexp_replace inserts [[GptWsSplitSep]] at each such
    * boundary (matches cannot overlap: each needs two whitespace chars
    * then a non-whitespace, so a run yields exactly one boundary);
    * re-tokenizing the segments with [[GptPreTokenPattern]] then
    * reproduces the published segmentation INCLUDING its corner cases
    * — a donated space is absorbed by the next run's ` ?`, a donated
    * tab stands alone, a space before a contraction re-segments as
    * `" '" + letters` with the letters merging into a following
    * letter run — because the true tokenization never crosses this
    * boundary and both patterns are context-free within a segment. */
  val GptWsSplitPattern: String =
    s"""([$GptWsClass])([$GptWsClass][^$GptWsClass])"""

  /** Segment separator for [[GptWsSplitPattern]]'s pre-split: a
    * private-use code point. A corpus text already containing U+E000
    * would gain a spurious (engine-CONSISTENT — both sides run the
    * same replace+split) segment boundary; the synthetic corpus and
    * every fixture are clean of it. */
  val GptWsSplitSep: String = "\uE000"

  /** Text as GPT-style pre-tokens: the published GPT-2 segmentation
    * (Radford et al. 2019 §2.2). Production path is the ONE-SCAN
    * compiled kernel ([[graft.functions.GptPreTokenize]] — zero regex
    * on the path every tokenized byte of a 100 TB corpus walks);
    * [[gptPreTokenizeExpr]] keeps the lookahead-free two-regex-pass
    * Column form as the oracle-mirrored executable reference
    * ([[gptPreTokensSql]] is ITS verbatim SQL twin), and BpeSpec pins
    * kernel ≡ reference on the GPT-2 fixtures, randomized strings,
    * and the corpus. Call sites need no registration call — this
    * registers the kernel on the input's session via the expression
    * registry (idempotent). */
  def gptPreTokenize(text: Column): Column = {
    // Fail FAST when no session is active (r17 advice): a silent skip
    // here would surface later as an opaque 'undefined function
    // gpt_pre_tokenize' at analysis time, and in multi-session apps
    // could register on the wrong session. DataFrame-bearing call
    // sites (gptByteBpeTokenize, preTokenFreqs' callers) register on
    // the input frame's own session explicitly.
    val spark = org.apache.spark.sql.SparkSession.getActiveSession
      .getOrElse(throw new IllegalStateException(
        "BpeOps.gptPreTokenize: no active SparkSession on this thread — " +
          "call graft.functions.BpeExpressions.register(session) on the " +
          "DataFrame's session first, or invoke from a thread with an " +
          "active session"))
    graft.functions.BpeExpressions.register(spark)
    graft.functions.BpeExpressions.gptPreTokens(text)
  }

  /** The two-pass Column REFERENCE form of [[gptPreTokenize]] — mark
    * the `\s+(?!\S)` boundaries ([[GptWsSplitPattern]]), split,
    * extract [[GptPreTokenPattern]] per segment, flatten. Two regexp
    * passes + one split per row; NOT the production path (the
    * registeredDomainExpr/canonicalizeExpr precedent), but the form
    * the DuckDB oracles replay verbatim. */
  def gptPreTokenizeExpr(text: Column): Column = {
    // U+E000 guard (r17 advice): the two-pass form uses [[GptWsSplitSep]]
    // as a split sentinel, so input natively containing it would SILENTLY
    // gain a segment boundary — and silently diverge from the one-scan
    // kernel (which needs no sentinel) and break the oracle compare.
    // Assert absence per row instead: a future corpus with private-use
    // code points fails LOUDLY here and in the SQL twin alike.
    val guarded = when(contains(text, lit(GptWsSplitSep)),
        raise_error(lit("gptPreTokenizeExpr: input contains the " +
          "private-use sentinel U+E000 — the two-pass reference form " +
          "cannot segment it; use the gpt_pre_tokenize kernel path"))
          .cast("string"))
      .otherwise(text)
    flatten(transform(
      split(regexp_replace(guarded, GptWsSplitPattern,
        "$1" + GptWsSplitSep + "$2"), GptWsSplitSep),
      s => regexp_extract_all(s, lit(GptPreTokenPattern), lit(0))))
  }

  /** DuckDB twin of [[gptPreTokenize]] over a column expression `text`
    * — a LIST(VARCHAR) expression (quote-escaped; RE2 rewrite
    * backrefs). */
  def gptPreTokensSql(text: String): String = {
    val pat = GptPreTokenPattern.replace("'", "''")
    // chr(57344) = U+E000; same loud sentinel guard as
    // [[gptPreTokenizeExpr]] (DuckDB error() unifies with VARCHAR in a
    // CASE and evaluates lazily per row)
    val err =
      "error('gptPreTokensSql: private-use sentinel U+E000 in input')"
    val guarded = s"""(CASE WHEN contains($text, chr(57344))
       |      THEN $err ELSE $text END)""".stripMargin
    s"""flatten(list_transform(
       |    string_split(regexp_replace($guarded,
       |      '$GptWsSplitPattern', '\\1$GptWsSplitSep\\2', 'g'),
       |      '$GptWsSplitSep'),
       |    s -> regexp_extract_all(s, '$pat')))""".stripMargin
  }

  /** `(word, freq)` over [[gptPreTokenize]] pre-tokens — the fit input
    * for the pre-tokenized byte-BPE face ([[wordFreqs]]'s shape; a
    * pre-token is never empty by construction). */
  def preTokenFreqs(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(gptPreTokenize(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Per-doc PRE-TOKENIZED byte-level BPE — the production GPT shape:
    * [[gptPreTokenize]] segmentation (contractions split, spaces ride
    * INSIDE the following token), each pre-token byte-encoded as one
    * whole unit under the frozen merge table — FUSED into the one-scan
    * [[graft.functions.GptByteBpe]] kernel (r17 verdict item 2: the
    * staged `transform` HOF was CodegenFallback and materialized the
    * pre-token array per document; the fused kernel is one codegen'd
    * scan, zero regex, zero HOF, zero intermediate array).
    * [[gptByteBpeTokenizeStaged]] keeps the two-expression composition
    * as the executable reference, spec-pinned fused ≡ staged. Output
    * `(doc_id, tokens, n_tokens)`; `concat(unhex(tokens))`
    * reconstitutes the FULL text, whitespace included — a stronger
    * identity than the whitespace-word faces. */
  def gptByteBpeTokenize(docs: DataFrame, id: Column, text: Column,
      merges: DataFrame): DataFrame = {
    graft.functions.BpeExpressions.register(docs.sparkSession)
    val m = merges.orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val toks = graft.functions.BpeExpressions.gptByteBpe(text, m)
    // the fused pre-tokenize∘encode kernel is per-row-heavy; spread a
    // tiny single-split scan first (no-op at scale)
    Fanout.spread(docs).select(id.as("doc_id"), toks.as("tokens"),
      size(toks).cast("long").as("n_tokens"))
  }

  /** The GPT-2 vocabulary construction over a [[toByteSymbols]]-fitted
    * merge table (Radford et al. 2019 §2.2 — the `vocab.json`
    * contract): ids 0–255 are the 256 base byte symbols (uppercase
    * hex pairs, the byte tokenizer's alphabet) and id `256 + rank` is
    * merge `rank`'s concatenation. The vocabulary is keyed BY STRING —
    * a merge that re-manufactures an existing token string (a later
    * merge pair whose concatenation collides with an earlier result)
    * does not mint a second id; the SMALLEST id wins, so `n_tokens`
    * may be < 256 + nMerges. Tiny frame (vocab-scale rows); feeds
    * [[graft.functions.BpeExpressions.tokenIds]]'s frozen lookup
    * table. */
  def gptVocab(merges: DataFrame): DataFrame =
    merges.sparkSession.range(256)
      .select(col("id"), lpad(hex(col("id")), 2, "0").as("token"))
      .unionByName(merges.select((col("rank") + lit(256L)).as("id"),
        concat(col("left"), col("right")).as("token")))
      .groupBy("token").agg(min("id").as("id"))
      .select("id", "token")

  /** [[gptByteBpeTokenize]] as trainer-ready integer ids: the fused
    * tokenize kernel followed by the [[graft.functions.BpeExpressions
    * .tokenIds]] hash-probe kernel under the [[gptVocab]] table —
    * `(doc_id, ids, n_tokens)`, both steps one compiled pass, zero
    * shuffle. The id table rides the expression as data (the frozen-
    * model convention); an encoder output missing from the vocabulary
    * throws rather than NULLing — it cannot happen under the matching
    * merge table. */
  def gptByteBpeTokenizeIds(docs: DataFrame, id: Column, text: Column,
      merges: DataFrame): DataFrame = {
    graft.functions.BpeExpressions.register(docs.sparkSession)
    val m = merges.orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val vocab = gptVocab(merges).orderBy("id")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSeq
    val ids = graft.functions.BpeExpressions.tokenIds(
      graft.functions.BpeExpressions.gptByteBpe(text, m), vocab)
    // see gptByteBpeTokenize's fan-out note
    Fanout.spread(docs).select(id.as("doc_id"), ids.as("ids"),
      size(ids).cast("long").as("n_tokens"))
  }

  /** [[gptByteBpeTokenize]] with ATOMIC special tokens (the
    * tiktoken/HF `allowed_special` contract — what a production
    * pipeline needs the moment it packs documents with separators
    * like `<|endoftext|>`): each special is never pre-tokenized,
    * never merged, never split by the pattern, and emits as exactly
    * ONE token — its UTF-8 hex, so `concat(unhex(tokens))` remains
    * the full-text identity. Occurrences resolve leftmost-first,
    * ties to the longest special. Same fused one-scan kernel; the
    * non-special segments walk the identical pre-tokenize∘encode
    * path, so with `specials = Nil` this IS [[gptByteBpeTokenize]]
    * (spec-pinned). */
  def gptByteBpeTokenizeSpecial(docs: DataFrame, id: Column,
      text: Column, merges: DataFrame,
      specials: Seq[String]): DataFrame = {
    require(specials.forall(_.nonEmpty), "specials must be non-empty")
    graft.functions.BpeExpressions.register(docs.sparkSession)
    val m = merges.orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val toks = graft.functions.BpeExpressions.gptByteBpe(text, m, specials)
    docs.select(id.as("doc_id"), toks.as("tokens"),
      size(toks).cast("long").as("n_tokens"))
  }

  /** The STAGED composition of the production GPT tokenize path —
    * `transform(gptPreTokenize(text), t => byteBpeEncodePre(t, m))` —
    * kept as the executable reference the fused [[gptByteBpeTokenize]]
    * kernel is pinned against in BpeSpec (the gptPreTokenizeExpr /
    * registeredDomainExpr convention: the composition IS the spec; the
    * kernel is the path a 100 TB corpus walks). */
  def gptByteBpeTokenizeStaged(docs: DataFrame, id: Column, text: Column,
      merges: DataFrame): DataFrame = {
    graft.functions.BpeExpressions.register(docs.sparkSession)
    val m = merges.orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val toks = flatten(transform(gptPreTokenize(text),
      t => graft.functions.BpeExpressions.byteBpeEncodePre(t, m)))
    docs.select(id.as("doc_id"), toks.as("tokens"),
      size(toks).cast("long").as("n_tokens"))
  }

  /** Per-doc BYTE-level tokenization under a [[toByteSymbols]]-fitted
    * merge table: [[bpeTokenize]]'s shape on the
    * [[graft.functions.BpeExpressions.byteBpeEncode]] path. Tokens are
    * hex-pair concatenations ("48", "656C6C" …); decoding a token is
    * `unhex` — no UNK exists by construction. */
  def byteBpeTokenize(docs: DataFrame, id: Column, text: Column,
      merges: DataFrame): DataFrame = {
    graft.functions.BpeExpressions.register(docs.sparkSession)
    val m = merges.orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val toks = graft.functions.BpeExpressions.byteBpeEncode(text, m)
    docs.select(id.as("doc_id"), toks.as("tokens"),
      size(toks).cast("long").as("n_tokens"))
  }

  /** [[tokenizerFertility]]'s QA table for the BYTE-level face: per
    * `group`, words / tokens / UTF-8 BYTES (the byte tokenizer's
    * denominator universe — multi-byte scripts pay more base symbols
    * per character, the fairness property this table exists to show),
    * with `fertility` = tokens per word and `bytes_per_token` the
    * compression rate. */
  def byteTokenizerFertility(docs: DataFrame, id: Column, text: Column,
      group: Column, merges: DataFrame): DataFrame = {
    graft.functions.BpeExpressions.register(docs.sparkSession)
    val m = merges.orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val toks = graft.functions.BpeExpressions.byteBpeEncode(text, m)
    val words = filter(split(text, " "), w => length(w) > 0)
    docs
      .select(group.as("grp"),
        size(words).cast("long").as("_w"),
        size(toks).cast("long").as("_t"),
        aggregate(words, lit(0L),
          (acc, x) => acc + octet_length(x).cast("long")).as("_b"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_w")).as("n_words"),
        sum(col("_t")).as("n_tokens"), sum(col("_b")).as("n_bytes"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          round(col("n_tokens").cast("double") / col("n_words"), 6)))
      .withColumn("bytes_per_token",
        when(col("n_tokens") > 0,
          round(col("n_bytes").cast("double") / col("n_tokens"), 6)))
  }
}
