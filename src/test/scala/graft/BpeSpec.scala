package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeOps

/** BPE fitting against the hand-derived merge sequence of the classic
  * Sennrich vocabulary {low:5, lower:2, newest:6, widest:3} — every
  * pinned rank below is computed by hand from the paper's algorithm
  * (pair counts over the word-frequency table, argmax with
  * count-desc-then-lexicographic tiebreak, greedy non-overlapping
  * rewrite), so a drift in counting, tie-breaking, or the rewrite fold
  * changes a literal. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val W = BpeOps.EndOfWord
  private lazy val corpus = Seq(
    // one doc per word occurrence — the fit must reduce this to the
    // word-frequency table itself
    Seq.fill(5)("low"), Seq.fill(2)("lower"),
    Seq.fill(6)("newest"), Seq.fill(3)("widest")
  ).flatten.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("bpeLearn reproduces the hand-computed Sennrich merge sequence") {
    val merges = BpeOps.bpeLearn(
      BpeOps.wordFreqs(corpus, col("text")), 6)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val want = Seq(
      (0L, "e", "s", 9L),       // newest 6 + widest 3; ties (s,t),(t,</w>)
                                // lose lexicographically
      (1L, "es", "t", 9L),
      (2L, "est", W, 9L),
      (3L, "l", "o", 7L),       // low 5 + lower 2; beats o-w tie on "l"<"o"
      (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L))       // ties (n,e),(w,est</w>) lose on "e"<"n"<"w"
    assert(merges.toSeq == want, s"merge sequence drifted: ${merges.toSeq}")
  }

  test("bpeLearnSampled ≡ bpeLearn when the cap covers the table " +
      "(char and byte level), and respects the cap") {
    val freqs = BpeOps.wordFreqs(corpus, col("text"))
    for (byteLevel <- Seq(false, true)) {
      val dist = BpeOps.bpeLearn(freqs, 6,
          symbolize =
            if (byteLevel) BpeOps.toByteSymbols else BpeOps.toSymbols)
        .orderBy("rank").collect().map(_.toSeq)
      val local = BpeOps.bpeLearnSampled(freqs, 6, maxWords = 1 << 20,
          byteLevel = byteLevel)
        .orderBy("rank").collect().map(_.toSeq)
      assert(local.toSeq == dist.toSeq,
        s"sampled/distributed fit drift (byteLevel=$byteLevel)")
    }
    // the cap is the top-maxWords by (freq desc, word asc): with
    // maxWords=1 only "newest" (freq 6) survives, so every merge is a
    // newest-internal pair with count 6
    val capped = BpeOps.bpeLearnSampled(freqs, 3, maxWords = 1)
      .collect()
    assert(capped.nonEmpty && capped.forall(_.getLong(3) == 6L),
      s"cap did not reduce the table: ${capped.toSeq}")
  }

  test("bpeTokenize segments an UNSEEN word with learned units") {
    val merges = BpeOps.bpeLearn(BpeOps.wordFreqs(corpus, col("text")), 6)
    val toks = BpeOps.bpeTokenize(
      Seq((1L, "lowest low")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), merges).head()
    // "lowest" was never a training word; the learned units still
    // compose it as low + est</w> (and "low" itself merges fully)
    assert(toks.getSeq[String](1) == Seq("low", s"est$W", "low", W),
      s"unexpected tokens: ${toks.getSeq[String](1)}")
    assert(toks.getLong(2) == 4L)
  }

  test("greedy rewrite is non-overlapping and round-trips the text") {
    // "aaa": merge (a,a) must yield [aa, a], never [aa, aa]
    val syms = Seq(Tuple1(Seq("a", "a", "a")))
      .toDF("toks")
      .select(BpeOps.mergePair(col("toks"), "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(syms == Seq("aa", "a"), s"overlapping merge: $syms")
    // round-trip: concatenated tokens minus the markers rebuild the doc
    val merges = BpeOps.bpeLearn(BpeOps.wordFreqs(corpus, col("text")), 6)
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 50)
    val rebuilt = BpeOps.bpeTokenize(docs, col("doc_id"), col("text"), merges)
      .select(col("doc_id"),
        replace(concat_ws("", col("tokens")), lit(W), lit(" ")).as("r"))
    val bad = rebuilt.join(docs.select(col("doc_id"),
        concat(regexp_replace(trim(col("text")), lit(" +"), lit(" ")),
          lit(" ")).as("t")), "doc_id")
      .where(col("r") =!= col("t")).count()
    assert(bad == 0L, "tokenization must preserve content exactly")
  }

  test("early stop: no pair at minPairCount ends the merge list") {
    val merges = BpeOps.bpeLearn(
      BpeOps.wordFreqs(Seq((1L, "ab cd")).toDF("doc_id", "text"),
        col("text")), 10, minPairCount = 2L)
    assert(merges.count() == 0L, "all pairs are singletons here")
  }

  test("compiled apply equals the fold chain on the fitted merges") {
    // the production path's contract: same function as bpeTokensExpr,
    // pinned over the real corpus under the Sennrich-fixture table
    val merges = BpeOps.bpeLearn(BpeOps.wordFreqs(corpus, col("text")), 6)
      .orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val docs = Tables.documents(spark, sf)
      .unionByName(Seq((90001L, "lowest low  newest"), // double space
        (90002L, " widest"), (90003L, "lo")).toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long")))
    val chain = docs.select(col("doc_id"),
      BpeOps.bpeTokensExpr(col("text"), merges).as("tokens"))
    val compiled = docs.select(col("doc_id"),
      BpeOps.bpeTokensCompiled(spark, col("text"), merges).as("tokens"))
    val diff = chain.withColumnRenamed("tokens", "a")
      .join(compiled.withColumnRenamed("tokens", "b"), "doc_id")
      .where(col("a") =!= col("b")).count()
    assert(diff == 0L, "compiled tokens must equal the fold chain exactly")
  }

  test("compiled apply: adversarial tables (overlaps, recreated pairs)") {
    import graft.functions.BpeEncode
    def both(text: String, merges: Seq[(String, String)]): Unit = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val a = df.select(BpeOps.bpeTokensExpr(col("text"), merges))
        .head().getSeq[String](0)
      val b = df.select(
        BpeOps.bpeTokensCompiled(spark, col("text"), merges))
        .head().getSeq[String](0)
      assert(a == b, s"divergence on '$text' under $merges: $a vs $b")
    }
    val W = BpeOps.EndOfWord
    // overlapping runs: greedy non-overlapping left-to-right
    both("aaa aaaa aaaaa", Seq(("a", "a")))
    both("aaa", Seq(("a", "a"), ("aa", "a")))
    // back-to-back DISTINCT-symbol pairs must BOTH merge in one pass
    // ('haha' under (h,a) -> [ha, ha, </w>]) — the case the r15 oracle's
    // single-space replace rendering missed (it consumed the shared
    // boundary space; the double-space rendering chains correctly)
    both("haha hahaha 2020", Seq(("h", "a")))
    both("2020 20200202", Seq(("2", "0"), ("20", "20")))
    // a LATER merge recreates an earlier merge's pair string: fold-by-rank
    // must NOT re-fire the earlier rank (the cursor rule) — the case where
    // subword-nmt's priority apply would diverge from the fold chain
    both("xabc", Seq(("a", "b"), ("ab", "c"), ("x", "a")))
    // duplicate (l, r) at two ranks with a re-manufacturing merge between:
    // ranks: 0 (ab,c) no-op; 1 (a,b) -> "ab"; 2 (ab,c) fires
    both("abc", Seq(("ab", "c"), ("a", "b"), ("ab", "c")))
    // end-of-word marker participates in merges
    both("go going", Seq(("o", W), ("g", s"o$W")))
    // unicode: surrogate pairs stay whole code points
    both("a😀b 😀😀",
      Seq(("😀", "😀"), ("a", "😀")))
    // empty-ish inputs
    both("", Seq(("a", "b")))
    both("   ", Seq(("a", "b")))
    // the cursor rule directly on the expression: rank 0 fires first,
    // rank 1's left symbol is then consumed (no re-fire), rank 2 composes
    val e = BpeEncode(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      Seq(("b", "c"), ("a", "b"), ("bc", "d")))
    assert(e.encodeWord("abcd").toSeq == Seq("a", "bcd", W),
      s"fold-by-rank drifted: ${e.encodeWord("abcd").toSeq}")
  }

  test("tokenizerFertility: per-group sums and ratios match the tokenizer") {
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val docs = corpus.withColumn("lang",
      when(col("doc_id") % 2 === 0, "aa").otherwise("bb"))
    val merges = BpeOps.bpeLearn(BpeOps.wordFreqs(corpus, col("text")), 6)
    val out = BpeOps.tokenizerFertility(
      docs, col("doc_id"), col("text"), col("lang"), merges)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out.keySet == Set("aa", "bb"))
    val per = BpeOps.bpeTokenize(docs, col("doc_id"), col("text"), merges)
      .join(docs, "doc_id").select("lang", "n_tokens", "text").collect()
    Seq("aa", "bb").foreach { g =>
      val rows = per.filter(_.getString(0) == g)
      val words = rows.map(_.getString(2).split(" ").count(_.nonEmpty).toLong).sum
      val toks = rows.map(_.getLong(1)).sum
      val chars = rows
        .map(_.getString(2).split(" ").filter(_.nonEmpty).map(_.length).sum.toLong)
        .sum
      val r = out(g)
      assert(r.getAs[Long]("n_docs") == rows.length.toLong, s"n_docs $g")
      assert(r.getAs[Long]("n_words") == words, s"n_words $g")
      assert(r.getAs[Long]("n_tokens") == toks, s"n_tokens $g")
      assert(r.getAs[Long]("n_chars") == chars, s"n_chars $g")
      assert(r.getAs[Double]("fertility") == round6(toks.toDouble / words),
        s"fertility $g")
      assert(r.getAs[Double]("chars_per_token") ==
        round6(chars.toDouble / toks), s"chars_per_token $g")
      // the 6-merge vocabulary cannot cover whole words -> every word
      // shatters into >1 token
      assert(r.getAs[Double]("fertility") > 1.0, s"fertility sanity $g")
    }
  }

  test("gpt pre-tokenize: contraction/space rules; matches partition the text") {
    def pt(t: String): Seq[String] = Seq(Tuple1(t)).toDF("text")
      .select(BpeOps.gptPreTokenize(col("text"))).head().getSeq[String](0)
    assert(pt("Hello world") == Seq("Hello", " world"),
      "a word carries its LEADING space")
    assert(pt("it's 2024!") == Seq("it", "'s", " 2024", "!"),
      "contraction suffix splits; numbers and symbols are their own runs")
    assert(pt("don't stop") == Seq("don", "'t", " stop"))
    assert(pt("x1y2") == Seq("x", "1", "y", "2"),
      "letter/number boundaries split")
    // multi-whitespace-run fidelity (r16 verdict item 3): the two-pass
    // lookahead-free form reproduces the PUBLISHED GPT-2 pattern's
    // `\s+(?!\S)` behavior — a run donates its last SPACE to the next
    // run's ` ?`; a non-space last char stands alone; the run keeps one
    // token at end-of-text. Expected values are the published
    // pattern's segmentation (hand-verified against Radford et al.
    // 2019 §2.2's regex semantics).
    assert(pt("  lead") == Seq(" ", " lead"),
      "a 2-space run before letters donates its last space")
    assert(pt("a  b") == Seq("a", " ", " b"), "the canonical a-2sp-b case")
    assert(pt("a    b") == Seq("a", "   ", " b"),
      "longer runs keep all-but-last as one whitespace token")
    assert(pt("def f():\n    return 1") ==
      Seq("def", " f", "():", "\n   ", " return", " 1"),
      "code indentation — the q178 FIM-shaped fixture")
    assert(pt("a  1") == Seq("a", " ", " 1"), "donation before numbers")
    assert(pt("a  !!") == Seq("a", " ", " !!"), "donation before symbols")
    assert(pt("a  's") == Seq("a", " ", " '", "s"),
      "donated space before a quote absorbs into the symbol run; the " +
        "contraction letters become a letter run")
    assert(pt("a  'sfoo") == Seq("a", " ", " '", "sfoo"),
      "…and merge with following letters, as the published pattern does")
    assert(pt("x\t\ty") == Seq("x", "\t", "\t", "y"),
      "a donated TAB cannot ride a ` ?` — it stands alone")
    assert(pt("a \t b") == Seq("a", " \t", " b"),
      "mixed run: all-but-last-space one token, space donated")
    assert(pt("a  ") == Seq("a", "  "),
      "a trailing run is one token (the lookahead matches it whole)")
    assert(pt("") == Seq.empty)
    // UNICODE whitespace (r17 verdict item 1): the published pattern's
    // `\s` is Python `regex`, which is Unicode-aware — NBSP (U+00A0,
    // what `&nbsp;`-derived HTML text carries), the ideographic space
    // (U+3000), thin space (U+2009), NEL (U+0085), and the line
    // separator (U+2028) are whitespace to every real GPT-2 tokenizer.
    // Every expected value below is the PUBLISHED tokenizer's
    // segmentation (verified against Python `regex` with GPT-2's
    // pattern). Only a LITERAL space can ride ` ?` or be donated, so a
    // boundary NBSP stands alone like a tab.
    assert(pt("a b") == Seq("a", " ", "b"),
      "NBSP is whitespace — its neighbors are bare runs")
    assert(pt("a  b") == Seq("a", " ", " ", "b"),
      "a donated NBSP stands alone (it cannot ride ` ?`)")
    assert(pt("café bar") == Seq("café", " ", "bar"),
      "the HTML-extraction shape: word NBSP word")
    assert(pt("x 　y") == Seq("x", " ", "　", "y"),
      "mixed space+ideographic run: space kept, ideographic standalone")
    assert(pt("a   b") == Seq("a", "  ", " b"),
      "run minus last char is one token; the trailing SPACE donates")
    assert(pt(" line") == Seq(" ", "line"),
      "line separator is whitespace")
    assert(pt("ab") == Seq("a", "", "b"),
      "NEL (U+0085) is White_Space=Yes")
    assert(pt("  x") == Seq(" ", " ", "x"))
    // NOT whitespace: zero-width space (U+200B) is Cf, not
    // White_Space=Yes — Python `\s` rejects it too
    assert(pt("a​b") == Seq("a", "​", "b"))
    // the alternation covers every character class: matches PARTITION
    // the input, so concatenation is the identity — on hostile strings
    // and on corpus text alike
    val hostile = Seq("a  b\tc\nd", "€uro-sign!?", "'''", "  ", "a'b",
      "tab\t\ttab", "😀 emoji'sfun 42x",
      // vertical tab: the one char Java \s matches and RE2's doesn't —
      // the pattern's EXPLICIT whitespace class keeps engines agreeing
      "ab ")
    hostile.foreach { t =>
      assert(pt(t).mkString == t, s"partition identity failed on '$t'")
    }
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 100)
    val bad = docs.select(col("text"),
        concat_ws("", BpeOps.gptPreTokenize(col("text"))).as("r"))
      .where(col("r") =!= col("text")).count()
    assert(bad == 0L, "pre-tokens must concatenate back to the text")
  }

  test("gpt pre-tokenize: one-scan kernel ≡ the two-pass regex reference, " +
      "exhaustively") {
    // production path is the compiled GptPreTokenize scan; this pins
    // EXACT token-list equality with the two-regex-pass Column form the
    // DuckDB oracle replays — over the GPT-2 fixtures, randomized
    // colliding-part strings, and the corpus
    def both(ts: Seq[String]): Unit = {
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("i", "t")
      val rows = df.select(col("t"),
          BpeOps.gptPreTokenize(col("t")).as("k"),
          BpeOps.gptPreTokenizeExpr(col("t")).as("f"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"kernel/reference divergence on '${r.getString(0)}': " +
            s"${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
    both(Seq("a  b", "a    b", "def f():\n    return 1", "a  's",
      "a  'sfoo", "x\t\ty", "a \t b", "a  ", "  lead", "", " ", "  ",
      "don't stop", "it's 2024!", "x1y2", "a'b", "'''", "'re'll'x",
      "€uro-sign!?", "😀 emoji'sfun 42x", "ab", "'s", "'", "x'",
      "１２34五", "Ⅻroman", "a  １２", "tab\t\ttab", "_under score_",
      "é combining", "ＡＢfull width",
      // Unicode whitespace (r17 verdict item 1): NBSP / ideographic /
      // thin / NEL / line-separator at every boundary position
      "a b", "a  b", "café bar", "x 　y", "a   b", " line", "ab", "  x", " 's", "   a", "a  ", "a​b", "　　　"))
    val rnd = new scala.util.Random(20260818)
    val parts = Seq("a", "B", "1", "２", "'s", "'ll", "'x", "!", "-", "'",
      " ", "  ", "\t", "\n", " \t ", "€", "😀", "五", "é", "",
      // Unicode ws members + the ZWSP non-member (r17 item 1)
      " ", "　", " ", "", " ", "​", "  ", "  ")
    both((1 to 600).map { _ =>
      (1 to (1 + rnd.nextInt(8))).map(_ => parts(rnd.nextInt(parts.size)))
        .mkString
    })
    // corpus: kernel partition identity (concat == text) + parity
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 200)
    val bad = docs.select(
        BpeOps.gptPreTokenize(col("text")).as("k"),
        BpeOps.gptPreTokenizeExpr(col("text")).as("f"),
        col("text"))
      .where(col("k") =!= col("f") ||
        concat_ws("", col("k")) =!= col("text")).count()
    assert(bad == 0L, "kernel/reference divergence or identity break " +
      "on corpus text")
  }

  test("gpt byte bpe: whole-input encode round-trips the FULL text") {
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 60)
      .select("doc_id", "text")
    val merges = BpeOps.bpeLearn(
      BpeOps.preTokenFreqs(docs, col("text")), 8,
      symbolize = BpeOps.toByteSymbols)
    val out = BpeOps.gptByteBpeTokenize(docs, col("doc_id"), col("text"),
      merges).collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.values.exists(_.exists(_.length > 2)),
      "fixture sanity — some learned multi-byte unit must appear")
    texts.foreach { case (id, t) =>
      val hexcat = out(id).mkString
      val decoded = new String(
        hexcat.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
        java.nio.charset.StandardCharsets.UTF_8)
      assert(decoded == t,
        s"FULL-text round trip (whitespace included) failed for doc $id")
    }
  }

  test("fertilityDrift: ratio gate per family; group appear/vanish") {
    import graft.operators.TokenizerAuditOps
    val base = Seq((1L, "ab", "en"), (2L, "ab", "fr"), (3L, "ab", "it"))
      .toDF("doc_id", "text", "lang")
    val arrivals = Seq(
      (1L, "cd", "en"),  // no merge applies: fertility inflates, fires
      (4L, "ab", "es"),  // new group
      (3L, "ab", "it"))  // stable
      .toDF("doc_id", "text", "lang")
    val out = TokenizerAuditOps.fertilityDrift(base, arrivals,
        col("doc_id"), col("text"), col("lang"),
        bpeMerges = Seq(("a", "b")), byteMerges = Seq(("61", "62")),
        gptMerges = Seq(("61", "62")), uniPieces = Seq(("ab", -1.0)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val fams = Seq("bpe", "bytebpe", "gptbpe", "unigram")
    assert(out.keySet == fams.flatMap(f =>
      Seq("en", "fr", "it", "es").map(f -> _)).toSet)
    fams.foreach { f =>
      assert(out((f, "en")).getAs[Boolean]("needs_refit"),
        s"$f: fertility inflation must fire " +
          s"(ratio ${out((f, "en")).getAs[Double]("fertility_ratio")})")
      assert(out((f, "en")).getAs[Double]("fertility_ratio") > 1.25, f)
      assert(!out((f, "it")).getAs[Boolean]("needs_refit"), s"$f stable")
      assert(out((f, "it")).getAs[Double]("fertility_ratio") == 1.0, f)
      assert(out((f, "fr")).getAs[Boolean]("needs_refit"), s"$f vanished")
      assert(out((f, "es")).getAs[Boolean]("needs_refit"), s"$f new")
    }
    // the char face's exact arithmetic: 'ab' = [ab, </w>] two tokens,
    // 'cd' = [c, d, </w>] three -> ratio 1.5
    assert(out(("bpe", "en")).getAs[Double]("fertility_base") == 2.0)
    assert(out(("bpe", "en")).getAs[Double]("fertility_ratio") == 1.5)
  }

  test("byte level: hex symbolization, fit reuse, compiled-vs-fold parity") {
    import graft.functions.BpeExpressions
    // toByteSymbols: ASCII one pair per char, astral four pairs
    val syms = Seq(("Hi", 0), ("😀", 1), ("", 2)).toDF("w", "i")
      .select(BpeOps.toByteSymbols(col("w"))).collect()
      .map(_.getSeq[String](0))
    assert(syms(0) == Seq("48", "69"))
    assert(syms(1) == Seq("F0", "9F", "98", "80"))
    // empty word -> EMPTY array, not two phantom ''-symbols from the
    // descending sequence(1, 0) (r16 advice guard)
    assert(syms(2) == Seq.empty)
    // fit rides bpeLearn verbatim: "aaaa" x3 -> rank 0 merges (61, 61)
    val freqs = Seq(("aaaa", 3L), ("ab", 2L)).toDF("word", "freq")
    val m = BpeOps.bpeLearn(freqs, 2, symbolize = BpeOps.toByteSymbols)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(m(0) == (("61", "61")), s"rank 0 drifted: ${m.toSeq}")
    // compiled apply == the mergePair fold over toByteSymbols, on
    // adversarial inputs (runs, multibyte, back-to-back pairs)
    val merges = m.toSeq
    def both(text: String): Unit = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val a = df.select(flatten(transform(
          filter(split(col("text"), " "), w => length(w) > 0),
          w => merges.foldLeft(BpeOps.toByteSymbols(w)) {
            case (s, (l, r)) => BpeOps.mergePair(s, l, r) })))
        .head().getSeq[String](0)
      BpeExpressions.register(spark)
      val b = df.select(BpeExpressions.byteBpeEncode(col("text"), merges))
        .head().getSeq[String](0)
      assert(a == b, s"byte divergence on '$text': $a vs $b")
    }
    both("aaaa ab aaa")
    both("a😀a aa")
    both("")
    // no UNK, round trip: unhex(concat(tokens)) reconstitutes each word
    val docs = Seq((1L, "héllo wörld 😀"), (2L, "aaaa ab")).toDF("doc_id", "text")
    val out = BpeOps.byteBpeTokenize(docs, col("doc_id"), col("text"),
      BpeOps.bpeLearn(freqs, 2, symbolize = BpeOps.toByteSymbols))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    Seq(1L -> "héllo wörld 😀", 2L -> "aaaa ab").foreach { case (id, t) =>
      val hexcat = out(id).mkString
      val decoded = new String(
        hexcat.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
        java.nio.charset.StandardCharsets.UTF_8)
      assert(decoded == t.split(" ").filter(_.nonEmpty).mkString,
        s"round trip failed for doc $id")
    }
  }

  test("gpt byte bpe: FUSED kernel ≡ the staged transform composition") {
    // the production path (r17 verdict item 2): GptByteBpe fuses
    // pre-tokenize + per-pre-token byte encode into one scan; the staged
    // transform(gptPreTokenize, byteBpeEncodePre) composition stays the
    // executable reference — exact token-list equality over the corpus
    // and the whitespace-heavy fixtures
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 150)
      .select("doc_id", "text")
      .unionByName(Seq(
        (91001L, "a  b\t\tc don't  stop"),
        (91002L, "x y café bar 　 it's"),
        (91003L, ""), (91004L, "   "), (91005L, "  ")
      ).toDF("doc_id", "text"))
    val merges = BpeOps.bpeLearn(
      BpeOps.preTokenFreqs(docs, col("text")), 10,
      symbolize = BpeOps.toByteSymbols)
    val fused = BpeOps.gptByteBpeTokenize(
      docs, col("doc_id"), col("text"), merges)
    val staged = BpeOps.gptByteBpeTokenizeStaged(
      docs, col("doc_id"), col("text"), merges)
    val diff = fused.select(col("doc_id"), col("tokens").as("a"))
      .join(staged.select(col("doc_id"), col("tokens").as("b")), "doc_id")
      .where(col("a") =!= col("b")).count()
    assert(diff == 0L, "fused kernel must equal the staged composition")
    // and the fused plan carries NO higher-order function (the point of
    // the fusion): one gpt_byte_bpe call, zero transform/lambda nodes
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction") && !plan.contains("transform("),
      s"fused plan still carries a HOF:\n$plan")
  }

  test("gpt byte bpe: special tokens are ATOMIC, ordered, and " +
      "decode-identity-preserving") {
    def hexOf(s: String): String = s.getBytes("UTF-8")
      .map(b => f"${b & 0xff}%02X").mkString
    val sp = "<|endoftext|>"
    val docs = Seq(
      (1L, s"hello${sp}world"),        // mid-word: no space absorption
      (2L, s"a b $sp c"),              // surrounded by spaces
      (3L, s"$sp"),                    // special alone
      (4L, s"$sp$sp"),                 // back-to-back
      (5L, s"x${sp}"), (6L, s"${sp}x"),// at either end
      (7L, "no special here"),
      (8L, s"tail<|endoftex")          // prefix of a special: NOT one
    ).toDF("doc_id", "text")
    val merges = BpeOps.bpeLearn(
      BpeOps.preTokenFreqs(
        Tables.documents(spark, sf).where(col("doc_id") < 60),
        col("text")), 8, symbolize = BpeOps.toByteSymbols)
    val out = BpeOps.gptByteBpeTokenizeSpecial(docs, col("doc_id"),
        col("text"), merges, Seq(sp))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // atomicity: the special is exactly ONE token, its hex
    assert(out(1L).count(_ == hexOf(sp)) == 1)
    assert(out(3L) == Seq(hexOf(sp)))
    assert(out(4L) == Seq(hexOf(sp), hexOf(sp)))
    assert(out(6L).head == hexOf(sp))
    // the pattern never sees the special: doc 7/8 equal the plain path
    val plain = BpeOps.gptByteBpeTokenize(docs, col("doc_id"),
        col("text"), merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(7L) == plain(7L))
    assert(out(8L) == plain(8L), "a PREFIX of a special is ordinary text")
    // decode identity over every fixture, specials included
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, t) =>
      val decoded = new String(out(id).mkString.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8")
      assert(decoded == t, s"decode identity failed for doc $id")
    }
    // leftmost-longest: overlapping specials resolve to the longer one
    val both = Seq((1L, "ab!end")).toDF("doc_id", "text")
    val t2 = BpeOps.gptByteBpeTokenizeSpecial(both, col("doc_id"),
        col("text"), merges, Seq("ab", "ab!"))
      .head().getSeq[String](1)
    assert(t2.head == hexOf("ab!"),
      s"longest special must win at the same offset: $t2")
    // empty specials refused
    intercept[IllegalArgumentException] {
      BpeOps.gptByteBpeTokenizeSpecial(both, col("doc_id"), col("text"),
        merges, Seq(""))
    }
  }

  test("toByteSymbols: NULL passes through as NULL (r17 advice)") {
    val rows = Seq(Some("Hi"), Some(""), None).toDF("w")
      .select(BpeOps.toByteSymbols(col("w")).as("s")).collect()
    assert(rows(0).getSeq[String](0) == Seq("48", "69"))
    assert(rows(1).getSeq[String](0) == Seq.empty, "empty word -> []")
    assert(rows(2).isNullAt(0), "NULL word must stay NULL, not []")
  }

  test("gptPreTokenizeExpr: U+E000 sentinel input fails LOUDLY " +
      "(r17 advice); the kernel handles it as an ordinary symbol") {
    val dirty = Seq((1L, "ab")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      dirty.select(BpeOps.gptPreTokenizeExpr(col("text"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("U+E000")),
      s"expected the sentinel guard message, got: ${msgs(ex)}")
    // the one-scan kernel needs no sentinel: U+E000 is just a symbol char
    val toks = dirty.select(BpeOps.gptPreTokenize(col("text")))
      .head().getSeq[String](0)
    assert(toks == Seq("a", "", "b"))
  }

  test("gptVocab: 256 bytes + 256+rank merges; smallest id wins collisions") {
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 150)
      .select("doc_id", "text")
    val merges = BpeOps.bpeLearn(
      BpeOps.preTokenFreqs(docs, col("text")), 8,
      symbolize = BpeOps.toByteSymbols)
    val m = BpeOps.gptVocab(merges).collect()
      .map(r => (r.getString(1), r.getLong(0))).toMap
    (0 until 256).foreach(i =>
      assert(m(f"$i%02X") == i.toLong, s"base byte $i"))
    // fitted merge strings are >= 4 hex chars (never collide with bases);
    // each maps to 256 + its smallest producing rank
    val pairs = merges.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1) + r.getString(2)))
    pairs.foreach { case (_, t) =>
      assert(m(t) == 256L + pairs.filter(_._2 == t).map(_._1).min, t) }
    // synthetic re-manufactured string: ranks 0 and 2 both concat to
    // "414242" -> one entry, id 256; rank 1's "4242" keeps 257
    val coll = Seq((0L, "41", "4242"), (1L, "42", "42"),
      (2L, "4142", "42")).toDF("rank", "left", "right")
    val vc = BpeOps.gptVocab(coll).collect()
      .map(r => (r.getString(1), r.getLong(0))).toMap
    assert(vc("414242") == 256L && vc("4242") == 257L &&
      vc.size == 256 + 2, s"$vc")
  }

  test("TokenIds kernel: ids face \u2261 token face under the vocab map; " +
      "vocab/merges skew fails loudly") {
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 150)
      .select("doc_id", "text")
    val merges = BpeOps.bpeLearn(
      BpeOps.preTokenFreqs(docs, col("text")), 10,
      symbolize = BpeOps.toByteSymbols)
    val vocab = BpeOps.gptVocab(merges).collect()
      .map(r => (r.getString(1), r.getLong(0))).toMap
    val ids = BpeOps.gptByteBpeTokenizeIds(
        docs, col("doc_id"), col("text"), merges)
      .select("doc_id", "ids").as[(Long, Seq[Long])].collect().toMap
    val toks = BpeOps.gptByteBpeTokenize(
        docs, col("doc_id"), col("text"), merges)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(ids.keySet == toks.keySet)
    ids.keys.foreach(k =>
      assert(ids(k) == toks(k).map(vocab), s"doc $k id stream"))
    // duplicate vocab entries resolve to the SMALLEST id in the kernel
    graft.functions.BpeExpressions.register(spark)
    val dup = Seq((1L, Seq("AA"))).toDF("doc_id", "toks")
      .select(graft.functions.BpeExpressions.tokenIds(col("toks"),
        Seq(("AA", 5L), ("AA", 2L))))
      .head().getSeq[Long](0)
    assert(dup == Seq(2L), s"$dup")
    // a token outside the table must THROW, not NULL (silent corruption)
    val ex = intercept[Throwable] {
      Seq((1L, Seq("AA", "ZZ"))).toDF("doc_id", "toks")
        .select(graft.functions.BpeExpressions.tokenIds(col("toks"),
          Seq(("AA", 0L)))).collect()
    }
    def msgs2(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs2(t.getCause)
    assert(msgs2(ex).exists(_.contains("token_ids")),
      s"expected the loud vocabulary-miss, got: ${msgs2(ex)}")
  }
}
