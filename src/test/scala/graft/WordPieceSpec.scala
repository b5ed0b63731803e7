package graft

import org.apache.spark.sql.functions._
import graft.operators.WordPieceOps
import graft.functions.WordPieceEncode

/** WordPiece (q188/q189): the PMI-score argmax that separates it from
  * BPE, the continuation-marker algebra, the greedy longest-match apply
  * contract (incl. [UNK] collapse, code-point safety, the length bound),
  * and fit determinism. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-computed fixture — designed so the PMI argmax DISAGREES with
    * the raw-count argmax (the property that makes WordPiece WordPiece):
    * pairs (a,##x) count 30 and (a,##b) count 10 both score
    * n/(c_a·c_r) = 0.025 against the diluted `a`, while (c,##d) scores
    * 9/(9·9) ≈ 0.111 on count NINE — the rare-but-faithful pair wins. */
  private val freqs = Seq(("ab", 10L), ("ax", 30L), ("cd", 9L))
    .toDF("word", "freq")

  test("wpLearn: PMI argmax beats raw count; exact scores; tie-break") {
    val m = WordPieceOps.wpLearn(freqs, 3).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getDouble(5)))
    // rank 0: (c,##d) wins on score despite count 9 vs 30
    assert(m(0) == (("c", "##d", "cd", 9L, 9.0 / 81.0)))
    // rank 1: (a,##b) and (a,##x) tie at exactly 0.025 — lexicographic
    // right-symbol tie-break picks ##b
    assert(m(1) == (("a", "##b", "ab", 10L, 10.0 / 400.0)))
    // rank 2: only (a,##x) remains; symbol counts recomputed post-merge
    assert(m(2) == (("a", "##x", "ax", 30L, 30.0 / 900.0)))
  }

  test("wpLearn is partitioning-independent") {
    def fit(n: Int) = WordPieceOps.wpLearn(freqs.repartition(n), 3)
      .collect().map(_.toSeq).toSeq
    assert(fit(1) == fit(5))
  }

  test("wpLearnSampled ≡ wpLearn when the cap covers the table; " +
      "cap takes the top-freq words") {
    val dist = WordPieceOps.wpLearn(freqs, 3)
      .orderBy("rank").collect().map(_.toSeq)
    val local = WordPieceOps.wpLearnSampled(freqs, 3, maxWords = 1 << 20)
      .orderBy("rank").collect().map(_.toSeq)
    assert(local.toSeq == dist.toSeq, "sampled/distributed WP fit drift")
    // maxWords=1 keeps only "ax" (freq 30): the only learnable merge is
    // (a,##x) with count 30
    val capped = WordPieceOps.wpLearnSampled(freqs, 3, maxWords = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(capped.toSeq == Seq(("a", "##x", 30L)),
      s"cap did not reduce the table: ${capped.toSeq}")
  }

  test("wpVocab: every initial char symbol (raw and ##) plus minted pieces") {
    val v = WordPieceOps.wpVocab(freqs, WordPieceOps.wpLearn(freqs, 3))
      .collect().map(_.getString(0)).toSet
    assert(v == Set("a", "c", "##b", "##x", "##d", "cd", "ab", "ax"))
  }

  private def enc(vocab: Seq[String], word: String): Seq[String] =
    WordPieceEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(word),
        org.apache.spark.sql.types.StringType),
      vocab).encodeWord(word).toSeq

  test("apply: greedy longest-match-first, initial vs continuation form") {
    val v = Seq("a", "ab", "##b", "##c", "##bc")
    assert(enc(v, "abc") == Seq("ab", "##c"),
      "longest INITIAL piece wins the first position")
    assert(enc(Seq("x", "##y", "##yz", "##z"), "xyz") == Seq("x", "##yz"),
      "longest CONTINUATION piece wins later positions")
    assert(enc(v, "a") == Seq("a"))
  }

  test("apply: any unmatched position collapses the WHOLE word to [UNK]") {
    val v = Seq("a", "ab", "##c")
    assert(enc(v, "abd") == Seq(WordPieceOps.Unk),
      "partial tokens are discarded, not emitted")
    assert(enc(v, "zab") == Seq(WordPieceOps.Unk),
      "a miss at position 0 is the same collapse")
  }

  test("apply: '#'-words — a literal '##…' piece matches at pos 0 only") {
    // Words MADE of '#' (markdown headers) mint pieces like '##'
    // (mintPiece("#", "###") = "##"): the matcher probes the FLAT vocab,
    // so at pos 0 the raw substring '##' hits that piece, while at
    // pos > 0 only '##'+raw with raw length >= 1 is ever probed — bare
    // '##' is unreachable there. Pins the contract the q189/q194 oracle
    // probe-forms mirror (r16: the old oracle classified '##' as a
    // zero-width continuation and its recursive CTE never terminated).
    val v = Seq("#", "###", "##", "a", "##a", "##aa")
    assert(enc(v, "##") == Seq("##"),
      "literal '##' matched whole at position 0 (raw probe)")
    assert(enc(v, "##a") == Seq("##", "##a"),
      "then continuation pieces take over")
    assert(enc(v, "#") == Seq("#"))
    assert(enc(v, "#a") == Seq("#", "##a"))
    assert(enc(v, "a#") == Seq("a", "###"),
      "'###' doubles as continuation raw '#' after an initial 'a'")
    assert(enc(v, "a##") == Seq("a", "###", "###"),
      "bare '##' never matches past position 0 — each '#' goes alone")
  }

  test("wordPieceDrift: each gate fires independently; group appear/vanish") {
    import graft.operators.WordPieceOps
    val vocab = Seq("a", "##a")
    val base = Seq(
      (1L, "aa aa", "en"), (2L, "aa", "de"), (3L, "aa", "fr"),
      (4L, "aa", "it")).toDF("doc_id", "text", "lang")
    val arrivals = Seq(
      (1L, "aaaa", "en"),  // fertility 2.0 -> 4.0: ratio gate fires
      (2L, "qq", "de"),    // 'q' uncovered -> [UNK]: unk gate fires
                           //   (fertility RATIO 0.5 — gates independent)
      (5L, "aa", "es"),    // new group
      (4L, "aa", "it")).toDF("doc_id", "text", "lang") // stable
    val out = WordPieceOps.wordPieceDrift(base, arrivals,
        col("doc_id"), col("text"), col("lang"), vocab)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out.keySet == Set("en", "de", "fr", "it", "es"))
    assert(out("en").getAs[Double]("fertility_ratio") == 2.0)
    assert(out("en").getAs[Boolean]("needs_refit"), "fertility gate")
    assert(out("de").getAs[Double]("unk_delta") == 1.0)
    assert(out("de").getAs[Double]("fertility_ratio") == 0.5)
    assert(out("de").getAs[Boolean]("needs_refit"), "unk gate alone")
    assert(out("fr").getAs[Boolean]("needs_refit"), "vanished group")
    assert(out("es").getAs[Boolean]("needs_refit"), "new group")
    assert(!out("it").getAs[Boolean]("needs_refit"), "stable group")
    assert(out("it").getAs[Double]("fertility_ratio") == 1.0)
    assert(out("it").getAs[Double]("unk_delta") == 0.0)
  }

  test("roundTrip: decode∘encode identity per tokenizer, UNK loss counted") {
    // one doc with a word OUTSIDE the WordPiece vocab (lossy for
    // wordpiece only — BPE/byteBPE/unigram are lossless by construction
    // and the audit must PROVE that), one fully-covered doc
    val docs = Seq((1L, "ab zz", "en"), (2L, "ab", "de"))
      .toDF("doc_id", "text", "lang")
    val out = graft.operators.TokenizerAuditOps.roundTrip(
        docs, col("doc_id"), col("text"), col("lang"),
        bpeMerges = Seq(("a", "b")),
        byteMerges = Seq(("61", "62")),
        wpVocab = Seq("a", "##b"),
        uniPieces = Seq(("ab", -1.0)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 8, s"4 tokenizers x 2 langs, got ${out.keySet}")
    // wordpiece: 'zz' has no piece -> whole-word [UNK] -> lossy
    val wpEn = out(("wordpiece", "en"))
    assert(wpEn.getAs[Long]("n_words") == 2L)
    assert(wpEn.getAs[Long]("n_lossy_words") == 1L)
    assert(wpEn.getAs[Long]("n_docs_lossless") == 0L)
    assert(wpEn.getAs[Double]("lossy_word_frac") == 0.5)
    assert(out(("wordpiece", "de")).getAs[Long]("n_lossy_words") == 0L)
    // every other family reconstructs every word exactly
    Seq("bpe", "bytebpe", "unigram").foreach { t =>
      Seq("en", "de").foreach { g =>
        val r = out((t, g))
        assert(r.getAs[Long]("n_lossy_words") == 0L, s"$t/$g lossy")
        assert(r.getAs[Long]("n_docs_lossless") ==
          r.getAs[Long]("n_docs"), s"$t/$g docs")
      }
    }
  }

  test("apply: words over MaxWordChars code points go [UNK] outright") {
    val v = Seq("a", "##a")
    val long = "a" * (WordPieceOps.MaxWordChars + 1)
    assert(enc(v, long) == Seq(WordPieceOps.Unk))
    assert(enc(v, "a" * WordPieceOps.MaxWordChars)
      .forall(t => t == "a" || t == "##a"), "at the bound it tokenizes")
  }

  test("apply: code-point boundaries — an astral piece never splits") {
    // 𝕏 is U+1D54F (two UTF-16 units); a piece must match it whole
    assert(enc(Seq("𝕏", "##b"), "𝕏b") == Seq("𝕏", "##b"))
    assert(enc(Seq("a"), "𝕏") == Seq(WordPieceOps.Unk))
  }

  test("apply round trip: stripping ## reconstitutes every non-UNK word") {
    val docs = graft.Tables.documents(spark, sf).where(col("doc_id") < 40)
    val freqs = graft.operators.BpeOps.wordFreqs(docs, col("text"))
    val vocab = WordPieceOps.wpVocab(
        freqs, WordPieceOps.wpLearn(freqs, 8))
      .collect().map(_.getString(0)).toSeq
    val out = WordPieceOps.wordPieceTokenizePieces(
      docs, col("doc_id"), col("text"), vocab).collect()
    assert(out.forall(_.getLong(3) == 0L), "fit corpus: full coverage")
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val rebuilt = r.getSeq[String](1)
        .map(t => t.stripPrefix(WordPieceOps.Continuation))
        .foldLeft((Seq.empty[String], "")) { case ((ws, cur), t) => (ws, cur + t) }
      // words of the original text, concatenated — token stream has no
      // word boundaries, so compare the space-stripped text
      val orig = texts(r.getLong(0)).split(" ").filter(_.nonEmpty).mkString
      assert(rebuilt._2 == orig, s"doc ${r.getLong(0)}")
    }
  }

  test("mergePairInto: greedy left-to-right non-overlapping (the aaa case)") {
    val out = Seq(Tuple1(Seq("a", "##a", "##a"))).toDF("s")
      .select(WordPieceOps.mergePairInto(col("s"), "a", "##a", "aa"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("aa", "##a"),
      "the consumed left symbol cannot chain into an overlapping merge")
  }
}
