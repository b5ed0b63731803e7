package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.RepetitionSignals
import graft.operators.TextOps

/** Gopher repetition rules ([[TextOps.gopherRepetition]] /
  * [[RepetitionSignals]]): hand-computed fixtures (the corpus has no
  * newlines, so the line/paragraph legs only get exercised here) plus
  * randomized parity against an independent plain-Scala reference model.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- model
  // Independent reference implementation (sets/maps/sorts — none of the
  // kernel's incremental single-pass machinery).
  private def round6(x: Double): Double =
    if (x == 0.0) 0.0
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  case class Ref(nWords: Long, nChars: Long, dlf: Double, dlcf: Double,
      dpf: Double, dpcf: Double, top: Map[Int, Double], dup: Map[Int, Double],
      keep: Boolean)

  private def dupFracsRef(parts: Seq[String]): (Double, Double) = {
    val ne = parts.filter(_.nonEmpty)
    if (ne.isEmpty) (0.0, 0.0)
    else {
      val byVal = ne.groupBy(identity)
      val dupN = byVal.values.map(g => g.size - 1).sum
      val dupC = byVal.values.map(g => (g.size - 1).toLong * g.head.length).sum
      val totC = ne.map(_.length.toLong).sum
      (round6(dupN.toDouble / ne.size),
        if (totC == 0) 0.0 else round6(dupC.toDouble / totC))
    }
  }

  private def reference(text: String): Ref = {
    val (dlf, dlcf) = dupFracsRef(text.split("\n", -1).toSeq)
    val (dpf, dpcf) = dupFracsRef(text.split("\n\n", -1).toSeq)
    val toks = text.split(" ", -1).toSeq.filter(_.nonEmpty)
    val totC = toks.map(_.length.toLong).sum
    def grams(n: Int): Seq[String] =
      if (toks.size < n) Nil else toks.sliding(n).map(_.mkString(" ")).toSeq
    val top = Seq(2, 3, 4).map { n =>
      val gs = grams(n)
      val counts = gs.groupBy(identity).map { case (g, o) => (g, o.size) }
      val best = counts.filter(_._2 >= 2)
      val frac =
        if (best.isEmpty || totC == 0) 0.0
        else {
          val maxC = best.values.max
          val g = best.filter(_._2 == maxC).keys.min
          round6(maxC.toDouble * (g.length - (n - 1)) / totC)
        }
      n -> frac
    }.toMap
    val dup = Seq(5, 6, 7, 8, 9, 10).map { n =>
      val gs = grams(n)
      val counts = gs.groupBy(identity).map { case (g, o) => (g, o.size) }
      val covered = gs.zipWithIndex
        .filter { case (g, _) => counts(g) >= 2 }
        .flatMap { case (_, i) => i until i + n }
        .toSet
      val covC = covered.toSeq.map(i => toks(i).length.toLong).sum
      n -> (if (totC == 0) 0.0 else round6(covC.toDouble / totC))
    }.toMap
    import RepetitionSignals._
    val keep = dlf <= DupLineThr && dpf <= DupParaThr &&
      dlcf <= DupLineCharThr && dpcf <= DupParaCharThr &&
      top(2) <= Top2Thr && top(3) <= Top3Thr && top(4) <= Top4Thr &&
      dup(5) <= Dup5Thr && dup(6) <= Dup6Thr && dup(7) <= Dup7Thr &&
      dup(8) <= Dup8Thr && dup(9) <= Dup9Thr && dup(10) <= Dup10Thr
    Ref(toks.size.toLong, totC, dlf, dlcf, dpf, dpcf, top, dup, keep)
  }

  private def run(texts: Seq[String]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextOps.gopherRepetition(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
  }

  private def check(texts: Seq[String]): Unit = {
    val rows = run(texts)
    assert(rows.length == texts.size)
    rows.zip(texts).foreach { case (r, t) =>
      val ref = reference(t)
      val ctx = s"text=${t.take(80).replace("\n", "\\n")}"
      assert(r.getAs[Long]("n_words") == ref.nWords, s"n_words $ctx")
      assert(r.getAs[Long]("n_chars") == ref.nChars, s"n_chars $ctx")
      assert(r.getAs[Double]("dup_line_frac") == ref.dlf, s"dlf $ctx")
      assert(r.getAs[Double]("dup_line_char_frac") == ref.dlcf, s"dlcf $ctx")
      assert(r.getAs[Double]("dup_para_frac") == ref.dpf, s"dpf $ctx")
      assert(r.getAs[Double]("dup_para_char_frac") == ref.dpcf, s"dpcf $ctx")
      Seq(2, 3, 4).foreach(n =>
        assert(r.getAs[Double](s"top_${n}gram_frac") == ref.top(n),
          s"top$n $ctx"))
      Seq(5, 6, 7, 8, 9, 10).foreach(n =>
        assert(r.getAs[Double](s"dup_${n}gram_frac") == ref.dup(n),
          s"dup$n $ctx"))
      assert(r.getAs[Boolean]("keep") == ref.keep, s"keep $ctx")
    }
  }

  // ------------------------------------------------------------- fixtures

  test("hand-computed: repeated bigram claims its char share") {
    // "a b" appears 3x among 5 bigrams; gram chars 2, total chars 6
    val rows = run(Seq("a b a b a b"))
    val r = rows.head
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_chars") == 6L)
    // top bigram "a b": count 3 (non-overlapping occurrences of the
    // SLIDING gram "a b" = positions 1,3,5) -> 3*2/6 = 1.0
    assert(r.getAs[Double]("top_2gram_frac") == 1.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("hand-computed: duplicate lines, count- and char-weighted") {
    // lines: "aaaa" x2, "b" -> dup occurrences 1/3; dup chars 4/9
    val rows = run(Seq("aaaa\nb\naaaa"))
    val r = rows.head
    assert(r.getAs[Double]("dup_line_frac") == round6(1.0 / 3))
    assert(r.getAs[Double]("dup_line_char_frac") == round6(4.0 / 9))
    // paragraphs: no blank line -> one paragraph, no dups
    assert(r.getAs[Double]("dup_para_frac") == 0.0)
    assert(!r.getAs[Boolean]("keep")) // 0.333 > 0.30 line threshold
  }

  test("hand-computed: duplicate paragraphs split on blank lines") {
    val rows = run(Seq("x y\n\nz\n\nx y"))
    val r = rows.head
    // paragraphs: "x y" x2, "z" -> 1/3 dup; chars 3 of 7 (3+1+3)
    assert(r.getAs[Double]("dup_para_frac") == round6(1.0 / 3))
    assert(r.getAs[Double]("dup_para_char_frac") == round6(3.0 / 7))
    // lines: "x y","z","x y" with the empties dropped -> same fractions
    assert(r.getAs[Double]("dup_line_frac") == round6(1.0 / 3))
  }

  test("hand-computed: duplicated 5-gram coverage marks characters once") {
    // "v w x y z" twice, separated: both occurrences' tokens covered
    val t = "v w x y z q1 q2 v w x y z"
    val rows = run(Seq(t))
    val r = rows.head
    // covered tokens: 10 of 12; chars 10 of 14
    assert(r.getAs[Double]("dup_5gram_frac") == round6(10.0 / 14))
    // no duplicated 6-gram
    assert(r.getAs[Double]("dup_6gram_frac") == 0.0)
  }

  test("edge cases: empty, single word, all-unique text keeps") {
    val rows = run(Seq("", "word", "all these words only once"))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("keep"))
      Seq(2, 3, 4).foreach(n =>
        assert(r.getAs[Double](s"top_${n}gram_frac") == 0.0))
      Seq(5, 6, 7, 8, 9, 10).foreach(n =>
        assert(r.getAs[Double](s"dup_${n}gram_frac") == 0.0))
    }
    assert(rows.head.getAs[Long]("n_words") == 0L)
    assert(rows.head.getAs[Long]("n_chars") == 0L)
  }

  test("tie on top-gram count resolves to the lexicographically smallest") {
    // bigrams "b b" x2 and "a a" x2 (disjoint): tie -> "a a" wins; both
    // have gram chars 2, so the fraction is the same — pin via a case
    // where char lengths differ: "cc cc" x2 vs "a a" x2
    val t = "cc cc cc a a a" // bigrams: "cc cc"x2, "cc a", "a a"x2
    val r = run(Seq(t)).head
    // tie at count 2 -> "a a" (lexicographically < "cc cc"): gram chars 2
    // (count 2) over total token chars 9
    assert(r.getAs[Double]("top_2gram_frac") == round6(2 * 2.0 / 9))
  }

  // ---------------------------------------------------- randomized parity

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(126L + i)))

  test("randomized parity with the reference model (repetitive vocab)") {
    // small vocab + newlines => real collisions on every signal
    val tokGen = Gen.oneOf("a", "bb", "ccc", "d", "\n", "\n\n")
    val textGen = Gen.chooseNum(0, 60)
      .flatMap(n => Gen.listOfN(n, tokGen).map(_.mkString(" ")))
    check(samples(textGen, 40))
  }

  test("randomized parity with the reference model (wider vocab)") {
    val tokGen = Gen.oneOf(('a' to 'z').map(_.toString) ++
      Seq("tok1", "tok2", "\n"))
    val textGen = Gen.chooseNum(1, 120)
      .flatMap(n => Gen.listOfN(n, tokGen).map(_.mkString(" ")))
    check(samples(textGen, 40))
  }

  // ------------------------------------------- gopherQuality (Table A1's
  // non-repetition half — fixtures for the legs the corpus can't reach)

  private def runQ(texts: Seq[String]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextOps.gopherQuality(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
  }

  test("gopherQuality: hand-computed signals on a multi-line doc") {
    val t = "• bullet one\nplain line\nends with dots...\n- another bullet"
    val r = runQ(Seq(t)).head
    assert(r.getAs[Long]("n_lines") == 4L)
    // 2 of 4 lines bullet-started; 1 of 4 ellipsis-ended
    assert(r.getAs[Double]("bullet_line_frac") == 0.5)
    assert(r.getAs[Double]("ellipsis_line_frac") == 0.25)
    // words: 8 tokens (newlines glue "one\nplain" into one token — words
    // are SPACE splits, the documented convention)
    assert(r.getAs[Long]("n_words") == 8L)
    // one "..." and no "#": 1/8
    assert(r.getAs[Double]("symbol_word_ratio") == round6(1.0 / 8))
    assert(!r.getAs[Boolean]("keep")) // fails the 50-word floor
  }

  test("gopherQuality: symbol ratio counts hashes and ellipses per word") {
    val r = runQ(Seq("a# b ## c ... d .... e")).head
    // hashes: 3; "...": non-overlapping leftmost -> 1 + 1 (the "....")
    // over 8 words (a#, b, ##, c, ..., d, ...., e)
    assert(r.getAs[Long]("n_words") == 8L)
    assert(r.getAs[Double]("symbol_word_ratio") == round6(5.0 / 8))
  }

  test("gopherQuality: alpha fraction and stop-word count gate keep") {
    // 52 words, all alphabetic, mean length in range, enough stop words
    val good = (Seq.fill(25)("the quick") :+ "and that").mkString(" ")
    val g = runQ(Seq(good)).head
    assert(g.getAs[Long]("n_words") == 52L)
    assert(g.getAs[Double]("alpha_word_frac") == 1.0)
    assert(g.getAs[Long]("n_stop_words") == 3L)
    assert(g.getAs[Boolean]("keep"), s"good doc must keep: $g")
    // same doc with the words replaced by digits: alpha fraction dies
    val bad = (Seq.fill(25)("the 12345") :+ "and that").mkString(" ")
    val b = runQ(Seq(bad)).head
    assert(b.getAs[Double]("alpha_word_frac") < 0.8)
    assert(!b.getAs[Boolean]("keep"), "digit-heavy doc must drop")
  }

  test("gopherQuality: empty and word-count bounds") {
    val rows = runQ(Seq("", "word", ("w " * 49).trim))
    rows.foreach(r => assert(!r.getAs[Boolean]("keep"),
      s"short docs must fail the 50-word floor: $r"))
    assert(rows.head.getAs[Long]("n_words") == 0L)
    assert(rows.head.getAs[Double]("mean_word_len") == 0.0)
  }

  // ------------------------------------------------------- normalizeText

  test("normalizeText: strip, collapse, trim, lowercase — in that order") {
    val texts = Seq(
      "  Hello\tWorld \u200B!",  // tab + leading/trailing + case + ZWSP
      "a\u200Bb",                 // zero-width INSIDE a word joins halves
      "a\u0001b",                 // control char becomes a separator
      "already normal",            // no-op
      "",                          // empty
      "A\r\nB")                    // CRLF run collapses to one space
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextOps.normalizeText(df, col("doc_id"), col("text"),
      keepText = true).orderBy("doc_id").collect()
    val want = Seq("hello world !", "ab", "a b", "already normal", "", "a b")
    out.zip(want).zip(texts).foreach { case ((r, w), t) =>
      assert(r.getAs[String]("norm_text") == w, s"norm of ${t.take(30)}")
      assert(r.getAs[Boolean]("changed") == (w != t))
      assert(r.getAs[Long]("n_chars") == w.length.toLong)
    }
    // idempotence: a normalized string is its own normal form
    val again = TextOps.normalizeText(
      out.map(r => (r.getLong(0), r.getAs[String]("norm_text"))).toSeq
        .toDF("doc_id", "text"),
      col("doc_id"), col("text"), keepText = true)
      .orderBy("doc_id").collect()
    again.foreach(r => assert(!r.getAs[Boolean]("changed"),
      s"normalization must be idempotent: ${r.getAs[String]("norm_text")}"))
    // empty string fingerprints 0 (the polyHash convention)
    assert(out(4).getAs[Long]("norm_fp") == 0L)
  }

  // ----------------------------------------------------- blocklistScreen

  private def naiveCounts(text: String, pats: Seq[String]): Seq[Long] =
    pats.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }

  private def runB(texts: Seq[String], pats: Seq[String]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextOps.blocklistScreen(df, col("doc_id"), col("text"), pats)
      .orderBy("doc_id").collect()
  }

  test("blocklistScreen: hand-computed hits incl. overlapping patterns") {
    // "aba" in "ababa": starts 1,3 (overlapping) = 2; "ba" starts 2,4;
    // "b" starts 2,4 — patterns nested inside each other all report
    val pats = Seq("aba", "ba", "b")
    val r = runB(Seq("ababa"), pats).head
    assert(r.getAs[Long]("n_hits") == 6L, s"2+2+2 overlapping hits: $r")
    assert(r.getAs[Long]("n_patterns") == 3L)
    assert(r.getAs[Boolean]("flagged"))
    // no hits
    val clean = runB(Seq("zzz"), pats).head
    assert(clean.getAs[Long]("n_hits") == 0L)
    assert(!clean.getAs[Boolean]("flagged"))
    // empty text
    val empty = runB(Seq(""), pats).head
    assert(empty.getAs[Long]("n_hits") == 0L && !empty.getAs[Boolean]("flagged"))
  }

  test("blocklistScreen: phrase match crosses word boundaries") {
    val r = runB(Seq("a fast table scan"), Seq("fast table", "st ta")).head
    assert(r.getAs[Long]("n_hits") == 2L, s"both phrases overlap in: $r")
    assert(r.getAs[Long]("n_patterns") == 2L)
  }

  test("blocklistScreen: randomized parity with naive substring counting") {
    val pats = Seq("ab", "ba", "aab", "b", "abab")
    val tokGen = Gen.oneOf("a", "b", "ab", "ba", " ")
    val textGen = Gen.chooseNum(0, 80)
      .flatMap(n => Gen.listOfN(n, tokGen).map(_.mkString))
    val texts = samples(textGen, 60)
    val rows = runB(texts, pats)
    rows.zip(texts).foreach { case (r, t) =>
      val want = naiveCounts(t, pats)
      assert(r.getAs[Long]("n_hits") == want.sum,
        s"hits for '${t.take(40)}': got $r want $want")
      assert(r.getAs[Long]("n_patterns") == want.count(_ > 0).toLong,
        s"patterns for '${t.take(40)}'")
    }
  }

  test("blocklistScreen/Redact: astral (surrogate-pair) patterns match " +
      "and redact exactly") {
    val pats = Seq("🎉x", "x") // 🎉x and x
    val t = "a🎉xb x"
    val r = runB(Seq(t), pats).head
    // 🎉x once; x twice (inside 🎉x and standalone)
    assert(r.getAs[Long]("n_hits") == 3L, s"hits: $r")
    assert(r.getAs[Long]("n_patterns") == 2L)
    val df = Seq((1L, t)).toDF("doc_id", "text")
    val red = TextOps.blocklistRedact(df, col("doc_id"), col("text"), pats,
      marker = "#", keepText = true).collect().head
    // leftmost-longest: 🎉x wins over the inner x; the standalone x
    // redacts separately
    assert(red.getAs[String]("redacted_text") == "a#b #",
      s"got ${red.getAs[String]("redacted_text")}")
  }

  test("blocklistRedact: greedy leftmost-longest, FlashText semantics") {
    def red(t: String, pats: Seq[String]) = {
      val df = Seq((1L, t)).toDF("doc_id", "text")
      TextOps.blocklistRedact(df, col("doc_id"), col("text"), pats,
        marker = "#", keepText = true).collect().head
    }
    // nested patterns: the longest starting at the leftmost wins; the
    // inner/later matches are subsumed, text between spans survives
    val r1 = red("ababa", Seq("aba", "ba", "b"))
    assert(r1.getAs[String]("redacted_text") == "##",
      s"aba@1 then ba@4: ${r1.getAs[String]("redacted_text")}")
    assert(r1.getAs[Long]("n_redacted") == 2L)
    assert(r1.getAs[Long]("n_chars_removed") == 5L)
    // a longer match starting later does NOT preempt an earlier shorter
    // one (leftmost wins before longest)
    val r2 = red("xabcy", Seq("ab", "bc"))
    assert(r2.getAs[String]("redacted_text") == "x#cy")
    // no matches -> identity, fp = polyHash(text)
    val r3 = red("clean text", Seq("zz"))
    assert(r3.getAs[Long]("n_redacted") == 0L)
    assert(r3.getAs[String]("redacted_text") == "clean text")
    // adjacent matches both redact
    val r4 = red("abab", Seq("ab"))
    assert(r4.getAs[String]("redacted_text") == "##")
  }

  test("corpus smoke: signals bounded, some docs show bigram repetition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = TextOps.gopherRepetition(docs, col("doc_id"), col("text"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
        "dup_para_char_frac", "dup_5gram_frac", "dup_10gram_frac").foreach {
        c => val v = r.getAs[Double](c); assert(v >= 0.0 && v <= 1.0, c)
      }
      // no newlines in the corpus -> line/para legs are exactly 0
      assert(r.getAs[Double]("dup_line_frac") == 0.0)
    }
    // the small-vocab corpus repeats bigrams within docs
    assert(rows.count(_.getAs[Double]("top_2gram_frac") > 0.0) > 0)
  }
}
