package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer round-trip audit — the standard pre-ship gate none of the
  * fertility/coverage faces (q128/q194/q197) asserts directly: does
  * `decode(encode(text))` reconstitute the text, and where it cannot
  * (WordPiece's whole-word `[UNK]` collapse), how large is the loss per
  * group? BPE (tokens concatenate to word + `</w>`), byte-level BPE
  * (tokens un-hex to the word's UTF-8 octets) and the unigram-LM
  * Viterbi (pieces partition the word) are lossless BY CONSTRUCTION —
  * this face proves it computationally rather than assuming it, the
  * same way q193 proves generalization instead of reporting train-set
  * accuracy. (Public convention: the `decode(encode(x)) == x`
  * invariant every production tokenizer README documents; WordPiece's
  * UNK loss is why BERT pipelines track `unk_token` rates.)
  *
  * Scale shape: four row-local compiled-encode passes over one corpus
  * scan each (the per-word compare is a HOF filter inside the same
  * projection — no join, no shuffle beyond the group-cardinality
  * aggregation), unioned into a (4 × groups)-row frame. */
object TokenizerAuditOps {

  /** Per-(tokenizer, group) identity table: docs, lossless docs, words,
    * lossy words, and the lossy-word fraction. A lossy word is one
    * whose per-word decode differs from the word itself. */
  def roundTrip(docs: DataFrame, id: Column, text: Column, group: Column,
      bpeMerges: Seq[(String, String)],
      byteMerges: Seq[(String, String)],
      wpVocab: Seq[String],
      uniPieces: Seq[(String, Double)]): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.BpeExpressions.register(spark)
    graft.functions.WordPieceExpressions.register(spark)
    graft.functions.UnigramExpressions.register(spark)
    val words = filter(split(text, " "), w => length(w) > 0)

    def face(name: String, lossyWord: Column => Column): DataFrame =
      docs.select(group.as("grp"),
          size(words).cast("long").as("_w"),
          size(filter(words, w => lossyWord(w))).cast("long").as("_l"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("_l") === 0, 1L).otherwise(0L))
            .as("n_docs_lossless"),
          sum(col("_w")).as("n_words"),
          sum(col("_l")).as("n_lossy_words"))
        .select(lit(name).as("tokenizer"), col("grp"), col("n_docs"),
          col("n_docs_lossless"), col("n_words"), col("n_lossy_words"),
          when(col("n_words") > 0,
            round(col("n_lossy_words").cast("double") / col("n_words"), 6))
            .as("lossy_word_frac"))

    // char BPE: tokens concatenate to the word's chars + the terminal
    // marker — decode strips nothing, the identity IS the concat
    val bpe = face("bpe", w =>
      array_join(graft.functions.BpeExpressions.bpeEncode(w, bpeMerges),
        "") =!= concat(w, lit(BpeOps.EndOfWord)))
    // byte BPE: tokens are hex-pair concatenations; decode = unhex the
    // concatenated stream back to UTF-8 — no marker, no UNK
    val bytebpe = face("bytebpe", w =>
      decode(unhex(array_join(
        graft.functions.BpeExpressions.byteBpeEncode(w, byteMerges), "")),
        "UTF-8") =!= w)
    // WordPiece: first token raw, continuations strip the '##' marker;
    // an [UNK] collapse decodes to the literal '[UNK]' and counts lossy
    // (unless the word IS '[UNK]' — the honest corner)
    val wordpiece = face("wordpiece", { w =>
      val toks = graft.functions.WordPieceExpressions
        .wordPieceEncode(spark, w, wpVocab)
      concat(element_at(toks, 1),
        aggregate(slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          lit(""),
          (acc, t) => concat(acc, t.substr(lit(3), length(t))))) =!= w
    })
    // unigram LM: Viterbi pieces partition the word exactly (the char
    // fallback guarantees coverage) — decode is the plain concat
    val unigram = face("unigram", w =>
      array_join(graft.functions.UnigramExpressions
        .unigramEncode(w, uniPieces), "") =!= w)

    bpe.unionByName(bytebpe).unionByName(wordpiece).unionByName(unigram)
  }
}
