package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, engine-portable text hashing primitives.
  *
  * All hashes are defined in pure integer arithmetic over code points
  * (polynomial rolling hash mod a 31-bit prime), so the exact same value is
  * computable in any SQL engine — no dependence on Spark's murmur3 `hash()`
  * or DuckDB's internal `hash()`, which differ. Everything stays inside
  * Catalyst's codegen'd higher-order array functions: no UDFs, fully
  * distributed, no driver involvement.
  */
object TextHash {
  /** 31-bit prime modulus; intermediate products stay well inside Long. */
  val P: Long = 1000000007L

  /** Per-minhash-permutation constants h_i(x) = (a_i*x + b_i) mod P. */
  val MinhashA: Seq[Long] = Seq(131L, 137L, 139L, 149L, 151L, 157L, 163L, 167L)
  val MinhashB: Seq[Long] = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)

  /** DuckDB SQL fragment computing the polynomial rolling hash — fold
    * (acc*31 + codepoint) mod P left-to-right over the characters. The
    * Spark-side implementation is the codegen'd
    * [[graft.functions.PolyHash]] expression (same definition). */
  def polyHashSql(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($s, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $P)"

  /** DuckDB fragment of [[graft.operators.TextOps.hrwMix]] — the
    * multiply–xorshift–multiply avalanche over a [0, P) hash. Mirrored
    * from the Column definition verbatim; shared by the q143/q147/q148
    * oracles. */
  def hrwMixSql(h: String): String =
    s"((xor((($h) * 2654435761) % $P, ((($h) * 2654435761) % $P)" +
      s" >> 15)) * 2654435761) % $P"

  /** Word n-gram shingles of a space-tokenized text as an array column:
    * element i = words[i..i+w-1] joined by a single space. Single-word (or
    * shorter-than-w) texts yield one (possibly short) shingle. */
  def wordShingles(text: Column, w: Int): Column = {
    val ws = split(text, " ")
    transform(
      sequence(lit(1), greatest(size(ws) - lit(w - 1), lit(1))),
      i => concat_ws(" ", slice(ws, i, lit(w))))
  }

  /** DuckDB fragment for [[wordShingles]] given a table alias exposing
    * `ws` = string_split(text, ' '); produces rows via UNNEST, one shingle
    * per `i`. Kept as a pattern string — see call sites in queries. */
  def wordShinglesSql(w: Int): String =
    s"array_to_string(ws[i:i+${w - 1}], ' ')"

  /** The i-th minhash permutation applied to a shingle-hash column. */
  def minhashPerm(h: Column, i: Int): Column =
    (h * lit(MinhashA(i)) + lit(MinhashB(i))) % lit(P)

  def minhashPermSql(h: String, i: Int): String =
    s"($h * ${MinhashA(i)} + ${MinhashB(i)}) % $P"

  /** Combine a band of minhash values into one bucket id: polynomial fold
    * (acc*31 + m) with mod P applied at EVERY step (so intermediates stay
    * inside Long); [[bandBucketSql]] is the same per-step fold — port both
    * together. */
  def bandBucket(ms: Seq[Column]): Column =
    ms.reduce((acc, m) => (acc * lit(31L) + m) % lit(P))

  def bandBucketSql(ms: Seq[String]): String =
    ms.reduce((acc, m) => s"(($acc) * 31 + $m) % $P")

  /** Sampling bucket with an avalanche step: the raw polynomial hash is
    * SEQUENTIAL for texts differing only in a trailing digit (h(s+c) =
    * 31·h(s)+c), so `h mod buckets` would give near-identical documents
    * near-identical buckets — correlated sampling decisions, a biased
    * sample. One Knuth multiplicative step (odd constant ≈ 2³²/φ) spreads
    * consecutive hashes across the whole field before bucketing.
    * Intermediates stay < 2.7e18 (inside Long/BIGINT in both engines). */
  def sampleBucket(h: Column, buckets: Int): Column =
    (h * lit(2654435761L)) % lit(P) % lit(buckets)

  def sampleBucketSql(h: String, buckets: Int): String =
    s"((($h) * 2654435761) % $P) % $buckets"

  // ------------------------------------------------------- vector helpers

  /** DuckDB fragment computing the deterministic dot product of two list
    * columns `a`,`b` of length `dim`: widen each element to double,
    * multiply pairwise, left-fold sum — exactly the accumulation order of
    * the Spark-side codegen'd [[graft.functions.FloatVectorDot]]. */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1,$dim), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x,y) -> x + y)"

  /** Sign-LSH bucket over the first `nBits` vector components: bit j set iff
    * v[j+1] > 0. Cheap, deterministic, balanced for zero-centered embeddings
    * — the bucketed ANN scale path. */
  def signBucket(v: Column, nBits: Int): Column = signBucketAt(v, nBits, 0)

  def signBucketSql(v: String, nBits: Int): String =
    signBucketAtSql(v, nBits, 0)

  /** [[signBucket]] over components `offset+1 .. offset+nBits` — disjoint
    * offsets give INDEPENDENT hash tables for multi-table LSH (union of
    * per-table candidates recovers pairs a single table's sign boundary
    * splits). */
  def signBucketAt(v: Column, nBits: Int, offset: Int): Column =
    (1 to nBits).map(j =>
      when(element_at(v, offset + j) > lit(0f), lit(1 << (j - 1))).otherwise(lit(0)))
      .reduce(_ + _)

  def signBucketAtSql(v: String, nBits: Int, offset: Int): String =
    (1 to nBits).map(j =>
      s"(CASE WHEN $v[${offset + j}] > 0 THEN ${1 << (j - 1)} ELSE 0 END)")
      .mkString(" + ")
}
