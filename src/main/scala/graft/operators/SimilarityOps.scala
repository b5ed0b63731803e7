package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextHash._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, same operator surface:
  *  - brute force: exact cosine against every vector. Correctness baseline;
  *    at scale only for a bounded query set against a broadcastable corpus
  *    sample, or as the verify step on candidates.
  *  - sign-LSH bucketed: vectors are pre-bucketed by projection signs; the
  *    join is equi on bucket, so at 100 TB it's a shuffled hash join on a
  *    uniformly distributed key, reducing compared pairs by ~2^nBits. An IVF
  *    variant is the same shape with learned centroids as the bucket key.
  *
  * Cosine is computed with [[graft.functions.TextHash.cosine]] — a fixed
  * left-fold, so results are bit-reproducible across partitionings. Ranking
  * ties are broken on the neighbor id after rounding the score to 1e-6, so
  * the top-k set is stable under float noise.
  */
object SimilarityOps {

  /** All pairs (a < b) with cosine ≥ threshold — embedding near-dup
    * detection (brute-force; see object doc for the scale path). */
  def cosinePairs(emb: DataFrame, id: Column, vec: Column,
      threshold: Double): DataFrame = {
    val v = emb.select(id.as("vid"), vec.as("e"))
    v.as("a").join(v.as("b"), col("a.vid") < col("b.vid"))
      .withColumn("cos_sim", round(cosine(col("a.e"), col("b.e")), 6))
      .where(col("cos_sim") >= threshold)
      .select(col("a.vid").as("vec_a"), col("b.vid").as("vec_b"),
        col("cos_sim"))
  }

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      vec: Column, k: Int): DataFrame = {
    val c = corpus.select(id.as("nid"), vec.as("ne"))
    val q = queries.select(id.as("qid"), vec.as("qe"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .withColumn("cos_sim", round(cosine(col("qe"), col("ne")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"),
        col("nid").as("neighbor_id"), col("cos_sim"))
  }

  /** Sign-LSH bucketed top-k: queries only compare against corpus vectors in
    * the same bucket. Approximate (recall < 1), ~2^nBits cheaper. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: Column, vec: Column,
      nBits: Int, k: Int): DataFrame = {
    val c = corpus.select(id.as("nid"), vec.as("ne"),
      signBucket(vec, nBits).as("bucket"))
    val q = queries.select(id.as("qid"), vec.as("qe"),
      signBucket(vec, nBits).as("qbucket"))
    val scored = q.join(c,
        col("qbucket") === col("bucket") && col("qid") =!= col("nid"))
      .withColumn("cos_sim", round(cosine(col("qe"), col("ne")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"),
        col("nid").as("neighbor_id"), col("bucket"), col("cos_sim"))
  }
}
