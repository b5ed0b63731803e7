package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{PQOps, SimilarityOps}
object PQProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val queries = emb.where(col("vec_id") < 50)
    // exact L2 truth: identity "index" whose recon is the float vector
    val idIdx = emb.select(col("vec_id"),
      array((1 to 64).map(i => element_at(col("embedding"), i).cast("double")): _*).as("recon"))
    val truth = PQOps.pqTopK(idIdx, queries, col("vec_id"), col("embedding"), 3, 8)
    val fixedIdx = PQOps.pqIndex(emb, emb.where(col("vec_id") < 8),
      col("vec_id"), col("embedding"), 8, 8)
    val fixedTk = PQOps.pqTopK(fixedIdx, queries, col("vec_id"), col("embedding"), 3, 8)
    val learnedIdx = PQOps.pqIndex(emb,
      PQOps.pqLearnCodebook(emb, col("embedding"), 8, 8, 8, "vec_id", "embedding"),
      col("vec_id"), col("embedding"), 8, 8)
    val learnedTk = PQOps.pqTopK(learnedIdx, queries, col("vec_id"), col("embedding"), 3, 8)
    SimilarityOps.annRecall(truth, fixedTk, "pq_fixed").show()
    SimilarityOps.annRecall(truth, learnedTk, "pq_learned").show()
    // K=64 learned codebook
    val t0 = System.nanoTime
    val cbDefault = PQOps.pqLearnCodebook(emb, col("embedding"), 8, 8, 8, "vec_id", "embedding")
    cbDefault.count()
    val t1 = System.nanoTime
    val cbRandom = PQOps.pqLearnCodebook(emb, col("embedding"), 8, 8, 8, "vec_id", "embedding", initMode = "random")
    cbRandom.count()
    val t2 = System.nanoTime
    println(f"FIT default ${(t1-t0)/1e9}%.2f s  random ${(t2-t1)/1e9}%.2f s")
    val randTk = PQOps.pqTopK(PQOps.pqIndex(emb, cbRandom, col("vec_id"), col("embedding"), 8, 8),
      queries, col("vec_id"), col("embedding"), 3, 8)
    SimilarityOps.annRecall(truth, randTk, "pq_random_init").show()
    val cb64r = PQOps.pqLearnCodebook(emb, col("embedding"), 8, 8, 64, "vec_id", "embedding", initMode = "random")
    val short20r = PQOps.pqTopK(PQOps.pqIndex(emb, cb64r, col("vec_id"), col("embedding"), 8, 8),
      queries, col("vec_id"), col("embedding"), 20, 8)
    SimilarityOps.annRecall(truth, short20r, "pq_k64r_short20").show()
    val learned64 = PQOps.pqIndex(emb,
      PQOps.pqLearnCodebook(emb, col("embedding"), 8, 8, 64, "vec_id", "embedding"),
      col("vec_id"), col("embedding"), 8, 8)
    val learned64Tk = PQOps.pqTopK(learned64, queries, col("vec_id"), col("embedding"), 3, 8)
    SimilarityOps.annRecall(truth, learned64Tk, "pq_learned_k64").show()
    // shortlist recall: true top-3 recovered within PQ top-20 shortlist
    val short20 = PQOps.pqTopK(learned64, queries, col("vec_id"), col("embedding"), 20, 8)
    SimilarityOps.annRecall(truth, short20, "pq_k64_short20").show()
    val short20k8 = PQOps.pqTopK(learnedIdx, queries, col("vec_id"), col("embedding"), 20, 8)
    SimilarityOps.annRecall(truth, short20k8, "pq_k8_short20").show()
    val binShort = SimilarityOps.binarySignTopK(emb, queries, col("vec_id"), col("embedding"), 64, 50)
    SimilarityOps.annRecall(truth, binShort, "bin_short50").show()
    val binShort20 = SimilarityOps.binarySignTopK(emb, queries, col("vec_id"), col("embedding"), 64, 20)
    SimilarityOps.annRecall(truth, binShort20, "bin_short20").show()
    spark.stop()
  }
}
