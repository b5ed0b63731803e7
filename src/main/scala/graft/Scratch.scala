package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    println("docs: " + docs.count())
    val sig = time("minhashSignatures materialize") {
      val s = DedupOps.minhashSignatures(docs, col("doc_id"), col("text"), 2)
      s.write.format("noop").mode("overwrite").save(); s
    }
    val bands = sig.select(
      col("doc_id"),
      graft.functions.TextHash.bandBucket((0 to 3).map(i => col(s"m$i"))).as("band0"),
      graft.functions.TextHash.bandBucket((4 to 7).map(i => col(s"m$i"))).as("band1"))
      .selectExpr("doc_id", "stack(2, 0, band0, 1, band1) as (band, b)")
    time("bucket histogram") {
      bands.groupBy("band", "b").count()
        .orderBy(col("count").desc).limit(10).show(false)
    }
    time("pre-distinct pair count") {
      val j = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.b") === col("y.b") &&
          col("x.doc_id") < col("y.doc_id"))
      println("pairs pre-distinct: " + j.count())
    }
    time("q32 end-to-end") {
      SparkEntry.queries("q32_lsh_candidate_pairs")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    time("q33 end-to-end") {
      SparkEntry.queries("q33_jaccard_pairs")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
