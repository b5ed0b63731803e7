package graft.tools
import graft.GraftSession
object Q70Solo {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q70_containment_prefix")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[q70solo] rep $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
