package graft.tools

/** Scratch driver: run registered queries by name against a testdata dir.
  * Usage: sbt "Test/runMain graft.tools.Smoke <sfDir> <query...>" */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (n <- args.drop(1)) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, d)
      val c = df.count()
      println(f"SMOKE $n rows=$c schema=${df.schema.map(_.name).mkString(",")} t=${(System.nanoTime() - t0) / 1e9}%.2f")
      df.show(5, truncate = false)
    }
    spark.stop()
  }
}
