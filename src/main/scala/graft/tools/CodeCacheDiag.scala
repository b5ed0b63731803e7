package graft.tools

/** Runs the full query registry (Verify at a small SF) in this JVM, then
  * prints JIT code-cache pool usage/peak — checks whether a ~90-query
  * suite approaches the default 240 MB ReservedCodeCacheSize (whose silent
  * flushing would de-optimize late-suite queries: the q70 in-harness
  * signature). Dev tool only. */
object CodeCacheDiag {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.Verify.main(Array(sf, "/tmp/ccdiag_out"))
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.toLowerCase.contains("code"))
      .foreach { p =>
        val u = p.getUsage; val pk = p.getPeakUsage
        println(f"[codecache] ${p.getName}%-40s used=${u.getUsed / 1e6}%8.1f MB" +
          f" peak=${pk.getUsed / 1e6}%8.1f MB max=${u.getMax / 1e6}%8.1f MB")
      }
    val total = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getName.toLowerCase.contains("code"))
      .map(_.getPeakUsage.getUsed).sum
    println(f"[codecache] TOTAL peak used = ${total / 1e6}%.1f MB")
  }
}
