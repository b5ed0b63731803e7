package graft.tools

/** Dev diagnostic: dump the [[graft.operators.UrlOps]] DuckDB twin SQL
  * to files so the cross-engine parity harness (scripts + UrlSpec's
  * fixtures replayed in DuckDB) can exercise the exact strings the
  * oracle runs. Usage: `sbt "runMain graft.tools.UrlSqlDump /tmp"`. */
object UrlSqlDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp")
    def put(name: String, s: String): Unit = {
      val w = new java.io.PrintWriter(s"$dir/$name")
      try w.println(s) finally w.close()
    }
    put("canon_url.sql", graft.operators.UrlOps.canonicalUrlSql("url"))
    put("host_of.sql", graft.operators.UrlOps.hostOfSql("url"))
    put("reg_dom.sql", graft.operators.UrlOps.registeredDomainSql("host"))
  }
}
