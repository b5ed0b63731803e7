package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Pipeline, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-domain registries in
  * [[graft.queries]]; every SQL-expressible operator carries a DuckDB oracle
  * with 1:1 column names (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Every exposed capability, in registry order. */
  def registry: Seq[QueryDef] =
    Relational.all ++ Pipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.find(_.name == "q10_pricing_summary").get
      .spark(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(g => q.name -> g())).toMap
}
