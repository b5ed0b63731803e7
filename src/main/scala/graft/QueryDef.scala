package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) an equivalent DuckDB oracle
  * query over the same parquet tables. Column names are aligned 1:1 between
  * the two — the driver sorts columns by name before hashing values.
  *
  * The oracle is a THUNK, evaluated when [[SparkEntry.oracleSql]] is
  * dumped (after the queries ran, inside Verify's JVM): almost every
  * oracle is a static string (the eager `apply` overload), but an
  * operator whose oracle replays a FITTED model — q134's whitening
  * apply — generates its SQL from the fit at dump time, embedding the
  * frozen (i, j, w) matrix as a VALUES table. */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[() => String])

object QueryDef {
  def apply(name: String, spark: (SparkSession, String) => DataFrame,
      oracle: String): QueryDef =
    QueryDef(name, spark, Some(() => oracle))
}
