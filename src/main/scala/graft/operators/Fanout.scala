package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive fan-out for per-row-heavy stages over small scans.
  *
  * The test tables are single small parquet files, and Spark's split
  * planning floors split size at `spark.sql.files.openCostInBytes`
  * (4 MB) with row-group granularity underneath — so a 0.6 MB /
  * one-row-group table scans as ONE task no matter the core count, and
  * every per-row-expensive operator chained on it (shingle hashing,
  * per-vector moment explosion, PQ encoding, tokenization) runs
  * single-threaded until its first exchange (guide §2.5 "input skew:
  * one huge unsplittable file — repartition immediately after the
  * read"). At 100 TB the same scan has thousands of row groups and
  * this helper is a NO-OP: it only fires when the input has fewer
  * partitions than the cluster has cores, i.e. exactly the tiny-input
  * case, and the target is derived from the runtime
  * (`defaultParallelism`), never a constant — the driver's
  * SPARK_GRAFT_CPUS sweep scales it automatically.
  *
  * Round-robin repartition is used (not keyed): the downstream
  * operators establish their own keying at their first exchange, and a
  * keyed distribution here would inherit whatever skew the key has.
  * All registered queries are partition-layout invariant (the oracle
  * hash-gate re-proves it at both SFs for every touched query).
  */
object Fanout {
  /** `df` spread over `defaultParallelism` partitions when (and only
    * when) it currently has fewer — the 100 TB case passes through
    * untouched, exchange-free. */
  /** A/B kill-switch for measurement only (`SPARK_GRAFT_NO_FANOUT=1`
    * makes spread the identity): lets a single binary time every
    * operator with and without the fan-out, so attribution never
    * compares two JITs. */
  private val disabled: Boolean =
    sys.env.get("SPARK_GRAFT_NO_FANOUT").contains("1")

  def spread(df: DataFrame): DataFrame = {
    if (disabled) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
