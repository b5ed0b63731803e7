package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping tools a 100 TB deployment needs
  * beyond what AQE does automatically.
  *
  *  - Salting: for aggregations/joins with pathological key skew (one bus,
  *    one document cluster, one hot minute dominating a partition). AQE's
  *    skew-join split handles sort-merge joins; salting is the general tool
  *    that also covers aggregations and works below AQE's thresholds.
  *  - Bucketing: pre-shuffle the lake ONCE at write time; every later join
  *    or aggregation on the bucket key is exchange-free. The write cost is
  *    amortized over every downstream query.
  */
object ScaleOps {

  /** Deterministic per-row salt: a content hash of every column, so a
    * re-executed map task assigns the SAME salt to the same row. Salting from
    * spark_partition_id()/monotonically_increasing_id() is the classic
    * non-deterministic-shuffle-key hazard (SPARK-23207): after a shuffle-fetch
    * failure, recomputed tasks re-salt rows differently while some reducers
    * already consumed the old output — duplicating or dropping rows. Identical
    * rows hash to the same salt (they are indistinguishable anyway), which
    * still spreads a hot KEY as long as its payloads vary. */
  private def contentSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong))

  /** Two-phase skew-safe aggregation: aggregate on (key, salt) first —
    * spreading a hot key over `salts` partial groups — then combine.
    * The aggregate list must be algebraically combinable (sum/count/min/max
    * and compositions); the caller supplies both phases. */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      salts: Int,
      partial: Seq[Column],
      combine: Seq[Column]): DataFrame =
    df.withColumn("_salt", contentSalt(df, salts))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("_key"))
      .agg(combine.head, combine.tail: _*)
      .withColumnRenamed("_key", "key")

  /** Skew-safe inner equi-join: replicate each right row `salts` times and
    * salt the left side, so one hot key spreads over `salts` tasks. Use for
    * a moderately-sized right side; for dimension tables just broadcast. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", contentSalt(left, salts))
    val replicatedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    saltedLeft.join(replicatedRight,
        leftKey === rightKey && saltedLeft("_salt") === replicatedRight("_salt"))
      .drop("_salt")
  }

  /** Weighted random sampling WITHOUT replacement (Efraimidis & Spirakis,
    * IPL 2006): give each row the key u^(1/w) for u ~ U(0,1]; the n
    * largest keys are exactly a weighted sample without replacement —
    * one pass, fully distributed, no sequential draw loop. u is
    * DETERMINISTIC here (u = (hrwMix(id mod P)+1)/(P+1), the q143
    * avalanche primitive), so re-runs and the DuckDB oracle reproduce
    * the same sample — a training-data pipeline wants reproducible
    * subsets, not true randomness. Keys are compared in log space
    * scaled by 10^6 before the round-6 (12 significant decimals —
    * enough that the engines agree and distinct weights stay distinct).
    *
    * Selection is `orderBy(...).limit(n)` — Spark plans TakeOrdered
    * (per-partition top-n, driver merge of n·partitions rows), never a
    * single-partition global window; the rank is re-derived on the
    * n-row result. */
  def weightedSample(df: DataFrame, id: Column, weight: Column, n: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n must be >= 1, got $n")
    val P = graft.functions.TextHash.P
    val mix = TextOps.hrwMix(pmod(id.cast("long"), lit(P)))
    val u = (mix + lit(1L)).cast("double") / lit((P + 1).toDouble)
    val skey = round(log(u) * lit(1000000.0) / weight.cast("double"), 6)
    val top = df
      .where(weight.cast("double") > 0)
      .select(id.cast("long").as("did"),
        weight.cast("double").as("weight"), skey.as("skey"))
      .orderBy(col("skey").desc, col("did"))
      .limit(n)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("skey").desc, col("did")))
        .cast("long"))
  }

  /** Write a table bucketed + sorted on a key: downstream equi-joins and
    * aggregations on that key plan with zero Exchange (asserted in
    * ScaleOpsSpec). Bucket count should match the target parallelism at the
    * lake's scale, not the current job's. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
