package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic floating-point aggregation helpers.
  *
  * Plain `sum(double)` depends on partition/merge order, so the same query can
  * return values differing in the last ulps between runs, engines, and
  * cluster sizes — which breaks hash-compare against a DuckDB oracle and makes
  * results non-reproducible at 100 TB (where partition counts are huge).
  *
  * Fix: round each addend to a fixed decimal scale (exact in DECIMAL), sum in
  * exact decimal arithmetic (order-independent), and cast the final total back
  * to double. Both Spark and DuckDB sum decimals exactly (int128 accumulator),
  * so `CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE)` is bit-identical across
  * engines AND across partitionings. Cost: negligible — decimal sum is still a
  * codegen'd hash aggregate with map-side partial aggregation.
  */
object Exact {
  /** Internal decimal type: 18 integer digits, 10 fractional — fits sums of
    * ~1e8-magnitude doubles over billions of rows without overflow (Spark
    * widens the sum to DECIMAL(38,10)). */
  val SumDecimal: DecimalType = DecimalType(28, 10)

  /** Order-independent sum of a double expression (see object doc). */
  def dsum(c: Column): Column = sum(c.cast(SumDecimal)).cast(DoubleType)

  /** dsum over rows matching `cond`; 0.0 when no row matches (the reference
    * fills missing slices with 0 before arithmetic — processor/main.py:493). */
  def dsumIf(cond: Column, c: Column): Column =
    coalesce(sum(when(cond, c).cast(SumDecimal)).cast(DoubleType), lit(0.0))

  /** Deterministic mean: exact decimal sum divided (in IEEE double) by the
    * count — one double division, no order dependence. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Guarded ratio — NULL when the denominator is not strictly positive
    * (reference semantics at processor/main.py:509-513: never divide by zero,
    * return NULL instead of ±Inf). */
  def guardedRatio(num: Column, den: Column): Column =
    when(den > lit(0), num / den)

  /** Conditional count as a long (reference dwell-seconds pattern,
    * processor/main.py:534-536). */
  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))
}
