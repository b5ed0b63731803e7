package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** File-layout operators: the WRITE-side half of the 100 TB posture that
  * [[ScaleOps]]' shuffle shaping and the readers' pushdown assume.
  *
  * At lake scale, read performance is mostly decided before the first
  * query runs, by how the writer laid the files out:
  *
  *  - **File sizing.** A 100 TB table written by a 10k-task job in
  *    per-task files yields millions of small files: listing dominates
  *    planning, every scan pays per-file open/footer costs, and the
  *    driver's file index bloats. [[compactedWrite]] targets a fixed
  *    row count per file instead.
  *  - **Range clustering.** Parquet row-group and file skipping work off
  *    min/max statistics; they prune only when values are CLUSTERED, not
  *    scattered. Sorting the whole table by the hot predicate column
  *    gives disjoint per-file ranges — a point/range predicate then
  *    touches O(1) files instead of all of them.
  *  - **Multi-dimension clustering.** A single-column sort gives perfect
  *    pruning on that column and none on any other. Interleaving the
  *    bits of k normalized columns ([[zValue]] — the Morton/Z-order
  *    curve, the technique behind lakehouse OPTIMIZE ZORDER) bounds
  *    every file's min/max box on EVERY indexed column: each dimension's
  *    pruning weakens from "perfect" to "bounded", instead of one
  *    dimension taking everything and the rest nothing.
  *
  * Everything here is expressed as plain projections + one
  * `repartitionByRange` exchange, so Catalyst/AQE plan it like any other
  * query; nothing is driver-side except the k min/max scalars. */
object LayoutOps {

  /** Morton (Z-order) value of `cols`, each normalized to `bits`-bit bins
    * against its `[min, max]` range, bits interleaved column-major:
    * output bit `b * k + j` is bin bit `b` of column `j`. Pure column
    * arithmetic — codegen'd, no UDF.
    *
    * Normalization is linear min/max binning (the two scalars per column
    * come from one tiny aggregate over the data, or from table metadata
    * at a real lake). Rows at `max` land in the top bin; rows OUTSIDE
    * the stated range are clamped into the edge bins — the curve stays
    * total, outliers just cluster at the ends. NULL normalizes to bin 0
    * (sorts first, the usual NULLS FIRST layout convention).
    *
    * `k * bits` must fit a long's 63 usable bits; 2 columns × 16 bits
    * covers 4 G distinct cells, plenty of resolution for file-level
    * skipping (cells per file stays >= 1 until files outnumber cells).
    *
    * NaN inputs bin like NULL (bin 0): without the guard Spark's
    * NaN-is-largest ordering would silently send them to the TOP bin
    * (NaN survives `greatest`, then `least` picks maxBin) — a layout
    * surprise, not an error. Un-binnable values (NULL, NaN) cluster
    * together at the low edge where a reader expects them. */
  def zValue(cols: Seq[(Column, Double, Double)], bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"need 1..${63 / bits} columns at $bits bits, got ${cols.size}")
    require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")
    val k = cols.size
    val maxBin = (1L << bits) - 1
    val bins = cols.map { case (c, lo, hi) =>
      require(hi > lo, s"max must exceed min for $c: [$lo, $hi]")
      val cd = c.cast("double")
      val guarded = when(isnan(cd), lit(null)).otherwise(cd)
      val scaled = (guarded - lit(lo)) / lit(hi - lo) * lit(maxBin.toDouble)
      least(greatest(coalesce(round(scaled), lit(0.0)), lit(0.0)),
        lit(maxBin.toDouble)).cast("long")
    }
    (0 until bits).flatMap { b =>
      bins.zipWithIndex.map { case (bin, j) =>
        shiftleft(shiftright(bin, b).bitwiseAND(lit(1L)), b * k + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** The per-column (min, max) scalars [[zValue]] needs, from one
    * aggregate pass. At a managed lake these come free from table
    * statistics; here they cost one cheap scan of just the indexed
    * columns. */
  def columnRanges(df: DataFrame, cols: Seq[String]): Seq[(String, Double, Double)] = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("double"),
      max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).head
    cols.zipWithIndex.map { case (c, i) =>
      (c, row.getDouble(2 * i), row.getDouble(2 * i + 1)) }
  }

  /** Compact + range-cluster `df` into `numFiles` parquet files of
    * near-equal row count, globally range-partitioned and in-file sorted
    * on `sortCols` — per-file value ranges on the leading sort column are
    * DISJOINT (asserted in LayoutOpsSpec), so min/max file skipping on it
    * is exact. One exchange (the range partitioner), one in-partition
    * sort; `maxRecordsPerFile` additionally caps any file that sampling
    * skew made oversized (splitting a partition into sequential sorted
    * chunks keeps ranges disjoint).
    *
    * `numFiles` is explicit, not derived: at 100 TB the writer knows its
    * target file size (the lake convention, e.g. ~1 GB) and row width;
    * deriving it here would cost a full count of the input. */
  def compactedWrite(df: DataFrame, path: String, numFiles: Int,
      sortCols: Seq[String], maxRecordsPerFile: Long = 0L): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(sortCols.nonEmpty, "need at least one sort column")
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(path)
  }

  /** [[compactedWrite]] along the Z-order curve of `zCols` instead of a
    * lexicographic sort: every written file's min/max bounding box is
    * tight on EVERY indexed column, so single-column predicates on any
    * of them prune files (the multi-dimension trade [[zValue]]
    * documents). Ranges are taken from [[columnRanges]] unless supplied. */
  def zOrderedWrite(df: DataFrame, path: String, numFiles: Int,
      zCols: Seq[String], bits: Int = 16,
      ranges: Option[Seq[(String, Double, Double)]] = None): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val rs = ranges.getOrElse(columnRanges(df, zCols))
    require(rs.map(_._1) == zCols, s"ranges must align with zCols: $rs")
    df.withColumn("_z", zValue(rs.map { case (c, lo, hi) => (col(c), lo, hi) },
        bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compaction PLAN over a file audit: assign files — kept in their
    * clustering order — to rewrite bins of ~`targetRows` rows each. The
    * binning is the distributed-prefix-sum rule (the [[graft.operators
    * .TextOps]] sequence-packing precedent): `bin = floor(rows-before /
    * targetRows)`, one window pass, fully deterministic — versus the
    * sequential greedy that closes a bin exactly at the target, this can
    * overshoot a bin by at most one file, and in exchange the plan is a
    * pure relational expression (parallel, engine-reproducible,
    * SQL-replayable). Because bins take ADJACENT files in `orderCol`
    * order, compacting a range-clustered layout ([[compactedWrite]] /
    * [[zOrderedWrite]]) preserves the disjointness of per-file ranges —
    * the property that makes min/max skipping exact — which is exactly
    * why the plan orders by the leading cluster key's file min, not by
    * file size. Output `(file, n_rows, bin, bin_rows, bin_files,
    * needs_compaction)`; only `bin_files > 1` bins need rewriting, the
    * rest are already at target. The audit is file-LEVEL metadata (one
    * row per file), so the unpartitioned windows are driver-scale by
    * construction; at a real lake run the plan per table partition. */
  def compactionPlan(audit: DataFrame, fileCol: Column, rowsCol: Column,
      orderCol: Column, targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val w = Window.orderBy(col("_ord"), col("file"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wb = Window.partitionBy(col("bin"))
    audit.select(fileCol.as("file"), rowsCol.cast("long").as("n_rows"),
        orderCol.as("_ord"))
      .withColumn("_before", coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .withColumn("bin",
        floor(col("_before") / lit(targetRows)).cast("long"))
      .withColumn("bin_rows", sum(col("n_rows")).over(wb))
      .withColumn("bin_files", count(lit(1)).over(wb))
      .select(col("file"), col("n_rows"), col("bin"), col("bin_rows"),
        col("bin_files"), (col("bin_files") > 1).as("needs_compaction"))
  }

  /** Zone-map file-skipping PLAN: the pruning decision a lakehouse scan
    * planner makes from manifest statistics, as an auditable relational
    * operator. Input is a file audit (one row per file with
    * `<c>_min`/`<c>_max` box columns — [[fileLayoutAudit]]'s shape, or
    * table-format manifests at a real lake); `preds` is a conjunction of
    * closed-interval predicates `(column, lo, hi)`. A file must be
    * scanned iff its box intersects EVERY predicate interval
    * (`c_min <= hi AND c_max >= lo`); a NULL statistic is conservatively
    * scannable (stats are an optimization, never a correctness gate —
    * the rule every format's pruning spec shares). Output: per file the
    * box verdict per predicate column and the final `scan` decision.
    * Pure projection over file-LEVEL metadata — evaluating it for a
    * 100 TB table costs one pass over rows-per-file manifest entries,
    * which is why clustering quality ([[compactedWrite]] /
    * [[zOrderedWrite]]) decides scan cost before any data is read. */
  def pruningPlan(audit: DataFrame, fileCol: Column, rowsCol: Column,
      preds: Seq[(String, Double, Double)]): DataFrame = {
    require(preds.nonEmpty, "need at least one predicate interval")
    val verdicts = preds.map { case (c, lo, hi) =>
      (coalesce(col(s"${c}_min").cast("double") <= lit(hi), lit(true)) &&
        coalesce(col(s"${c}_max").cast("double") >= lit(lo), lit(true)))
        .as(s"${c}_hit")
    }
    audit.select(Seq(fileCol.as("file"), rowsCol.cast("long").as("n_rows")) ++
      verdicts: _*)
      .withColumn("scan", preds.map(p => col(s"${p._1}_hit")).reduce(_ && _))
  }

  /** One-row effectiveness summary of a [[pruningPlan]]: files/rows
    * total vs scanned — the number a layout change is judged by (a
    * perfect range-clustered layout scans O(selectivity) rows; a
    * scattered one scans everything regardless of the predicate). */
  def pruningPlanSummary(plan: DataFrame): DataFrame =
    plan.agg(count(lit(1)).as("files_total"),
      sum(when(col("scan"), 1L).otherwise(0L)).as("files_scanned"),
      sum(col("n_rows")).as("rows_total"),
      sum(when(col("scan"), col("n_rows")).otherwise(0L)).as("rows_scanned"))

  /** Small-file audit of a written parquet directory: one row per file
    * with row count plus the min/max box over `statsCols` — the
    * file-skipping effectiveness report (a predicate on column c touches
    * exactly the files whose [c_min, c_max] straddle it). Runs as a
    * regular distributed scan grouped by `input_file_name`; at lake
    * scale run it on a partition subtree, not the whole table. */
  def fileLayoutAudit(spark: SparkSession, path: String,
      statsCols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        statsCols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"))): _*)
  }
}
