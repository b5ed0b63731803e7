package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset snapshot auditing — the pipeline-versioning face of the engine:
  * a training corpus is rebuilt (new crawl, changed filters, re-mixed
  * sources) and the operator answers "what actually changed?" row-exactly,
  * not by eyeballing counts. The unit of comparison is a KEYED row with a
  * deterministic content hash ([[graft.functions.TextHash.polyHash]] over
  * a canonical field concatenation), so the diff is engine-reproducible
  * and cheap to recompute incrementally.
  *
  * Scale shape: one full-outer sort-merge join on the key — both sides
  * shuffle once on the same partitioning, no broadcast assumption (both
  * snapshots are corpus-sized). Hash computation is map-side, so the
  * shuffled payload is (key, 8-byte hash), never the content columns —
  * at 100 TB the diff moves ~1% of the data it audits. */
object AuditOps {

  /** Canonical content rendering of `cols` in order: the chr(1) unit-
    * separator joined string form, so adjacent fields cannot collide by
    * concatenation. Callers pick STRING-RENDERABLE columns (strings,
    * integers) — float rendering is not cross-engine canonical and has
    * no business in an identity hash. */
  def contentHash(cols: Seq[Column]): Column =
    concat_ws("\u0001", cols.map(_.cast("string")): _*)

  /** Row-exact diff of two keyed snapshots: for every key present in
    * either side, `(key, status, before_hash, after_hash)` with status ∈
    * added | removed | changed | unchanged. `content` maps a snapshot to
    * its (key, content-columns) projection — both sides go through the
    * SAME projection, so a schema drift between snapshots is a compile
    * error here, not a silent miscompare. */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: Column,
      content: Seq[Column], keyName: String = "key"): DataFrame = {
    val hashes = graft.functions.HashExpressions
    hashes.register(before.sparkSession)
    def side(df: DataFrame, n: String) = df.select(key.as(keyName),
      hashes.polyHash(contentHash(content)).as(s"${n}_hash"))
    side(before, "before").join(side(after, "after"), Seq(keyName), "full_outer")
      .select(col(keyName),
        when(col("before_hash").isNull, lit("added"))
          .when(col("after_hash").isNull, lit("removed"))
          .when(col("before_hash") =!= col("after_hash"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("before_hash"), col("after_hash"))
  }

  /** Per-status row counts of a [[snapshotDiff]] — the one-line audit
    * summary (and the cheap gate a pipeline asserts on before promoting a
    * rebuilt corpus: e.g. `removed = 0` for an append-only source). */
  def snapshotDiffSummary(diff: DataFrame): DataFrame =
    diff.groupBy("status").agg(count(lit(1)).as("n"))
}
