package graft

import org.apache.spark.sql.functions._
import graft.operators.AuditOps

/** Snapshot diff: every status arm exercised with planted edits, and the
  * canonicalization's collision resistance (field separator) proven. */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    val before = Seq(
      (1L, "alpha", "web"), (2L, "beta", "web"),
      (3L, "gamma", "book"), (4L, "delta", "web")).toDF("id", "text", "source")
    val after = Seq(
      (2L, "beta", "web"),           // unchanged
      (3L, "gamma EDITED", "book"),  // changed text
      (4L, "delta", "book"),         // changed source
      (5L, "epsilon", "web"))        // added
      .toDF("id", "text", "source")  // 1L removed
    val d = AuditOps.snapshotDiff(before, after, col("id"),
      Seq(col("text"), col("source")), keyName = "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "changed", 5L -> "added"))
  }

  test("content canonicalization separates fields (no concatenation collision)") {
    // ("ab", "c") vs ("a", "bc") concatenate identically without the
    // separator — the diff must see them as different content
    val before = Seq((1L, "ab", "c")).toDF("id", "text", "source")
    val after = Seq((1L, "a", "bc")).toDF("id", "text", "source")
    val d = AuditOps.snapshotDiff(before, after, col("id"),
      Seq(col("text"), col("source")), keyName = "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "changed"))
  }

  test("snapshotDiffSummary counts per status") {
    val before = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val after = Seq((2L, "b2"), (3L, "c")).toDF("id", "text")
    val s = AuditOps.snapshotDiffSummary(AuditOps.snapshotDiff(
      before, after, col("id"), Seq(col("text")), keyName = "id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("removed" -> 1L, "changed" -> 1L, "added" -> 1L))
  }
}
