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

  test("NULL fields do not collide with adjacent content (sentinel)") {
    // concat_ws skips NULL args, so without the chr(0) sentinel
    // (text='ab', source=NULL) renders identically to
    // (text='a', source='b') and a value hopping columns past a NULL
    // reads as unchanged — both must diff as 'changed'
    val before = Seq((1L, "ab", Option.empty[String]),
      (2L, "x", Option.empty[String])).toDF("id", "text", "source")
    val after = Seq((1L, "a", Option("b")),
      (2L, null.asInstanceOf[String], Option("x")))
      .toDF("id", "text", "source")
    val d = AuditOps.snapshotDiff(before, after, col("id"),
      Seq(col("text"), col("source")), keyName = "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "changed", 2L -> "changed"))
  }

  test("snapshotDeltaAudit classifies a delta against a persisted index") {
    val snapshot = Seq(
      (1L, "alpha", "web"), (2L, "beta", "web"),
      (3L, "gamma", "book")).toDF("id", "text", "source")
    val index = AuditOps.snapshotHashIndex(snapshot, col("id"),
      Seq(col("text"), col("source")), keyName = "id")
    val delta = Seq(
      (1L, "alpha", "web"),         // unchanged
      (2L, "beta EDITED", "web"),   // changed
      (9L, "epsilon", "web"))       // added; key 3 absent -> no verdict
      .toDF("id", "text", "source")
    val got = AuditOps.snapshotDeltaAudit(delta, index, col("id"),
      Seq(col("text"), col("source")), keyName = "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 9L -> "added"),
      s"delta-only keys, no 'removed' arm: $got")
  }

  test("delta audit agrees with the full diff on every delta key") {
    // the incremental contract: for keys the delta carries, index-then-
    // delta classification and the two-sided diff are the same function
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val delta = Seq((1L, "a"), (2L, "B2"), (9L, "z")).toDF("id", "text")
    val full = AuditOps.snapshotDiff(before, delta, col("id"),
      Seq(col("text")), keyName = "id")
      .where(col("status") =!= "removed")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val inc = AuditOps.snapshotDeltaAudit(delta,
      AuditOps.snapshotHashIndex(before, col("id"), Seq(col("text")),
        keyName = "id"),
      col("id"), Seq(col("text")), keyName = "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(inc == full, s"incremental $inc vs full $full")
  }

  test("snapshotDiffSummary counts per status") {
    val before = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val after = Seq((2L, "b2"), (3L, "c")).toDF("id", "text")
    val s = AuditOps.snapshotDiffSummary(AuditOps.snapshotDiff(
      before, after, col("id"), Seq(col("text")), keyName = "id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("removed" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("applyChangeSet: latest seq wins, delete beats upsert on a tie") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "text")
    val changes = Seq(
      (2L, "b-rev1", 1L, "upsert"),   // superseded by rev2
      (2L, "b-rev2", 2L, "upsert"),
      (3L, "c-zombie", 5L, "upsert"), // loses the seq-5 tie to the delete
      (3L, "c", 5L, "delete"),
      (4L, "d", 1L, "delete"),
      (9L, "z-new", 1L, "upsert"))    // fresh-key insert
      .toDF("id", "text", "seq", "op")
    val got = AuditOps.applyChangeSet(snap, changes, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got ==
      Map(1L -> "a", 2L -> "b-rev2", 9L -> "z-new"),
      s"merge semantics: $got")
  }

  test("applyChangeSet in seq-ordered increments equals one-shot apply") {
    // the incremental-materialization contract: applying change batches
    // in seq order, snapshot-by-snapshot, is the same function as one
    // MERGE of the full changeset — what a foreachBatch CDC consumer
    // relies on.
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val batch1 = Seq((2L, "b1", 1L, "upsert"), (3L, "c", 1L, "delete"),
      (7L, "g", 1L, "upsert")).toDF("id", "text", "seq", "op")
    val batch2 = Seq((2L, "b2", 2L, "upsert"), (7L, "g", 2L, "delete"),
      (3L, "c-back", 2L, "upsert")).toDF("id", "text", "seq", "op")
    val incremental = AuditOps.applyChangeSet(
      AuditOps.applyChangeSet(snap, batch1, "id"), batch2, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val oneShot = AuditOps.applyChangeSet(
      snap, batch1.unionByName(batch2), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(incremental == oneShot && incremental ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c-back"))
  }

  test("applyChangeSet: (key, seq, op) ties resolve by payload, deterministically") {
    // two upserts sharing (key, seq, op) with different payloads: without a
    // payload tiebreak the window's row_number picks whichever row the
    // shuffle happened to order first, and cdcApplySink's replay-convergence
    // claim (re-processing a batch overwrites its version with identical
    // content) silently breaks. The contentHash-asc tiebreak makes the
    // winner a pure function of the changeset's values.
    val snap = Seq((1L, "a")).toDF("id", "text")
    val changes = Seq((1L, "payload-B", 1L, "upsert"),
      (1L, "payload-A", 1L, "upsert")).toDF("id", "text", "seq", "op")
    val got = (1 to 5).map { i =>
      AuditOps.applyChangeSet(snap,
        changes.repartition(if (i % 2 == 0) 7 else 3), "id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(got.distinct.size == 1 && got.head == Map(1L -> "payload-A"),
      s"tie winner must be value-determined (contentHash asc): $got")
  }

  test("applyChangeSet never shuffles the snapshot side") {
    val docs = Tables.documents(spark, sf)
    val changes = docs.where(col("doc_id") % 11 === 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), lit(1L).as("seq"), lit("delete").as("op"))
    val plan = AuditOps.applyChangeSet(docs, changes, "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftanti"),
      s"the anti probe must broadcast the winners' keys:\n$plan")
  }
}
