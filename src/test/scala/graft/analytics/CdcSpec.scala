package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "status", "price")

  test("update, insert, delete, pass-through — all in one apply") {
    val changes = Seq(
      (1L, 10L, "U", "a2", 11.0),  // update existing
      (3L, 11L, "D", "c", 0.0),    // tombstone existing
      (9L, 12L, "I", "new", 99.0)) // insert unseen key
      .toDF("k", "seq", "op", "status", "price")
    val out = Cdc.applyChanges(snapshot, changes, "k", "seq", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a2", 11.0), (2L, "b", 20.0), (9L, "new", 99.0)))
  }

  test("last change wins regardless of delivery order (replayed log)") {
    val inOrder = Seq(
      (1L, 10L, "U", "x", 1.0), (1L, 20L, "U", "y", 2.0))
      .toDF("k", "seq", "op", "status", "price")
    val reversed = Seq(
      (1L, 20L, "U", "y", 2.0), (1L, 10L, "U", "x", 1.0))
      .toDF("k", "seq", "op", "status", "price")
    val a = Cdc.applyChanges(snapshot, inOrder, "k", "seq", "op")
      .orderBy("k").collect().toSeq
    val b = Cdc.applyChanges(snapshot, reversed, "k", "seq", "op")
      .orderBy("k").collect().toSeq
    assert(a == b)
    assert(a.find(_.getLong(0) == 1L).get.getString(1) == "y")
  }

  test("a delete superseded by a later insert resurrects the key") {
    val changes = Seq(
      (2L, 10L, "D", "b", 0.0), (2L, 20L, "I", "b2", 21.0))
      .toDF("k", "seq", "op", "status", "price")
    val out = Cdc.applyChanges(snapshot, changes, "k", "seq", "op")
    assert(out.filter($"k" === 2L).collect().head.getString(1) == "b2")
  }

  test("a delete of an unseen key is a no-op, not an error") {
    val changes = Seq((42L, 10L, "D", "", 0.0))
      .toDF("k", "seq", "op", "status", "price")
    val out = Cdc.applyChanges(snapshot, changes, "k", "seq", "op")
    assert(out.count() == 3)
  }

  test("the change dedup partial-aggregates map-side (bounded by batch)") {
    val changes = Seq((1L, 10L, "U", "x", 1.0))
      .toDF("k", "seq", "op", "status", "price")
    val plan = Cdc.applyChanges(snapshot, changes, "k", "seq", "op")
      .queryExecution.executedPlan.toString
    // max_by plans as a two-phase aggregate over the CHANGES; the snapshot
    // is only ever joined, never aggregated
    assert(plan.contains("max_by") || plan.contains("MaxBy"), plan)
  }
}
