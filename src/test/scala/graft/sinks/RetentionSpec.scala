package graft.sinks

import graft.SparkSpec

/** Retention-policy auto-expire (`retention.keep.last`): landings GC
  * their own history once it exceeds the target by the amortization
  * step, the retained floor never dips below the streaming replay
  * horizon, and every refusal skips silently — maintenance runs late,
  * landings never fail. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def land(dir: String, i: Int): Int =
    ops.commit(Seq((i.toLong, s"r$i")).toDF("id", "k"), dir)

  test("crossing the keep+every excess triggers one expire pass") {
    val dir = tmpDir("ret-basic")
    ops.setTableProperty(dir, "retention.keep.last", "2")
    ops.setTableProperty(dir, "retention.expire.every", "4")
    (1 to 5).foreach(land(dir, _))
    assert(ops.versions(dir) == (1 to 5), "no pass below the excess step")
    land(dir, 6)
    assert(ops.versions(dir) == Seq(5, 6),
      "the crossing landing pays the pass and keeps exactly keep.last")
    // the table keeps landing and re-triggers at the next excess
    (7 to 9).foreach(land(dir, _))
    assert(ops.versions(dir) == (5 to 9))
    land(dir, 10)
    assert(ops.versions(dir) == Seq(9, 10))
  }

  test("a tag pin skips the pass silently; deleting it resumes retention") {
    val dir = tmpDir("ret-tag")
    ops.setTableProperty(dir, "retention.keep.last", "2")
    ops.setTableProperty(dir, "retention.expire.every", "4")
    land(dir, 1)
    ops.tag(dir, "audit", 1)
    (2 to 7).foreach(land(dir, _))
    assert(ops.versions(dir) == (1 to 7),
      "a pinned version must make auto-expire a silent no-op, not a failure")
    ops.deleteTag(dir, "audit")
    land(dir, 8)
    assert(ops.versions(dir) == Seq(7, 8))
  }

  test("the retained floor respects the txn replay horizon") {
    val dir = tmpDir("ret-txn")
    ops.setTableProperty(dir, "retention.keep.last", "1")
    ops.setTableProperty(dir, "retention.expire.every", "2")
    // default horizon 2 > keep 1 → floor 2: trigger at size ≥ 4
    (1 to 3).foreach(i => ops.commitOnce(
      Seq((i.toLong, s"r$i")).toDF("id", "k"), dir, s"q:$i"))
    assert(ops.versions(dir) == (1 to 3))
    ops.commitOnce(Seq((4L, "r4")).toDF("id", "k"), dir, "q:4")
    assert(ops.versions(dir) == Seq(3, 4),
      "floor = max(keep, horizon) = 2, never the bare keep.last=1")
    // a replay within the horizon still short-circuits exactly-once
    val v = ops.commitOnce(Seq((4L, "dup")).toDF("id", "k"), dir, "q:4")
    assert(v == 4 && ops.versions(dir) == Seq(3, 4),
      "redelivered txn inside the retained horizon must no-op")
  }
}
