package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private def before = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "status", "price")

  private def after = Seq(
    (1L, "a", 10.0),   // unchanged
    (2L, "b", 99.0),   // changed (price)
    (4L, "D", 40.0),   // changed (status)
    (5L, "e", 50.0))   // added; 3 removed
    .toDF("k", "status", "price")

  test("verdicts classify every key from either side exactly once") {
    val d = TableDiff.diff(before, after, "k")
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("column subset restricts what counts as a change") {
    // comparing only price: the status-only change on key 4 disappears
    val d = TableDiff.diff(before, after, "k", cols = Seq("price"))
      .as[(Long, String)].collect().toMap
    assert(d(4L) == "unchanged" && d(2L) == "changed")
  }

  test("summary counts match the verdict table") {
    val s = TableDiff.summary(before, after, "k")
      .as[(String, Long)].collect().toMap
    assert(s == Map("unchanged" -> 1L, "changed" -> 2L, "removed" -> 1L,
      "added" -> 1L))
  }

  test("null position matters: (null, x) vs (x, null) is a change") {
    // Spark hash expressions skip null inputs — without explicit nullness
    // markers these two rows hash identically and misreport 'unchanged'
    val b = Seq((1L, Option.empty[String], Option("x")),
      (2L, Option("y"), Option.empty[String]))
      .toDF("k", "c1", "c2")
    val a = Seq((1L, Option("x"), Option.empty[String]),
      (2L, Option("y"), Option.empty[String]))
      .toDF("k", "c1", "c2")
    val d = TableDiff.diff(b, a, "k").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("identical snapshots diff to all-unchanged") {
    val s = TableDiff.summary(before, before, "k")
      .as[(String, Long)].collect().toMap
    assert(s == Map("unchanged" -> 4L))
  }

  test("composes with VersionedTable: diff two time-travel snapshots") {
    import graft.sinks.VersionedTable
    val dir = tmpDir("diff-vt")
    val v1 = VersionedTable.commit(before, dir)
    val v2 = VersionedTable.commit(after, dir, append = false)
    val s = TableDiff.summary(
        VersionedTable.read(spark, dir, Some(v1)),
        VersionedTable.read(spark, dir, Some(v2)), "k")
      .as[(String, Long)].collect().toMap
    assert(s == Map("unchanged" -> 1L, "changed" -> 2L, "removed" -> 1L,
      "added" -> 1L))
  }

  test("one full-outer join over (key, hash) — no window, no second scan pair") {
    // parquet-backed inputs: local Seq relations get their projections
    // constant-folded into LocalTableScan, hiding the hash from the plan
    val o = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val plan = TableDiff.diff(o, o.filter(col("o_orderkey") % 2 === 0),
        "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.toLowerCase.contains("xxhash64"), plan)
  }
}
