package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  // u1 completes in order; u2 clicks BEFORE signup (order violation at
  // stage 2); u3 stops after click; u4 never signs up
  private def events = Seq(
    (1L, "signup", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
    (2L, "click", ts(5)), (2L, "signup", ts(10)), (2L, "purchase", ts(40)),
    (3L, "signup", ts(10)), (3L, "click", ts(15)),
    (4L, "click", ts(10)), (4L, "purchase", ts(20)))
    .toDF("user_id", "event_type", "ts")

  private val stages = Seq("signup", "click", "purchase")

  test("order matters: pre-signup clicks don't count") {
    val r = Funnel.report(events, "user_id", "event_type", "ts", stages)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    // stage 1: u1,u2,u3 signed up; stage 2: u1,u3 clicked after signup
    // (u2's only click predates signup); stage 3: u1 purchased after click
    assert(r == Seq((1, "signup", 3L), (2, "click", 2L),
      (3, "purchase", 1L)))
  }

  test("completions carries the per-stage timestamps of full converts") {
    val c = Funnel.completions(events, "user_id", "event_type", "ts", stages)
      .collect()
    assert(c.length == 1)
    val r = c.head
    assert(r.getLong(0) == 1L)
    assert(r.getTimestamp(1) == ts(10) && r.getTimestamp(2) == ts(20) &&
      r.getTimestamp(3) == ts(30))
  }

  test("repeat events use the EARLIEST qualifying occurrence per stage") {
    val ev = Seq(
      (7L, "signup", ts(10)), (7L, "click", ts(50)), (7L, "click", ts(20)))
      .toDF("user_id", "event_type", "ts")
    val c = Funnel.completions(ev, "user_id", "event_type", "ts",
      Seq("signup", "click")).collect().head
    assert(c.getTimestamp(2) == ts(20))
  }

  test("stage filters are pushed into the scan on parquet inputs") {
    val ev = graft.sources.Tables.events(spark, sf)
    val plan = Funnel.completions(ev, "user_id", "event_type", "ts",
        Seq("signup", "click"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(event_type,signup)"), plan)
  }
}
