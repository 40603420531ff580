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

  test("conversion windows: late conversions fall out of the funnel") {
    // u1 converts fast; u5 clicks 100s after signup — outside a 50s window
    val ev = Seq(
      (1L, "signup", ts(10)), (1L, "click", ts(20)),
      (5L, "signup", ts(10)), (5L, "click", ts(110)))
      .toDF("user_id", "event_type", "ts")
    val open = Funnel.report(ev, "user_id", "event_type", "ts",
      Seq("signup", "click")).as[(Int, String, Long)].collect()
      .sortBy(_._1).toSeq
    assert(open == Seq((1, "signup", 2L), (2, "click", 2L)))
    val windowed = Funnel.report(ev, "user_id", "event_type", "ts",
      Seq("signup", "click"), withinSeconds = Some(50L))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(windowed == Seq((1, "signup", 2L), (2, "click", 1L)))
    // the boundary is inclusive: exactly `within` seconds still converts
    val boundary = Funnel.report(ev, "user_id", "event_type", "ts",
      Seq("signup", "click"), withinSeconds = Some(100L))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(boundary == Seq((1, "signup", 2L), (2, "click", 2L)))
  }

  test("report executes each stage exactly once (no prefix recompute)") {
    // Count actual reads of the event log with an accumulator-ticking
    // filter on the scan path (parquet-backed input — local Seq plans
    // constant-fold and lie). Each of the k stage executions passes every
    // event row through the tick exactly once, so a correct report ticks
    // k * |events| times. The O(k^2) failure shape — counting lazy frames
    // so stage i re-executes stages 1..i — would tick
    // k*(k+1)/2 * |events| (6000 vs 3000 here): caching the survivor
    // frames is what keeps the prefix chain from re-running.
    val ev = graft.sources.Tables.events(spark, sf)
    val total = ev.count()
    val stages3 = Seq("signup", "click", "purchase")
    val acc = spark.sparkContext.longAccumulator("funnel-event-reads")
    val tick = udf { () => acc.add(1); true }
    val ticked = ev.filter(tick())
    val r = Funnel.report(ticked, "user_id", "event_type", "ts", stages3)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(r.map(_._2) == stages3 && r.head._3 > 0)
    assert(acc.value == stages3.size * total,
      s"event log read ${acc.value} rows; one pass per stage is " +
        s"${stages3.size * total} — prefix recompute detected")
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
