package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Funnel
import graft.streaming.FunnelStream.FunnelEvent

/** Streaming funnel vs its batch twin on identical, event-time-ordered
  * data — the same parity discipline as StreamStreamJoinSpec. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("signup", "click", "purchase")

  private def runStream(batches: Seq[Seq[FunnelEvent]],
                        withinSeconds: Option[Long] = None)
      : Seq[(Long, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = FunnelStream.transitions(input.toDS(), stages, withinSeconds)
      .writeStream.format("memory")
      .queryName(s"funnel_${System.nanoTime()}").outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(q.name).select($"user_id", $"stage")
        .as[(Long, Int)].collect().toSeq
    } finally q.stop()
  }

  private def ts(s: Long) = new Timestamp(s * 1000)

  // the batch FunnelSpec fixture: u1 full convert, u2 order violation at
  // stage 2, u3 stops after click, u4 never signs up
  private val fixture = Seq(
    FunnelEvent(2L, "click", ts(5)),
    FunnelEvent(1L, "signup", ts(10)), FunnelEvent(2L, "signup", ts(10)),
    FunnelEvent(3L, "signup", ts(10)), FunnelEvent(4L, "click", ts(10)),
    FunnelEvent(3L, "click", ts(15)),
    FunnelEvent(1L, "click", ts(20)), FunnelEvent(4L, "purchase", ts(20)),
    FunnelEvent(1L, "purchase", ts(30)), FunnelEvent(2L, "purchase", ts(40)))

  test("transitions match the batch funnel's per-stage survivor sets") {
    val got = runStream(Seq(fixture))
    // batch truth: s1 = {1,2,3}, s2 = {1,3}, s3 = {1}
    val expect = Set((1L, 1), (2L, 1), (3L, 1), (1L, 2), (3L, 2), (1L, 3))
    assert(got.toSet == expect && got.size == expect.size)
  }

  test("per-stage counts match Funnel.report on the same data") {
    val got = runStream(Seq(fixture))
    val streamCounts = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val batch = Funnel.report(
        fixture.map(e => (e.user_id, e.event_type, e.ts))
          .toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", stages)
      .as[(Int, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(streamCounts == batch.filter(_._2 > 0))
  }

  test("state carries across micro-batches: conversion spans batches") {
    val got = runStream(Seq(
      Seq(FunnelEvent(7L, "signup", ts(10))),
      Seq(FunnelEvent(7L, "click", ts(20))),
      Seq(FunnelEvent(7L, "purchase", ts(30)))))
    assert(got.toSet == Set((7L, 1), (7L, 2), (7L, 3)))
  }

  test("a transition is emitted exactly once, never re-fired") {
    val got = runStream(Seq(
      Seq(FunnelEvent(7L, "signup", ts(10)), FunnelEvent(7L, "click", ts(20))),
      Seq(FunnelEvent(7L, "click", ts(25))), // repeat event: no new stage
      Seq(FunnelEvent(7L, "purchase", ts(30)))))
    assert(got.size == 3)
    assert(got.toSet == Set((7L, 1), (7L, 2), (7L, 3)))
  }

  test("conversion window drops late stage completions like the batch op") {
    val events = Seq(
      FunnelEvent(1L, "signup", ts(10)), FunnelEvent(1L, "click", ts(20)),
      FunnelEvent(5L, "signup", ts(10)), FunnelEvent(5L, "click", ts(110)))
    val open = runStream(Seq(events))
    assert(open.toSet ==
      Set((1L, 1), (1L, 2), (5L, 1), (5L, 2)))
    val windowed = runStream(Seq(events), withinSeconds = Some(50L))
    assert(windowed.toSet == Set((1L, 1), (1L, 2), (5L, 1)))
    // inclusive boundary, exactly like Funnel.report
    val boundary = runStream(Seq(events), withinSeconds = Some(100L))
    assert(boundary.toSet == Set((1L, 1), (1L, 2), (5L, 1), (5L, 2)))
  }
}
