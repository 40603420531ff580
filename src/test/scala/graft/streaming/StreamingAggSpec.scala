package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Events
import graft.sources.Tables

/** Streaming twins of the batch event analytics: tumbling-window aggregation
  * with watermark, and stateful sessionization — both checked against the
  * batch computation on identical data.
  */
class StreamingAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val eventRows: Seq[(Long, Timestamp, Long, String, Double)] =
    Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq.sortBy(_._2.getTime)

  test("tumbling 1h window with watermark matches batch hourly rollup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val agg = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
    val q = agg.writeStream.format("memory").queryName("hourly_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = eventRows.splitAt(eventRows.size / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // advance the watermark far past the data so every window finalizes
      val last = eventRows.last
      input.addData((999999L, Timestamp.valueOf("2030-01-01 00:00:00"),
        last._3, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("hourly_stream")
      .filter($"event_type" =!= "sentinel")
      .select($"window.start".as("hour"), $"event_type", $"n", $"sum_value")
    val batch = Events.qHourly(spark, sf)
    val s = streamed.orderBy("hour", "event_type").collect().map(_.toSeq)
    val b = batch.orderBy("hour", "event_type").collect().map(_.toSeq)
    assert(s.length == b.length, s"${s.length} vs ${b.length}")
    s.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
  }

  test("stateful sessionization across micro-batches matches batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventSessionizer.Event]
    val q = EventSessionizer.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("update").start()
    try {
      // three batches, ordered by ts so state transitions mirror the fold
      val evs = eventRows.map(e => EventSessionizer.Event(e._3, e._2, e._1))
      evs.grouped((evs.size + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()

    // final state per user: counts are monotone across updates, so max =
    // latest (last() over an unordered group would be nondeterministic)
    val streamed = spark.table("sessions_stream")
      .groupBy($"user_id")
      .agg(max($"n_sessions").as("n_sessions"), max($"n_events").as("n_events"))
    val batch = Events.qSessions(spark, sf)
    val s = streamed.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s.sameElements(b), s"first diff: ${s.zip(b).find(p => p._1 != p._2)}")
  }
}
