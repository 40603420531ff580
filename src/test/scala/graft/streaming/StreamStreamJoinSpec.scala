package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Stream-stream interval join vs its batch twin on identical data. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows: Seq[(Long, Timestamp, Long, String)] =
    Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .toSeq.sortBy(_._2.getTime)

  private def purchases(df: org.apache.spark.sql.DataFrame) =
    df.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("p_event"),
        $"ts".as("p_ts"))

  private def signups(df: org.apache.spark.sql.DataFrame) =
    df.filter($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"event_id".as("s_event"),
        $"ts".as("s_ts"))

  test("watermarked stream-stream interval join matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val joined = StreamStreamJoin.attribute(purchases(events), signups(events))
      .select($"p_event", $"s_event")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.size / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val batchDf = rows.toDF("event_id", "ts", "user_id", "event_type")
    val expected = StreamStreamJoin.attribute(purchases(batchDf), signups(batchDf))
      .select($"p_event", $"s_event").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "batch twin produced no pairs — bad fixture")
    assert(got == expected,
      s"stream ${got.size} pairs vs batch ${expected.size}")
  }
}
