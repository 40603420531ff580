package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The file-arrival ingestion path: `readStream` over a growing parquet
  * directory — how the landed table is consumed incrementally by downstream
  * jobs at scale (each micro-batch sees only newly arrived files).
  */
class FileStreamSpec extends SparkSpec {

  test("parquet file stream replays the events table incrementally") {
    val dir = tmpDir("events-stream-in")
    val ev = Tables.events(spark, sf)
    val schema = ev.schema
    // first drop of files
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(dir)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4").parquet(dir)
    assert(stream.isStreaming)
    val agg = stream.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("ev_files")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val half = spark.table("ev_files").agg(sum(col("n"))).collect()
        .head.getLong(0)
      // second drop arrives; stream picks up only the new files
      ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val full = spark.table("ev_files").agg(sum(col("n"))).collect()
        .head.getLong(0)
      assert(half < full)
      assert(full == ev.count())
    } finally q.stop()
  }
}
