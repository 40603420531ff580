package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.core.WeatherTransform

/** O16 + O13 as Structured Streaming — the reference's 2-minute schedule
  * (/root/reference/airflow/dags/weather_etl.py:29) and its
  * insert-if-absent-by-(city,utc) (:156–187) become a micro-batch streaming
  * query with streaming dedup.
  *
  * Two dedup modes (SURVEY.md §2 "Streaming"):
  *  - FAITHFUL: `dropDuplicates(city, utc)` — suppresses duplicates whenever
  *    they arrive, like the reference's unbounded key check. State grows with
  *    distinct keys → fine at 720 rows/day, wrong at 100 TB.
  *  - BOUNDED (default here): `withWatermark(utc, …)` +
  *    `dropDuplicatesWithinWatermark` — state is bounded by the watermark
  *    horizon; this also FIXES the reference's check-then-insert race
  *    (no transaction spans :158–184; the streaming state store is atomic
  *    per micro-batch).
  */
object WeatherStream {

  /** Raw JSON stream → landed-schema stream with streaming dedup. */
  def transformed(rawStream: DataFrame, jsonCol: String = "value",
                  watermark: Option[String] = Some("1 hour"),
                  strict: Boolean = true): DataFrame = {
    val flat = WeatherTransform(rawStream, jsonCol, strict)
    watermark match {
      case Some(delay) =>
        flat.withWatermark("utc", delay)
          .dropDuplicatesWithinWatermark("city", "utc")
      case None =>
        flat.dropDuplicates("city", "utc")
    }
  }

  /** Writer wired like the reference's schedule: 2-minute processing-time
    * trigger (weather_etl.py:29), parquet append sink. Caller `.start()`s. */
  def writer(transformed: DataFrame, tablePath: String,
             checkpoint: String,
             triggerInterval: String = "2 minutes"): DataStreamWriter[Row] =
    transformed.writeStream
      .format("parquet")
      .option("path", tablePath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .outputMode("append")

  /** Strongest landing mode: each micro-batch goes through the SAME
    * anti-join idempotent append as the batch path (foreachBatch →
    * [[graft.core.WeatherDedup.idempotentAppend]]). Unlike the plain
    * parquet sink, this dedups against rows ALREADY IN the table — e.g. a
    * table pre-loaded by the batch pipeline, or a redelivery after the
    * stream's own dedup state was reset — which is exactly the reference's
    * check-then-insert contract (weather_etl.py:156–187), made atomic per
    * micro-batch. */
  def writerWithMerge(transformed: DataFrame, tablePath: String,
                      checkpoint: String,
                      triggerInterval: String = "2 minutes"): DataStreamWriter[Row] =
    transformed.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.core.WeatherDedup.idempotentAppend(
          batch.sparkSession, batch, tablePath)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .outputMode("append")
}
