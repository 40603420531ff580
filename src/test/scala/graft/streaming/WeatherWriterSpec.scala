package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.{WeatherFixtures, WeatherTransform}

/** The deployment path end-to-end: streaming dedup → parquet sink with
  * checkpoint (WeatherStream.writer) — the exact wiring the 2-minute
  * production trigger runs, driven synchronously here.
  */
class WeatherWriterSpec extends SparkSpec {
  import spark.implicits._

  test("parquet writer lands deduped rows under a checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmpDir("ws-table")
    val ckpt = tmpDir("ws-ckpt")
    val input = MemoryStream[String]
    val out = WeatherStream.transformed(input.toDF(), "value", Some("1 hour"))
    val q = WeatherStream.writer(out, table, ckpt,
      triggerInterval = "50 milliseconds").start()
    try {
      input.addData(WeatherFixtures.all)
      q.processAllAvailable()
      input.addData(WeatherFixtures.all) // replay
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(table)
    assert(landed.count() == 3) // duplicates suppressed at the sink
    assert(landed.schema.fieldNames.contains("utc"))
    assert(new java.io.File(ckpt).listFiles().nonEmpty) // checkpoint written
  }

  test("typed Dataset core carries the same rows") {
    val ds = WeatherTransform.typed(WeatherFixtures.all.toDF("value"))
    val obs = ds.collect().sortBy(_.utc.getTime)
    assert(obs.length == 3)
    assert(obs.head.city == "Marseille" && obs.head.temperature == 27.3)
  }
}
