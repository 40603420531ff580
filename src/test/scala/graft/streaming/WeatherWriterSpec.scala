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

  test("merge writer dedups against rows already in the table") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmpDir("wsm-table")
    val ckpt = tmpDir("wsm-ckpt")
    // table pre-loaded by the BATCH pipeline with one observation
    graft.core.WeatherDedup.idempotentAppend(spark,
      WeatherTransform(Seq(WeatherFixtures.marseille).toDF("value")), table)
    assert(spark.read.parquet(table).count() == 1)
    // stream delivers all three (incl. the already-landed one)
    val input = MemoryStream[String]
    val out = WeatherStream.transformed(input.toDF(), "value", None)
    val q = WeatherStream.writerWithMerge(out, table, ckpt,
      triggerInterval = "50 milliseconds").start()
    try {
      input.addData(WeatherFixtures.all)
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(table)
    assert(landed.count() == 3) // NOT 4: pre-existing row was recognized
    assert(landed.select("city", "utc").distinct().count() == 3)
  }

  test("typed Dataset core carries the same rows") {
    val ds = WeatherTransform.typed(WeatherFixtures.all.toDF("value"))
    val obs = ds.collect().sortBy(_.utc.getTime)
    assert(obs.length == 3)
    assert(obs.head.city == "Marseille" && obs.head.temperature == 27.3)
  }
}
