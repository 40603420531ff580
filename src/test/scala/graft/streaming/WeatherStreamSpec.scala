package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.WeatherFixtures

class WeatherStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runToMemory(name: String, watermark: Option[String],
                          batches: Seq[Seq[String]]): Long = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = WeatherStream.transformed(input.toDF(), "value", watermark)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).count()
  }

  test("streaming dedup (faithful, unbounded): replayed docs land once") {
    val n = runToMemory("ws_faithful", None,
      Seq(WeatherFixtures.all, WeatherFixtures.all))
    assert(n == 3)
  }

  test("streaming dedup (bounded, watermark): in-horizon dups suppressed") {
    val n = runToMemory("ws_bounded", Some("1 hour"),
      Seq(Seq(WeatherFixtures.marseille),
          Seq(WeatherFixtures.marseille, WeatherFixtures.montreal)))
    assert(n == 2)
  }
}
