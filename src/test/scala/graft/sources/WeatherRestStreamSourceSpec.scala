package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.{WeatherFixtures, WeatherTransform}

class WeatherRestStreamSourceSpec extends SparkSpec {

  /** Round-robins the fixture docs, counting calls. */
  private class RoundRobinFetcher extends RestWeatherSource.Fetcher {
    val calls = new AtomicInteger(0)
    def fetch(url: String): String = {
      val i = calls.getAndIncrement()
      WeatherFixtures.all(i % WeatherFixtures.all.size)
    }
  }

  test("weather-rest: one fetch per trigger through the full transform") {
    val fetcher = new RoundRobinFetcher
    WeatherRestStreamSource.fetchers.put("rr", fetcher)
    val raw = spark.readStream.format("weather-rest")
      .option("fetcher", "rr").load()
    assert(raw.isStreaming)
    val flat = WeatherTransform(raw) // same plan as the batch path
    val q = flat.writeStream.format("memory").queryName("wrest")
      .outputMode("append").trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      // wait until at least 3 fetches have landed
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("wrest").count() < 3 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally q.stop()
    val landed = spark.table("wrest")
    assert(landed.count() >= 3)
    assert(fetcher.calls.get() >= 3)
    // the flattened schema came through the streaming plan
    assert(landed.columns.toSeq ==
      Seq("city", "temperature", "weather", "humidity", "pressure",
        "wind_speed", "lt", "utc"))
    val cities = landed.select("city").distinct().collect().map(_.getString(0))
    assert(cities.toSet.subsetOf(Set("Marseille", "Montreal")))
  }

  test("weather-rest: restart from checkpoint keeps fetching (offsets never regress)") {
    val fetcher = new RoundRobinFetcher
    WeatherRestStreamSource.fetchers.put("rr2", fetcher)
    val ckpt = tmpDir("wrest-ckpt")
    val out = tmpDir("wrest-out")
    def runOnce(minNewFiles: Int): Unit = {
      val raw = spark.readStream.format("weather-rest")
        .option("fetcher", "rr2").load()
      val q = raw.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      try {
        val deadline = System.currentTimeMillis() + 30000
        def rows() = try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
        while (rows() < minNewFiles && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
      } finally q.stop()
    }
    runOnce(3)
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst >= 3)
    // restart: a fresh source instance restores offsets from the checkpoint;
    // pre-fix this planned negative ranges and emitted nothing forever
    runOnce(afterFirst.toInt + 2)
    val afterSecond = spark.read.parquet(out).count()
    assert(afterSecond > afterFirst,
      s"no rows after restart: $afterFirst -> $afterSecond")
  }

  test("weather-rest: admission honors ReadLimit (engine cap vs configured rate)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val s = new WeatherRestMicroBatchStream(Map("maxFetchesPerTrigger" -> "3"))
    def end(start: Long, limit: ReadLimit): Long =
      s.latestOffset(FetchCountOffset(start), limit)
        .asInstanceOf[FetchCountOffset].n
    // the source advertises its configured rate as its default limit
    assert(s.getDefaultReadLimit == ReadLimit.maxRows(3))
    // no engine constraint -> the configured per-trigger rate
    assert(end(0, ReadLimit.allAvailable()) == 3)
    // tighter engine maxRows wins
    assert(end(3, ReadLimit.maxRows(2)) == 5)
    // looser engine maxRows does NOT raise the configured rate
    assert(end(5, ReadLimit.maxRows(100)) == 8)
    // composite: tightest member applies
    assert(end(8, ReadLimit.compositeLimit(
      Array(ReadLimit.allAvailable(), ReadLimit.maxRows(1)))) == 9)
    // maxRows(0): admit nothing, offset stands still
    assert(end(9, ReadLimit.maxRows(0)) == 9)
    // monitoring poll reports without advancing
    assert(s.reportLatestOffset().asInstanceOf[FetchCountOffset].n == 9)
    assert(s.reportLatestOffset().asInstanceOf[FetchCountOffset].n == 9)
  }

  test("weather-rest: maxFetchesPerTrigger batches that many fetches per trigger") {
    val fetcher = new RoundRobinFetcher
    WeatherRestStreamSource.fetchers.put("rr4", fetcher)
    val raw = spark.readStream.format("weather-rest")
      .option("fetcher", "rr4").option("maxFetchesPerTrigger", "4").load()
    val q = raw.writeStream.format("memory").queryName("wrest_rate")
      .outputMode("append").trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("wrest_rate").count() < 8 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally q.stop()
    assert(spark.table("wrest_rate").count() >= 8)
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batches.nonEmpty && batches.forall(_ == 4),
      s"per-trigger batch sizes: ${batches.mkString(",")}")
  }

  test("weather-rest: Trigger.AvailableNow drains one admission batch and terminates") {
    val fetcher = new RoundRobinFetcher
    WeatherRestStreamSource.fetchers.put("rr-an", fetcher)
    val raw = spark.readStream.format("weather-rest")
      .option("fetcher", "rr-an").option("maxFetchesPerTrigger", "3").load()
    val q = raw.writeStream.format("memory").queryName("wrest_an")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    // the query must END BY ITSELF — the whole point of the drain target
    assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
    assert(spark.table("wrest_an").count() == 3)
    assert(fetcher.calls.get() == 3)
  }

  test("weather-rest: restarted AvailableNow run drains a fresh batch past the restored offset") {
    val fetcher = new RoundRobinFetcher
    WeatherRestStreamSource.fetchers.put("rr-an2", fetcher)
    val ckpt = tmpDir("wrest-an-ckpt")
    val out = tmpDir("wrest-an-out")
    def runOnce(): Unit = {
      val raw = spark.readStream.format("weather-rest")
        .option("fetcher", "rr-an2").option("maxFetchesPerTrigger", "3").load()
      val q = raw.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 3)
    // second invocation restores offset 3 from the checkpoint; the drain
    // target must be restored+3, not a stale pre-restore snapshot (which
    // would admit nothing, forever)
    runOnce()
    assert(spark.read.parquet(out).count() == 6)
    assert(fetcher.calls.get() == 6)
  }

  test("weather-rest: missing url fails fast like the reference (O17)") {
    val raw = spark.readStream.format("weather-rest").load()
    val q = raw.writeStream.format("memory").queryName("wrest_fail")
      .outputMode("append").start()
    val ex = intercept[Exception] {
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("manquantes")))
  }
}
