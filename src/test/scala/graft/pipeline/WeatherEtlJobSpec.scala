package graft.pipeline

import graft.SparkSpec
import graft.core.WeatherFixtures
import graft.sources.RestWeatherSource

class WeatherEtlJobSpec extends SparkSpec {

  private object FakeFetcher extends RestWeatherSource.Fetcher {
    var calls = 0
    def fetch(url: String): String = { calls += 1; WeatherFixtures.marseille }
  }

  private val cfg =
    RestWeatherSource.Config("Marseille", "fr", "metric", "test-key")

  test("end-to-end run is idempotent across scheduled replays (O15–O17)") {
    val path = tmpDir("etl-table")
    val r1 = WeatherEtlJob.run(spark, cfg, path, FakeFetcher)
    assert(r1.appended == 1)
    val r2 = WeatherEtlJob.run(spark, cfg, path, FakeFetcher) // replay, same doc
    assert(r2.appended == 0)
    assert(spark.read.parquet(path).count() == 1)
  }

  test("missing env config fails fast (weather_etl.py:98–99)") {
    val ex = intercept[IllegalArgumentException] {
      RestWeatherSource.configFromEnv(Map("CITY" -> "X"))
    }
    assert(ex.getMessage.contains("manquantes"))
  }

  test("HTTP error propagates as failure (weather_etl.py:104,108–110)") {
    object Failing extends RestWeatherSource.Fetcher {
      def fetch(url: String): String =
        throw new RuntimeException("HTTP 503")
    }
    intercept[RuntimeException] {
      WeatherEtlJob.run(spark, cfg, tmpDir("etl-fail"), Failing)
    }
  }

  test("load failure fails fast by default (an engine must not drop data silently)") {
    // tablePath is an existing plain FILE -> the parquet append cannot succeed
    val f = java.nio.file.Files.createTempFile("etl-notadir", ".bin")
    intercept[Exception] {
      WeatherEtlJob.run(spark, cfg, f.toString, FakeFetcher)
    }
  }

  test("failFastLoad=false mirrors the reference's swallow-and-log load edge (weather_etl.py:190–191)") {
    val f = java.nio.file.Files.createTempFile("etl-notadir2", ".bin")
    val r = WeatherEtlJob.run(spark, cfg, f.toString, FakeFetcher,
      failFastLoad = false)
    assert(r.fetched == 1 && r.appended == 0)
    assert(r.loadError.isDefined) // swallowed but surfaced, not lost
  }

  test("DAG twin exists and mirrors the reference's scheduling envelope (weather_etl.py:15–29,228)") {
    val dag = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("airflow/dags/weather_etl_spark.py")), "UTF-8")
    // the submit unit is this engine's main
    assert(dag.contains("graft.pipeline.WeatherEtlMain"))
    assert(dag.contains("SparkSubmitOperator"))
    // reference retry policy (weather_etl.py:20–21) and cadence (:29)
    assert(dag.contains("\"retries\": 1"))
    assert(dag.contains("retry_delay\": timedelta(minutes=5)"))
    assert(dag.contains("schedule_interval=timedelta(minutes=2)"))
    assert(dag.contains("catchup=False"))
    // linear chain, DDL first (:228)
    assert(dag.contains("ensure_catalog >> run_etl"))
    // both stages of the engine's main are exercised
    assert(dag.contains("\"--stage\", \"ddl\""))
  }

  test("loadMany fan-out fetches per city, distributed, through one transform") {
    object CityEcho extends RestWeatherSource.Fetcher {
      def fetch(url: String): String = {
        val city = url.split("q=")(1).split("&")(0)
        WeatherFixtures.marseille.replace("Marseille", city)
      }
    }
    val cities = (1 to 20).map(i => s"City$i")
    val raw = RestWeatherSource.loadMany(spark, cities, cfg, CityEcho,
      parallelism = 4)
    assert(raw.rdd.getNumPartitions == 4)
    val flat = graft.core.WeatherTransform(raw)
    val got = flat.select("city").collect().map(_.getString(0)).sorted.toSeq
    assert(got == cities.sorted)
  }

  test("config builds the reference's URL shape (weather_etl.py:103)") {
    val url = cfg.url
    assert(url.startsWith("https://api.openweathermap.org/data/2.5/weather?"))
    assert(url.contains("q=Marseille") && url.contains("lang=fr") &&
      url.contains("units=metric") && url.contains("appid=test-key"))
  }
}
