package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.core.WeatherFixtures
import graft.sources.RestWeatherSource

/** spark-submit entry point for one scheduled pipeline run — the unit
  * Airflow's SparkSubmitOperator triggers every 2 minutes (BASELINE.json
  * "spark_approach": the reference's schedule_interval at weather_etl.py:29
  * moves to the orchestrator; the run itself is this job).
  *
  *   spark-submit --class graft.pipeline.WeatherEtlMain <jar> \
  *     --table /data/weather [--fixture] [--stage ddl|run]
  *
  * Env config (CITY/LANG/UNITS/API_KEY) and fail-fast semantics are the
  * reference's (weather_etl.py:93–99). `--fixture` swaps the HTTP transport
  * for the canonical fixture document — the offline smoke path.
  * `--stage ddl` runs only the idempotent catalog bootstrap (the DAG twin's
  * first task, mirroring create_database_and_user/create_table); the
  * default stage runs the full fetch → transform → load pipeline.
  */
object WeatherEtlMain {

  def main(args: Array[String]): Unit = {
    val table = argValue(args, "--table").getOrElse("/tmp/graft-weather-table")
    val fixture = args.contains("--fixture")
    val stage = argValue(args, "--stage").getOrElse("run")
    val spark = SparkSession.builder()
      .appName("weather-etl")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try stage match {
      case "ddl" =>
        // Same swallow-and-log policy as the in-run DDL edge
        // (weather_etl.py:50–51): a transient catalog failure must not gate
        // the ETL task behind it — the run stage re-ensures idempotently.
        try {
          graft.core.WeatherDdl.ensureTable(spark, Some(table))
          println(s"[weather-etl] ddl ensured table=$table")
        } catch { case e: Exception =>
          System.err.println(s"[weather-etl] DDL failed (continuing): ${e.getMessage}")
        }
      case "run" =>
        val result = run(spark, table, fixture)
        println(s"[weather-etl] fetched=${result.fetched} appended=${result.appended}")
      case other =>
        throw new IllegalArgumentException(s"unknown --stage: $other")
    } finally spark.stop()
  }

  def run(spark: SparkSession, table: String,
          fixture: Boolean): WeatherEtlJob.RunResult = {
    val cfg =
      if (fixture)
        RestWeatherSource.Config("Marseille", "fr", "metric", "offline")
      else RestWeatherSource.configFromEnv()
    val fetcher: RestWeatherSource.Fetcher =
      if (fixture) new RestWeatherSource.Fetcher {
        def fetch(url: String): String = WeatherFixtures.marseille
      } else new RestWeatherSource.HttpFetcher()
    WeatherEtlJob.run(spark, cfg, table, fetcher)
  }

  private def argValue(args: Array[String], key: String): Option[String] =
    args.sliding(2).collectFirst { case Array(`key`, v) => v }
}
