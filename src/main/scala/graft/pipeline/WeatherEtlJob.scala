package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{WeatherDedup, WeatherDdl, WeatherTransform}
import graft.sources.RestWeatherSource

/** O15–O17 — the reference's five-task DAG
  * (/root/reference/airflow/dags/weather_etl.py:197–228) collapsed into one
  * lazy Spark plan with a single action at the sink.
  *
  * Reference task → here:
  *  - create_database_and_user + create_table (:35–87) → [[WeatherDdl]]
  *    (catalog ops; re-run idempotently each run, as the reference does)
  *  - extract (:90–110)   → [[RestWeatherSource.load]]
  *  - transform (:113–135) → [[WeatherTransform.apply]] (XCom hops (:107,135)
  *    become nothing — lazy plan composition, SURVEY.md O5)
  *  - load (:138–194)     → [[WeatherDedup.idempotentAppend]]
  *
  * Error policy preserved from the reference's asymmetry: extract fails fast
  * (:98–99, :108–110 — exceptions propagate) in EVERY mode, while the
  * DDL and load edges are swallow-and-log in the reference (:50–51, :83–84
  * for DDL; :190–191 for load — `except Error as e: logging.error(...)`).
  * DDL failures are always logged-and-continued here (they're advisory
  * catalog ops); the load edge defaults to fail-fast — an engine should not
  * silently drop data — with `failFastLoad = false` giving the reference's
  * literal swallow behavior, surfaced in [[RunResult.loadError]]. Retry
  * (O17, :20–21) belongs to the external scheduler (Airflow `spark-submit`
  * per BASELINE.json), and is SAFE here precisely because the load is
  * idempotent — the reference's real design insight (SURVEY.md §4).
  */
object WeatherEtlJob {

  final case class RunResult(fetched: Long, appended: Long,
                             loadError: Option[String] = None)

  /** One scheduled run: fetch → transform → idempotent append. */
  def run(spark: SparkSession, cfg: RestWeatherSource.Config,
          tablePath: String,
          fetcher: RestWeatherSource.Fetcher = new RestWeatherSource.HttpFetcher(),
          strict: Boolean = true, failFastLoad: Boolean = true): RunResult = {
    try WeatherDdl.ensureTable(spark, Some(tablePath))
    catch { case e: Exception =>  // weather_etl.py:50–51, :83–84
      System.err.println(s"[weather-etl] DDL failed (continuing): ${e.getMessage}")
    }
    val raw = RestWeatherSource.load(spark, cfg, fetcher)   // throws on HTTP/env error
    val flat = WeatherTransform(raw, strict = strict)
    try {
      val appended = WeatherDedup.idempotentAppend(spark, flat, tablePath)
      RunResult(fetched = 1, appended = appended)
    } catch {
      case e: Exception if !failFastLoad =>  // weather_etl.py:190–191
        System.err.println(s"[weather-etl] load failed (continuing): ${e.getMessage}")
        RunResult(fetched = 1, appended = 0, loadError = Some(e.getMessage))
    }
  }

  /** Batch variant over many raw documents (the engine generalization: same
    * plan, arbitrarily many docs — this is what scales). */
  def runBatch(spark: SparkSession, rawJson: DataFrame, tablePath: String,
               strict: Boolean = true): Long =
    WeatherDedup.idempotentAppend(
      spark, WeatherTransform(rawJson, strict = strict), tablePath)
}
