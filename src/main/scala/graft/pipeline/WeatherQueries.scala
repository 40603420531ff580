package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{WeatherDedup, WeatherFixtures, WeatherTransform}

/** Fixture-driven driver queries for the weather core (the reference's own
  * semantics, O4–O13). These ignore `sfDir` — the reference's input is the
  * API document, not the synthetic tables — and their oracles are DuckDB
  * VALUES literals of the hand-computed expected rows (FIXTURES.md §2).
  */
object WeatherQueries {

  /** O4+O6–O10: raw JSON fixtures → flattened, sink-formatted rows. */
  def qTransform(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val raw = WeatherFixtures.all.toDF("value")
    WeatherTransform.formatForSink(WeatherTransform(raw))
      .orderBy("city", "utc")
  }

  /** O13: replaying the whole batch must leave the landed set unchanged —
    * the reference's core guarantee (weather_etl.py:186–187). */
  def qIdempotent(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val replayed = (WeatherFixtures.all ++ WeatherFixtures.all).toDF("value")
    WeatherTransform.formatForSink(
        WeatherDedup.dedupWithinBatch(WeatherTransform(replayed)))
      .orderBy("city", "utc")
  }

  private val expectedRows =
    """  ('Marseille', CAST(27.3 AS DOUBLE), 'ciel dégagé', 48, 1015, CAST(4.6 AS DOUBLE), '2024-08-12 12:00:00', '2024-08-12 10:00:00'),
      |  ('Marseille', CAST(27.5 AS DOUBLE), 'ciel dégagé', 47, 1015, CAST(4.8 AS DOUBLE), '2024-08-12 12:02:00', '2024-08-12 10:02:00'),
      |  ('Montreal', CAST(22.1 AS DOUBLE), 'légère pluie', 61, 1008, CAST(7.2 AS DOUBLE), '2024-08-12 06:00:00', '2024-08-12 10:00:00')""".stripMargin

  private def valuesSql: String =
    s"""SELECT * FROM (VALUES
       |$expectedRows
       |) AS t(city, temperature, weather, humidity, pressure, wind_speed, lt, utc)
       |ORDER BY city, utc""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_weather_transform" -> valuesSql,
    "q_weather_idempotent" -> valuesSql)
}
