package graft.core

import org.apache.spark.sql.types._

/** Schemas for the weather pipeline.
  *
  * The reference never declares its input schema — it duck-types into the
  * OpenWeatherMap JSON document (field accesses at
  * /root/reference/airflow/dags/weather_etl.py:119–131). We declare the strict
  * variant explicitly (only the fields the reference reads, FIXTURES.md §1) and
  * keep the landed-table schema as DDL-equivalent `StructType`
  * (weather_etl.py:67–77, minus the sink-side AUTO_INCREMENT surrogate `id`).
  */
object WeatherSchema {

  /** Raw API document — strict variant of weather_etl.py:119–131's accesses. */
  val raw: StructType = StructType(Seq(
    StructField("name", StringType),           // weather_etl.py:123
    StructField("dt", LongType),               // unix epoch secs (weather_etl.py:119)
    StructField("timezone", IntegerType),      // UTC offset secs (weather_etl.py:120)
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),         // weather_etl.py:124
      StructField("humidity", IntegerType),    // weather_etl.py:126
      StructField("pressure", IntegerType)))), // weather_etl.py:127
    StructField("weather", ArrayType(StructType(Seq(
      StructField("description", StringType))))), // weather[0].description (weather_etl.py:125)
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType))))      // weather_etl.py:128
  ))

  /** Landed `weather` table (weather_etl.py:67–77). Timestamps are kept as
    * `TimestampType` internally; the reference's lossy VARCHAR formatting
    * (weather_etl.py:129–130) is applied only at the sink edge. */
  val landed: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("temperature", DoubleType),
    StructField("weather", StringType),
    StructField("humidity", IntegerType),
    StructField("pressure", IntegerType),
    StructField("wind_speed", DoubleType),
    StructField("lt", TimestampType),
    StructField("utc", TimestampType)
  ))

  /** Logical dedup key of the landed table (weather_etl.py:158–161). */
  val key: Seq[String] = Seq("city", "utc")
}

/** Typed view of a landed observation (Dataset[WeatherObservation]). */
case class WeatherObservation(
    city: String,
    temperature: Double,
    weather: String,
    humidity: Int,
    pressure: Int,
    wind_speed: Double,
    lt: java.sql.Timestamp,
    utc: java.sql.Timestamp)
