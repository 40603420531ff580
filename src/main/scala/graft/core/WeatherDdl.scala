package graft.core

import org.apache.spark.sql.SparkSession

/** O1–O2 — the reference's bootstrap DDL
  * (/root/reference/airflow/dags/weather_etl.py:35–87), mapped onto the Spark
  * session catalog. Both are `IF NOT EXISTS` and re-run before every pipeline
  * run, exactly like the reference (idempotent catalog ops, no execution
  * plan). The reference's CREATE USER / GRANT / FLUSH PRIVILEGES (:46–48) is
  * RDBMS account administration with no catalog equivalent — it lives in the
  * JDBC sink's connection options instead (SURVEY.md §3.3).
  */
object WeatherDdl {

  val database = "meteo"   // weather_etl.py:45
  val table    = "weather" // weather_etl.py:67

  /** CREATE DATABASE IF NOT EXISTS meteo (weather_etl.py:45). */
  def ensureDatabase(spark: SparkSession): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")

  /** CREATE TABLE IF NOT EXISTS meteo.weather (weather_etl.py:65–79), columns
    * per the DDL at :68–77 minus the auto-increment surrogate `id` (:68) —
    * Spark has no auto-increment; nothing in the reference reads `id`. */
  def ensureTable(spark: SparkSession, location: Option[String] = None): Unit = {
    ensureDatabase(spark)
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $database.$table (
         |  city STRING,
         |  temperature DOUBLE,
         |  weather STRING,
         |  humidity INT,
         |  pressure INT,
         |  wind_speed DOUBLE,
         |  lt TIMESTAMP,
         |  utc TIMESTAMP
         |) USING parquet$loc""".stripMargin)
  }
}
