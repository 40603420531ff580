package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's transform step (O4, O6–O10) as pure DataFrame → DataFrame
  * functions — all built-in, codegen'd `functions._`, no UDFs.
  *
  * Reference semantics being preserved
  * (/root/reference/airflow/dags/weather_etl.py:113–135):
  *  - `utc  = datetime.fromtimestamp(dt, tz=utc)`            (:119)
  *  - `lt   = utc + timedelta(seconds=timezone)`             (:120) — note this
  *    is *offset addition*, NOT timezone conversion; no DST logic.
  *  - projection + renames: name→city, main.temp→temperature,
  *    weather[0].description→weather, wind.speed→wind_speed  (:122–128)
  *  - both timestamps stringified '%Y-%m-%d %H:%M:%S'        (:129–130) — kept
  *    as TimestampType internally, formatted only by [[formatForSink]].
  */
object WeatherTransform {

  /** O4: decode a column of raw JSON strings into the strict schema. */
  def decode(df: DataFrame, jsonCol: String = "value"): DataFrame =
    df.select(from_json(col(jsonCol), WeatherSchema.raw).as("doc"))
      .select("doc.*")

  /** `weather[0].description` (weather_etl.py:125). Strict mode reproduces the
    * reference's hard failure on a missing element (it would KeyError);
    * permissive mode yields NULL. SURVEY.md §7 "schema drift". */
  private def description(strict: Boolean): Column = {
    // try_element_at: Spark 4 runs ANSI mode by default, where plain
    // element_at throws on out-of-bounds even in a non-taken `when` branch
    // during constant folding.
    val first = try_element_at(col("weather"), lit(1)).getField("description")
    if (strict)
      when(size(col("weather")) >= 1, first)
        .otherwise(raise_error(lit("weather[0] missing: empty weather array")))
    else first
  }

  /** O6–O9: flatten the decoded document into the landed schema
    * (TimestampType for lt/utc). */
  def flatten(decoded: DataFrame, strict: Boolean = true): DataFrame = {
    val utcTs = timestamp_seconds(col("dt"))                   // O8 (:119)
    decoded.select(
      col("name").as("city"),                                  // :123
      col("main.temp").as("temperature"),                      // :124
      description(strict).as("weather"),                       // O7 (:125)
      col("main.humidity").as("humidity"),                     // :126
      col("main.pressure").as("pressure"),                     // :127
      col("wind.speed").as("wind_speed"),                      // :128
      expr("timestampadd(SECOND, timezone, timestamp_seconds(dt))")
        .as("lt"),                                             // O9 (:120)
      utcTs.as("utc"))                                         // :119
  }

  /** O10: the sink-edge lossy formatting (weather_etl.py:129–130; VARCHAR
    * columns at :75–76). */
  def formatForSink(flat: DataFrame): DataFrame =
    flat.withColumn("lt", date_format(col("lt"), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("utc", date_format(col("utc"), "yyyy-MM-dd HH:mm:ss"))

  /** Full transform: raw JSON strings → landed-schema rows. */
  def apply(rawJson: DataFrame, jsonCol: String = "value",
            strict: Boolean = true): DataFrame =
    flatten(decode(rawJson, jsonCol), strict)

  /** Typed core (SURVEY.md §1.4): the landed rows as
    * `Dataset[WeatherObservation]` — compile-time field checks for callers
    * that fold/map observations rather than running SQL over them. */
  def typed(rawJson: DataFrame, jsonCol: String = "value",
            strict: Boolean = true):
      org.apache.spark.sql.Dataset[WeatherObservation] = {
    val spark = rawJson.sparkSession
    import spark.implicits._
    apply(rawJson, jsonCol, strict).as[WeatherObservation]
  }
}
