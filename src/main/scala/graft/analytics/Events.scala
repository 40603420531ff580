package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-stream analytics over the `events` table — the batch mirror of the
  * reference's streaming story (2-minute micro-batch + key dedup,
  * weather_etl.py:29 + :156–187), extended with the time-bucket / JSON /
  * sessionization surface a landed event table needs.
  *
  * All four are Structured-Streaming-compatible shapes: the hourly rollup is a
  * tumbling-window agg, dedup-first is `dropDuplicates` semantics, and
  * sessionization is the stateful `flatMapGroupsWithState` pattern expressed
  * relationally (windowed lag) for the batch/oracle path.
  */
object Events {

  /** q_events_hourly — tumbling 1-hour rollup per event type. Streaming twin:
    * `groupBy(window($"ts", "1 hour"), $"event_type")`. */
  def qHourly(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** q_events_json — O4's JSON navigation over the landed `props` column
    * (the reference's duck-typed field access, weather_etl.py:119–131). */
  def qJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("k"))

  /** q_events_dedup — keep-first-per-key dedup (the reference's O13 as an
    * aggregate): earliest event id + count per (user, type). */
  def qDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n"))
      .orderBy(col("user_id"), col("event_type"))

  /** q_events_sessions — 30-minute-gap sessionization per user: one shuffle
    * on user_id for the lag window, then a per-user aggregate on the same
    * partitioning (no second shuffle). */
  def qSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .withColumn("new_session",
        when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** q_events_retention — weekly cohort retention: users bucketed by their
    * first-seen week, counted once per (cohort, week-offset) they were
    * active in. Two aggregates + one join, all keyed on user_id — at scale
    * the firsts aggregate and the activity distinct share the user_id
    * partitioning, and the join reuses it (no extra shuffle of the big
    * side beyond the two aggregates). */
  def qRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val firsts = ev.groupBy(col("user_id"))
      .agg(min(date_trunc("week", col("ts"))).as("cohort"))
    val activity = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    activity.join(firsts, "user_id")
      .select(col("cohort").cast("date").cast("string").as("cohort_week"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_retention" -> (qRetention _),
    "q_events_hourly" -> (qHourly _),
    "q_events_json" -> (qJson _),
    "q_events_dedup" -> (qDedup _),
    "q_events_sessions" -> (qSessions _))

  val oracles: Map[String, String] = Map(
    "q_events_retention" ->
      """WITH firsts AS (
        |  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort
        |  FROM events GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
        |SELECT CAST(CAST(f.cohort AS DATE) AS VARCHAR) AS cohort_week,
        |  CAST(date_diff('day', f.cohort, a.wk) / 7 AS INT) AS week_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM act a JOIN firsts f USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,
    "q_events_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1
        |ORDER BY k""".stripMargin,
    "q_events_dedup" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_event_id,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q_events_sessions" ->
      """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |           OR date_diff('second', prev_ts, ts) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM (
        |    SELECT user_id, ts,
        |      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |        AS prev_ts
        |    FROM events) t1) t2
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin)
}
