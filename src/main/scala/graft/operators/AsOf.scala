package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoin

import graft.sources.Tables

/** Public facade for the custom as-of join operator
  * ([[org.apache.spark.sql.graft.AsOfJoinExec]] — logical node + planner
  * strategy + sorted-merge physical exec).
  */
object AsOf {

  /** For every left row, attach the latest right row with the same key and
    * right ts ≤ left ts (left-outer). Right-side columns must not collide
    * with left-side names — rename before joining. */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, leftTs: String,
           rightKey: String, rightTs: String): DataFrame =
    AsOfJoin.join(left, right, leftKey, leftTs, rightKey, rightTs)

  /** q_asof_join — each purchase event gains the user's most recent signup
    * event at-or-before it (the canonical as-of shape: fact × snapshot).
    * Right side pre-dedups ts ties so the match is deterministic; DuckDB's
    * native ASOF LEFT JOIN is the oracle. */
  def qAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("s_user_id"), col("ts").as("s_ts"))
      .agg(min(col("event_id")).as("signup_event_id"))
    join(purchases, signups, "user_id", "ts", "s_user_id", "s_ts")
      .select(col("event_id"), col("user_id"), col("signup_event_id"))
      .orderBy(col("event_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _))

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH purchases AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |signups AS (
        |  SELECT user_id AS s_user_id, ts AS s_ts,
        |    MIN(event_id) AS signup_event_id
        |  FROM events WHERE event_type = 'signup'
        |  GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, s.signup_event_id
        |FROM purchases p
        |ASOF LEFT JOIN signups s
        |  ON p.user_id = s.s_user_id AND p.ts >= s.s_ts
        |ORDER BY p.event_id""".stripMargin)
}
