package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Funnel analysis — ordered-sequence matching ("users who signed up, THEN
  * clicked, THEN purchased — in that order"), the event-analytics operator
  * class the relational surface didn't cover yet.
  *
  * Formulation: per-stage min-timestamp chaining. Stage 1 is `min(ts)` of
  * the first event type per user; stage i is `min(ts)` of type i AFTER the
  * user's stage-(i−1) timestamp. Each stage is one filtered aggregate +
  * one key join against the shrinking survivor set — k stages = k shuffle
  * rounds on the SAME user key (AQE reuses the partitioning; at scale,
  * bucket events by user and every round is exchange-free), and per-user
  * state is exactly one timestamp per stage.
  *
  * The tempting alternative — `array_sort(collect_list(struct(ts, type)))`
  * per user and a fold over the sequence — is one shuffle instead of k,
  * but its aggregation state is the user's ENTIRE event history: a bot
  * account with 10⁸ events OOMs the buffer. Chaining's state bound does
  * not depend on activity, which is what survives a 100 TB event log.
  * Filters on event type reach the scan (PushedFilters), so each round
  * reads only its stage's slice.
  */
object Funnel {

  /** One survivor frame per stage, built incrementally (stage i's frame
    * derives from stage i−1's — nothing is recomputed): frame i has one
    * row per user who completed stages 1..i in order, columns t1..t(i+1). */
  def stageFrames(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "empty funnel")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    stages.zipWithIndex.drop(1).scanLeft(first) { case (prev, (stage, i)) =>
      events.filter(col(typeCol) === stage)
        .join(prev, userCol)
        .filter(col(tsCol) > col(s"t$i"))
        .groupBy((col(userCol) +: (1 to i).map(j => col(s"t$j"))): _*)
        .agg(min(col(tsCol)).as(s"t${i + 1}"))
    }
  }

  /** Per-user stage timestamps: one row per user who completed ALL
    * `stages` in order, with columns t1..tk. */
  def completions(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, stages: Seq[String]): DataFrame =
    stageFrames(events, userCol, typeCol, tsCol, stages).last

  /** The funnel report: (stage, event_type, n_users) with n_users the
    * count of users who reached that stage in order. */
  def report(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    stageFrames(events, userCol, typeCol, tsCol, stages).zipWithIndex
      .map { case (frame, i) => (i + 1, stages(i), frame.count()) }
      .toDF("stage", "event_type", "n_users")
  }

  /** q_funnel — signup → click → purchase over the events table,
    * hash-matched against a DuckDB CTE chain computing the same per-stage
    * min-chaining. */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame =
    report(Tables.events(spark, sfDir), "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .orderBy(col("stage"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> (qFunnel _))

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id)
        |SELECT 1 AS stage, 'signup' AS event_type, COUNT(*) AS n_users FROM s1
        |UNION ALL
        |SELECT 2, 'click', COUNT(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', COUNT(*) FROM s3
        |ORDER BY stage""".stripMargin)
}
