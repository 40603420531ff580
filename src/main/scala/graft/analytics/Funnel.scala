package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** Funnel analysis — ordered-sequence matching ("users who signed up, THEN
  * clicked, THEN purchased — in that order"), the event-analytics operator
  * class the relational surface didn't cover yet.
  *
  * Formulation: per-stage min-timestamp chaining. Stage 1 is `min(ts)` of
  * the first event type per user; stage i is `min(ts)` of type i AFTER the
  * user's stage-(i−1) timestamp (and, with a conversion window, within
  * `within` seconds of it). Each stage is one filtered aggregate + one key
  * join against the shrinking survivor set — k stages = k shuffle rounds
  * on the SAME user key (AQE reuses the partitioning; at scale, bucket
  * events by user and every round is exchange-free), and per-user state is
  * exactly one timestamp per stage.
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

  private def stepBound(tsCol: String, prevT: String,
                        withinSeconds: Option[Long]): Column = {
    val after = col(tsCol) > col(prevT)
    withinSeconds.fold(after) { s =>
      after && col(tsCol) <= col(prevT) + expr(s"INTERVAL $s SECOND")
    }
  }

  /** One survivor frame per stage, built incrementally (stage i's frame
    * derives from stage i−1's — a LINEAR lineage, one reference per step):
    * frame i has one row per user who completed stages 1..i in order,
    * columns t1..ti. Frames are lazy views; each ACTION over frame i
    * executes its chain once — callers that materialize every frame
    * separately should use [[report]], which caches each survivor set so
    * no stage executes twice. `withinSeconds` bounds each step to a
    * conversion window ("clicked within N seconds of signup"). */
  def stageFrames(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, stages: Seq[String],
                  withinSeconds: Option[Long] = None): Seq[DataFrame] = {
    require(stages.nonEmpty, "empty funnel")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    stages.zipWithIndex.drop(1).scanLeft(first) { case (prev, (stage, i)) =>
      events.filter(col(typeCol) === stage)
        .join(prev, userCol)
        .filter(stepBound(tsCol, s"t$i", withinSeconds))
        .groupBy((col(userCol) +: (1 to i).map(j => col(s"t$j"))): _*)
        .agg(min(col(tsCol)).as(s"t${i + 1}"))
    }
  }

  /** Per-user stage timestamps: one row per user who completed ALL
    * `stages` in order, with columns t1..tk. */
  def completions(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, stages: Seq[String],
                  withinSeconds: Option[Long] = None): DataFrame =
    stageFrames(events, userCol, typeCol, tsCol, stages, withinSeconds).last

  /** The funnel report: (stage, event_type, n_users) with n_users the
    * count of users who reached that stage in order.
    *
    * EAGER, and deliberately so: each survivor frame is persisted and
    * counted ONCE, the next stage derives from the cached frame, and the
    * previous cache is dropped as soon as its successor materializes —
    * so stage i executes exactly once per report (the lazy per-frame
    * `count()` loop re-executed stages 1..i for every i: O(k²) stage
    * executions, the diamond-reuse recompute this repo checkpoints away
    * everywhere else). At most two survivor sets (one row per user) are
    * cached at any moment; driver state is k counts. */
  def report(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String],
             withinSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "empty funnel")
    val spark = events.sparkSession
    import spark.implicits._
    var prev: DataFrame = null
    val counts = stages.zipWithIndex.map { case (stage, i) =>
      val surv =
        if (i == 0)
          events.filter(col(typeCol) === stage)
            .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
        else
          events.filter(col(typeCol) === stage)
            .join(prev.select(col(userCol), col(s"t$i")), userCol)
            .filter(stepBound(tsCol, s"t$i", withinSeconds))
            .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t${i + 1}"))
      val cached = surv.persist(StorageLevel.MEMORY_AND_DISK)
      val n = cached.count() // materializes the cache; the ONE execution
      if (prev != null) prev.unpersist()
      prev = cached
      (i + 1, stage, n)
    }
    prev.unpersist()
    counts.toDF("stage", "event_type", "n_users")
  }

  /** q_funnel — signup → click → purchase over the events table,
    * hash-matched against a DuckDB CTE chain computing the same per-stage
    * min-chaining. */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame =
    report(Tables.events(spark, sfDir), "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .orderBy(col("stage"))

  /** q_funnel_window — the same funnel with a 3-day conversion window per
    * step ("clicked within 3 days of signup, purchased within 3 days of
    * the click"): the form real funnel queries take. Hash-matched against
    * the CTE chain with the interval bound inlined. */
  def qFunnelWindow(spark: SparkSession, sfDir: String): DataFrame =
    report(Tables.events(spark, sfDir), "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"),
        withinSeconds = Some(3L * 24 * 3600))
      .orderBy(col("stage"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> (qFunnel _),
    "q_funnel_window" -> (qFunnelWindow _))

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
        |ORDER BY stage""".stripMargin,
    "q_funnel_window" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 3 DAY
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t2 + INTERVAL 3 DAY
        |  GROUP BY e.user_id)
        |SELECT 1 AS stage, 'signup' AS event_type, COUNT(*) AS n_users FROM s1
        |UNION ALL
        |SELECT 2, 'click', COUNT(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', COUNT(*) FROM s3
        |ORDER BY stage""".stripMargin)
}
