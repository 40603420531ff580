package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Incremental aggregate maintenance — the materialized-rollup pattern: a
  * 100 TB pipeline cannot re-aggregate the whole history every time a batch
  * lands, so it stores per-group PARTIAL STATE (count / exact sum / min /
  * max — each mergeable by construction) and folds every new batch into it
  * with a bounded |groups|-sized merge. Derived metrics (avg here) are
  * computed from the merged state at read time, never stored — storing an
  * average would make the state non-mergeable. Sums accumulate in DECIMAL
  * so merge order can never drift a double (the same Parity rule the batch
  * rollups follow). This is the batch twin of a streaming agg's state
  * store, and the relational twin of the reference's land-then-query design
  * (/root/reference/airflow/dags/weather_etl.py:156–187 — which recomputes
  * its existence check per row; the partial-state form is what survives
  * scale).
  */
object Incremental {

  /** Mergeable per-(day, event_type) state of one batch. */
  def partials(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))

  /** Fold any number of partial-state frames into one: every column of the
    * state merges with its own aggregate (counts add, sums add, mins min,
    * maxes max) — associative + commutative, so batches can land in any
    * order and the merge partial-aggregates map-side like everything else. */
  def merge(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Read-time presentation of merged state: derived metrics computed from
    * the state, stable column types for the oracle. */
  def present(state: DataFrame): DataFrame =
    state.select(col("day").cast("string").as("day"), col("event_type"),
      col("n"),
      round(col("sum_v").cast("double"), 4).as("sum_v"),
      round(col("min_v"), 6).as("min_v"),
      round(col("max_v"), 6).as("max_v"),
      round((col("sum_v") / col("n")).cast("double"), 6).as("avg_v"))

  // ---- driver query ----

  /** q_rollup_incr — the incremental loop end to end: the history half and
    * the new-batch half of `events` are aggregated SEPARATELY (as a real
    * pipeline would on different days), merged state-to-state, and
    * presented. The oracle recomputes the same rollup from the full table
    * in one pass, so a hash match proves merge(partials(A), partials(B)) ≡
    * aggregate(A ∪ B) — the algebraic property the whole pattern rests on. */
  def qRollupIncr(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val history = ev.filter(col("event_id") % 2 === 0)
    val fresh = ev.filter(col("event_id") % 2 === 1)
    present(merge(partials(history), partials(fresh)))
      .orderBy(col("day"), col("event_type"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup_incr" -> (qRollupIncr _))

  val oracles: Map[String, String] = Map(
    "q_rollup_incr" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v,
        |  ROUND(MIN(value), 6) AS min_v,
        |  ROUND(MAX(value), 6) AS max_v,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_v
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin)
}
