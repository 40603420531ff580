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

  // ---- sketch state: the rollup plain partials cannot maintain ----

  /** Distinct counts are the one rollup the plain state above cannot carry
    * — per-batch distinct counts don't add when members repeat across
    * batches, and keeping the raw member sets is the unbounded state this
    * pattern exists to avoid. The DataSketches HLL sketch (built into
    * Spark: `hll_sketch_agg` / `hll_union_agg`) IS the mergeable partial
    * state for COUNT(DISTINCT): fixed ≤2^lgK bytes per group, lossless
    * same-lgK unions, landable as a parquet binary column. New batches
    * union in; any coarser time grain (month-from-days) re-derives by
    * unioning landed day sketches without touching raw history — at 100 TB
    * that is "re-aggregate a few KB per day" versus "re-scan the year".
    *
    * Estimates are EXACT while a sketch stays in its coupon (list/set)
    * phase — thousands of uniques at lgK=16 — and ~1–2% beyond it; the
    * driver oracle hash-matches COUNT(DISTINCT) in the exact regime, and
    * the approximate regime's error is spec-pinned instead. */
  def sketchPartials(events: DataFrame, lgK: Int = 16): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lgK).as("users_hll"),
        count(lit(1)).as("n"))

  /** Fold sketch-state frames: counts add, sketches union (associative +
    * commutative like every other state column — batch landing order
    * cannot matter). */
  def sketchMerge(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("day"))
      .agg(hll_union_agg(col("users_hll")).as("users_hll"),
        sum(col("n")).as("n"))

  /** Read-time presentation: estimates materialize only here — the stored
    * state stays a sketch so it remains mergeable (the avg-vs-sum rule
    * above, applied to distincts). */
  def sketchPresent(state: DataFrame): DataFrame =
    state.select(col("day").cast("string").as("day"), col("n"),
      hll_sketch_estimate(col("users_hll")).as("distinct_users"))

  /** Coarser grain from landed day state: month-level distincts by
    * unioning day sketches — no raw-data rescan. */
  def sketchByMonth(state: DataFrame): DataFrame =
    state
      .groupBy(substring(col("day").cast("string"), 1, 7).as("month"))
      .agg(hll_union_agg(col("users_hll")).as("users_hll"),
        sum(col("n")).as("n"))
      .select(col("month"), col("n"),
        hll_sketch_estimate(col("users_hll")).as("distinct_users"))

  // ---- KLL quantile state: the same treatment for percentiles ----

  /** Percentiles are the OTHER non-mergeable rollup: a day's p95 and
    * another day's p95 combine into nothing — historically you either keep
    * raw history or lose the quantile. The DataSketches KLL sketch
    * (`kll_sketch_agg_double` / `kll_sketch_merge_double`) is the
    * mergeable state: ~k-bounded bytes per group, unions across batches
    * and grains, ~1.65%-of-N rank error once past the exact phase (a
    * sketch retaining ≤ k values is exact — k=800 here keeps whole days
    * exact at the correctness-gate scale, and at 100 TB the rank-error
    * regime is the point). */
  def kllPartials(events: DataFrame, k: Int = 800): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(kll_sketch_agg_double(col("value"), k).as("value_kll"),
        count(lit(1)).as("n"))

  def kllMerge(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("day"))
      .agg(kll_merge_agg_double(col("value_kll"), 800).as("value_kll"),
        sum(col("n")).as("n"))

  /** Read-time presentation: the normalized rank of a fixed threshold
    * (exact while the sketch is in its retain-all phase — what the oracle
    * checks) plus the quantile estimates (exact in the same phase;
    * rank-error-bounded beyond it, pinned in SketchRollupSpec). */
  def kllPresent(state: DataFrame, threshold: Double = 50.0): DataFrame =
    state.select(col("day").cast("string").as("day"), col("n"),
      round(kll_sketch_get_rank_double(col("value_kll"), lit(threshold)), 6)
        .as("rank_at_t"),
      round(kll_sketch_get_quantile_double(col("value_kll"), lit(0.5)), 6)
        .as("p50"),
      round(kll_sketch_get_quantile_double(col("value_kll"), lit(0.95)), 6)
        .as("p95"))

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

  /** q_kll_rollup — the quantile-sketch loop end to end, same split
    * discipline as [[qRollupIncr]]: halves sketched separately, merged
    * sketch-to-sketch, presented. The oracle-checked metric is the
    * normalized rank of a fixed threshold — exact in the retain-all phase
    * (k=800 ≥ any day's rows at the gate scale), so the hash match proves
    * merge(kll(A), kll(B)) ≡ kll(A ∪ B) ≡ exact rank. The quantile
    * estimates (whose exact-phase index convention is engine-specific) are
    * spec-pinned instead. */
  def qKllRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val history = ev.filter(col("event_id") % 2 === 0)
    val fresh = ev.filter(col("event_id") % 2 === 1)
    kllPresent(kllMerge(kllPartials(history), kllPartials(fresh)))
      .select(col("day"), col("n"), col("rank_at_t"))
      .orderBy(col("day"))
  }

  /** q_hll_rollup — the sketch loop end to end, same split discipline as
    * [[qRollupIncr]]: the two halves of events are sketched separately,
    * merged sketch-to-sketch, and presented. The oracle is plain
    * COUNT(DISTINCT) over the full table: in this cardinality regime the
    * sketches are in their exact coupon phase, so the hash match proves
    * union(sketch(A), sketch(B)) ≡ sketch(A ∪ B) ≡ exact — the mergeability
    * property the landed-sketch design rests on. The approximate-regime
    * error bound is pinned in SketchRollupSpec. */
  def qHllRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val history = ev.filter(col("event_id") % 2 === 0)
    val fresh = ev.filter(col("event_id") % 2 === 1)
    sketchPresent(sketchMerge(sketchPartials(history), sketchPartials(fresh)))
      .orderBy(col("day"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup_incr" -> (qRollupIncr _),
    "q_hll_rollup" -> (qHllRollup _),
    "q_kll_rollup" -> (qKllRollup _))

  val oracles: Map[String, String] = Map(
    "q_kll_rollup" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n,
        |  ROUND(SUM(CASE WHEN value <= 50.0 THEN 1.0 ELSE 0.0 END)
        |    / COUNT(*), 6) AS rank_at_t
        |FROM events
        |GROUP BY 1
        |ORDER BY day""".stripMargin,
    "q_hll_rollup" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS distinct_users
        |FROM events
        |GROUP BY 1
        |ORDER BY day""".stripMargin,
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
