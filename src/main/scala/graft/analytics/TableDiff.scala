package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Snapshot reconciliation — the diff of two keyed table versions into
  * ADDED / REMOVED / CHANGED / UNCHANGED, the regression gate a pipeline
  * runs after a rewrite ("the refactored job produced the same table,
  * except these rows"). Pairs naturally with [[graft.sinks.VersionedTable]]
  * time travel: diff(read(v1), read(v2)).
  *
  * Scale shape: ONE full-outer key join — both sides shuffle once on the
  * key (co-located for free if both snapshots are bucketed by it), and the
  * change test compares a single content hash instead of N column
  * comparisons, so the join's row width stays (key, hash) regardless of
  * schema width. The verdict is a map-side CASE over the join output. No
  * window, no second pass; the summary is a |verdicts|-row aggregate.
  */
object TableDiff {

  /** Per-key verdicts: (key, verdict) for every key in either snapshot.
    * `cols` is the compared payload (defaults to all non-key columns).
    *
    * Null-position safety: Spark's hash expressions SKIP null inputs, so
    * hashing the bare columns would give (null, 'x') and ('x', null) the
    * same hash and misreport a real change as 'unchanged'. Each column is
    * therefore interleaved with an is-null marker (never null itself), so
    * nullness lands in the hash at the column's position. Residual risk
    * is the raw 64-bit collision (~N²/2⁶⁵ for N differing pairs) — a
    * colliding pair still reports 'unchanged'; callers needing certainty
    * re-compare the flagged subset column-wise. */
  def diff(before: DataFrame, after: DataFrame, key: String,
           cols: Seq[String] = Seq.empty): DataFrame = {
    val payload =
      if (cols.nonEmpty) cols
      else before.columns.filterNot(_ == key).toSeq
    def hashed(df: DataFrame, tag: String): DataFrame =
      df.select(col(key),
        xxhash64(payload.flatMap(c =>
          Seq(col(c).isNull.cast("int"), col(c))): _*).as(s"h_$tag"))
    hashed(before, "b").join(hashed(after, "a"), Seq(key), "full_outer")
      .select(col(key),
        when(col("h_b").isNull, "added")
          .when(col("h_a").isNull, "removed")
          .when(col("h_b") === col("h_a"), "unchanged")
          .otherwise("changed").as("verdict"))
  }

  /** The four verdict counts — the one-line regression report. */
  def summary(before: DataFrame, after: DataFrame, key: String,
              cols: Seq[String] = Seq.empty): DataFrame =
    diff(before, after, key, cols)
      .groupBy(col("verdict")).agg(count(lit(1)).as("n"))

  /** q_table_diff — diff two deterministic vintages of orders (v2 drops
    * every 7th key, rescales every 3rd price, adds synthetic keys) and
    * report the verdict counts. The oracle inlines the vintage rules over
    * the raw table, so a hash match pins the full-outer hash-compare. */
  def qTableDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val before = o
    val after = o
      .filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
      .unionByName(
        o.select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"))
          .filter(col("o_orderkey") % 11 === 0))
    summary(before, after, "o_orderkey")
      .orderBy(col("verdict"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_table_diff" -> (qTableDiff _))

  val oracles: Map[String, String] = Map(
    // vintage rules inlined: removed = %7 keys; changed = surviving %3
    // keys (price rescaled); added = shifted keys passing the %11 filter
    // applied AFTER the shift; everything else unchanged
    "q_table_diff" ->
      """WITH b AS (SELECT o_orderkey FROM orders),
        |a_new AS (SELECT o_orderkey + 100000000 AS k FROM orders
        |          WHERE (o_orderkey + 100000000) % 11 = 0)
        |SELECT verdict, COUNT(*) AS n FROM (
        |  SELECT CASE
        |    WHEN o_orderkey % 7 = 0 THEN 'removed'
        |    WHEN o_orderkey % 3 = 0 THEN 'changed'
        |    ELSE 'unchanged' END AS verdict
        |  FROM orders
        |  UNION ALL
        |  SELECT 'added' AS verdict FROM a_new)
        |GROUP BY verdict
        |ORDER BY verdict""".stripMargin)
}
