package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Single-pass data profiling — the Deequ-shaped operator a 100 TB ingest
  * gate runs before anything downstream trusts a new drop: per-column row
  * count, null count, distinct count, min/max, mean, computed in ONE scan
  * whose partial aggregates combine map-side. The result is |cols| rows
  * regardless of input size, so the profile of a 100 TB table is a
  * driver-printable artifact.
  *
  * Distinct counts have two regimes:
  * - `exactDistinct = false` (the at-scale default): HLL++
  *   `approx_count_distinct` — one scan, no row expansion, mergeable
  *   sketch state, ~2% error.
  * - `exactDistinct = true`: exact `count(distinct)`; Catalyst plans the
  *   N distinct aggregates as one scan with an Expand (×|cols| row
  *   amplification before the partial aggregate). Exact mode is what the
  *   DuckDB oracle can reproduce, so q_profile runs it; the no-Expand
  *   plan shape of the approx default is spec-pinned instead.
  */
object Profiling {

  /** One row per profiled column:
    * (col_name, n_rows, n_null, n_distinct, min_v, max_v, avg_v).
    * Numeric columns only (min/max/avg are cast to double). */
  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        round(Parity.decSum4(col(c)) / count(col(c)), 6).as(s"${c}__avg"))
    }
    // stack() unpivots the single metrics row map-side — no second scan,
    // no shuffle beyond the one aggregate.
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nn`, `${c}__nd`, `${c}__min`, `${c}__max`, `${c}__avg`")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_null, n_distinct, min_v, max_v, avg_v)"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"), col("avg_v"))
  }

  /** q_profile — exact-mode profile of lineitem's bounded-cardinality
    * measure columns, hash-matched against a DuckDB UNION ALL of
    * per-column aggregates. Deliberately NOT the near-unique
    * l_extendedprice: exact mode pushes every distinct value through the
    * Expand shuffle, so a ~|rows|-cardinality column multiplies the
    * query's cost for no information the approx default (spec-covered)
    * doesn't deliver at 1/50th the cost — the same judgment call a real
    * profile job makes per column. */
  def qProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("l_discount", "l_quantity", "l_tax")
    profile(Tables.lineitem(spark, sfDir), cols, exactDistinct = true)
      .orderBy(col("col_name"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> (qProfile _))

  private def oracleFor(c: String): String =
    s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
       |  COUNT(*) - COUNT($c) AS n_null,
       |  COUNT(DISTINCT $c) AS n_distinct,
       |  CAST(MIN($c) AS DOUBLE) AS min_v,
       |  CAST(MAX($c) AS DOUBLE) AS max_v,
       |  ROUND(CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / COUNT($c), 6)
       |    AS avg_v
       |FROM lineitem""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_profile" ->
      (Seq("l_discount", "l_quantity", "l_tax")
        .map(oracleFor).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")))
}
