package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational analytics surface (SURVEY.md §2 "coverage by category").
  *
  * The reference delegates its only relational work to MySQL SQL strings
  * (filter + COUNT at weather_etl.py:158–168); everything here is the extended
  * Spark-built-in surface: groupBy/agg, joins (broadcast/semi/anti), windows,
  * sorts, set ops, rollup.
  *
  * Conventions shared with the DuckDB oracles (SparkEntry.oracleSql):
  *  - every computed column is aliased identically on both sides;
  *  - double-typed aggregates are rounded to a fixed scale so that
  *    parallel-summation order cannot flip the hash compare;
  *  - every query ends in a deterministic total ORDER BY.
  *
  * Scale notes (100 TB): aggregations are partial (map-side combine) by
  * construction; dimension joins broadcast the small side explicitly; fact-fact
  * joins shuffle on their equi-keys only after filters have been pushed to the
  * parquet scan.
  */
object Relational {

  /** q1_agg — TPC-H Q1-style pricing summary. Wide-row agg over the biggest
    * fact table; at scale this is a pure scan + partial-agg + 1 shuffle of
    * (flag,status) groups, which AQE coalesces. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
