package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Second-wave relational surface: cube, pivot, sketches, sampling, and the
  * SQL-subquery path (Catalyst decorrelation). Same oracle conventions as
  * [[Relational]].
  */
object RelationalExtra {

  /** q_cube — CUBE over (region of customer) × mktsegment: all four
    * grouping-set combinations in one pass (Spark expands to a single
    * shuffle with grouping-id, not four scans). */
  def qCube(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    cust.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        round(Parity.decSum2(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("n_name"), col("c_mktsegment"))
  }

  /** q_pivot — pivot l_linestatus into columns per returnflag (the
    * conditional-aggregation surface; Spark's pivot is sum(CASE WHEN) under
    * the hood, one shuffle). Values are enumerated so the plan is static. */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(Parity.decSum2(col("l_quantity")), 2))
      .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
      .orderBy(col("l_returnflag"))

  /** q_sample — deterministic systematic sample (key mod 20 == 3): the
    * oracle-able twin of .sample(); true Bernoulli sampling is exercised in
    * RelationalExtraSpec (engine-specific RNG can't hash-match DuckDB). */
  def qSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 20 === 3)
      .agg(count(lit(1)).as("n"),
        round(Parity.decSum2(col("o_totalprice")), 2).as("sum_price"))

  /** q_exists_subquery — correlated EXISTS through the SQL parser, so
    * Catalyst's decorrelation rewrites it to the same semi-join qSemiJoin
    * builds by hand. */
  def qExistsSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n_big_spenders
        |FROM customer
        |WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  /** q_scalar_subquery — scalar subquery in a predicate (one extra
    * broadcast of a 1-row aggregate, no per-row re-evaluation). */
  def qScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n_above_avg
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** q_approx_distinct — HLL++ sketch next to the exact count (rows-only:
    * DuckDB's approx algorithm differs; the ±5% bound is asserted in
    * RelationalExtraSpec). At 100 TB the sketch is the difference between a
    * mergeable fixed-size state and a full distinct shuffle.
    *
    * Shape: explicit two-level aggregation. `countDistinct` next to another
    * aggregate makes Catalyst plan an Expand (every input row duplicated per
    * aggregate arm) over the full table; pre-deduping (flag, partkey) — a
    * map-side-partial groupBy — feeds both aggregates from the already-
    * distinct pairs. HLL's estimate is identical on the deduped set (the
    * sketch is multiset-insensitive), and the shuffle carries distinct pairs
    * instead of 2× the raw rows. */
  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_partkey"))
      .filter(col("l_partkey").isNotNull) // countDistinct-equivalent nulls
      .distinct()
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  /** q_percentile — exact interpolated percentiles per group (Spark
    * `percentile` = DuckDB `quantile_cont`, both linear interpolation).
    * At 100 TB the approx sketch (percentile_approx) replaces this; exact
    * percentile is the oracle-checkable baseline. */
  def qPercentile(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"))
      .orderBy(col("o_orderpriority"))

  /** q_string_funcs — the string scalar surface (LIKE, substring, concat,
    * upper, coalesce): brand prefix stats over filtered part names. */
  def qStringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .filter(col("p_name").like("%a%"))
      .select(
        concat(upper(substring(col("p_brand"), 1, 5)), lit("#"),
          substring(col("p_type"), 1, 3)).as("brand_type"),
        length(col("p_name")).as("name_len"))
      .groupBy(col("brand_type"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("name_len")), 4).as("avg_name_len"))
      .orderBy(col("brand_type"))

  /** q_date_parts — the date scalar surface (year/month/quarter extraction)
    * as a calendar rollup. */
  def qDateParts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .agg(count(lit(1)).as("n"),
        round(Parity.decSum2(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("yr"), col("qtr"))

  /** q_setops_all — multiset set ops (UNION ALL / INTERSECT ALL / EXCEPT
    * ALL keep duplicates): nation-key bags of customers vs suppliers. */
  def qSetopsAll(spark: SparkSession, sfDir: String): DataFrame = {
    val cn = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").as("nationkey"))
    val sn = Tables.supplier(spark, sfDir)
      .select(col("s_nationkey").as("nationkey"))
    val inter = cn.intersectAll(sn)
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
    val exc = cn.exceptAll(sn)
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
    inter.unionByName(exc).orderBy(col("op"), col("nationkey"))
  }

  /** q_window_funcs — the wider window-function surface: first/last value
    * in frame, ntile bucketing, rank with gaps — all under one total
    * deterministic ordering. */
  def qWindowFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .filter(col("o_custkey") < 200)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(first(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("top_price"),
        ntile(4).over(w).as("quartile"),
        rank().over(w).as("rnk"))
      .orderBy(col("o_orderpriority"), col("rnk"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_setops_all" -> (qSetopsAll _),
    "q_window_funcs" -> (qWindowFuncs _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_date_parts" -> (qDateParts _),
    "q_percentile" -> (qPercentile _),
    "q_cube" -> (qCube _),
    "q_pivot" -> (qPivot _),
    "q_sample" -> (qSample _),
    "q_exists_subquery" -> (qExistsSubquery _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_approx_distinct" -> (qApproxDistinct _))

  val oracles: Map[String, String] = Map(
    "q_setops_all" ->
      """WITH cn AS (SELECT c_nationkey AS nationkey FROM customer),
        |     sn AS (SELECT s_nationkey AS nationkey FROM supplier),
        |i AS (SELECT nationkey, COUNT(*) AS n, 'intersect_all' AS op FROM
        |  (SELECT nationkey FROM cn INTERSECT ALL SELECT nationkey FROM sn)
        |  GROUP BY nationkey),
        |e AS (SELECT nationkey, COUNT(*) AS n, 'except_all' AS op FROM
        |  (SELECT nationkey FROM cn EXCEPT ALL SELECT nationkey FROM sn)
        |  GROUP BY nationkey)
        |SELECT * FROM i UNION ALL SELECT * FROM e
        |ORDER BY op, nationkey""".stripMargin,
    "q_window_funcs" ->
      """SELECT o_orderpriority, o_orderkey,
        |  ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS top_price,
        |  NTILE(4) OVER w AS quartile,
        |  RANK() OVER w AS rnk
        |FROM orders
        |WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rnk""".stripMargin,
    "q_string_funcs" ->
      """SELECT upper(substring(p_brand, 1, 5)) || '#' ||
        |    substring(p_type, 1, 3) AS brand_type,
        |  COUNT(*) AS n,
        |  ROUND(AVG(length(p_name)), 4) AS avg_name_len
        |FROM part
        |WHERE p_name LIKE '%a%'
        |GROUP BY 1
        |ORDER BY brand_type""".stripMargin,
    "q_date_parts" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_price
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY yr, qtr""".stripMargin,
    "q_percentile" ->
      """SELECT o_orderpriority,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p95
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_cube" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2)
        |    AS qty_f,
        |  ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2)
        |    AS qty_o
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_sample" ->
      """SELECT COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_price
        |FROM orders WHERE o_orderkey % 20 = 3""".stripMargin,
    "q_exists_subquery" ->
      """SELECT c_mktsegment, COUNT(*) AS n_big_spenders
        |FROM customer
        |WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n_above_avg
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
}
