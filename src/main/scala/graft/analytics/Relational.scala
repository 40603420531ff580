package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational analytics surface (SURVEY.md §2 "coverage by category").
  *
  * The reference delegates its only relational work to MySQL SQL strings
  * (filter + COUNT at weather_etl.py:158–168); everything here is the extended
  * Spark-built-in surface: groupBy/agg, joins (broadcast/semi/anti), windows,
  * sorts/top-k, set ops, rollup.
  *
  * Conventions shared with the DuckDB oracles (SparkEntry.oracleSql):
  *  - every computed column is aliased identically on both sides;
  *  - double-typed aggregates are rounded to a fixed scale so that
  *    parallel-summation order cannot flip the hash compare;
  *  - every query ends in a deterministic total ORDER BY (NULLS FIRST spelled
  *    out in the SQL — Spark's ascending default — and ties broken by a key);
  *  - top-k selection orders by the ROUNDED measure + key so the k-boundary
  *    cannot flip on float summation order.
  *
  * Scale notes (100 TB): aggregations are partial (map-side combine) by
  * construction; dimension joins broadcast the small side explicitly; fact-fact
  * joins shuffle on their equi-keys only after filters are pushed to the scan.
  */
object Relational {

  /** q1_agg — TPC-H Q1-style pricing summary. Pure scan + partial agg + one
    * tiny shuffle of (flag, status) groups. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(Parity.decSum2(col("l_quantity")), 2).as("sum_qty"),
        round(Parity.decSum2(col("l_extendedprice")), 2).as("sum_base_price"),
        round(Parity.decSum4(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q6_filter — TPC-H Q6-style selective scan agg: the predicate must reach
    * the parquet reader (PushedFilters), the projection must be 3 columns. */
  def q6Filter(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(Parity.decSum4(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))
  }

  /** q3_join — TPC-H Q3-style: segment customers ⋈ orders ⋈ lineitem, top-10
    * orders by revenue. customer is the small side at every sf → broadcast;
    * orders⋈lineitem shuffles on the order key. */
  def q3Join(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(Parity.decSum4(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q5_join — TPC-H Q5-style local-supplier revenue by nation: 3 broadcast
    * dims (region→nation→, customer) + supplier, one fact-fact shuffle. */
  def q5Join(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = Tables.nation(spark, sfDir)
    val region = Tables.region(spark, sfDir)
      .filter(col("r_name") === "EUROPE")
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
                  col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(Parity.decSum4(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("n_name"))
  }

  /** q_window_topn — top-3 orders by value per customer (the reference's
    * natural "latest observation per city" pattern, SURVEY.md §2 windows).
    * Window shuffles once on o_custkey; rank prunes to ≤3 rows per key. */
  def qWindowTopn(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** q_anti_join — customers with no 1995 orders, counted per nation: the
    * reference's O13 anti-join shape (insert-if-absent) as analytics. The
    * filtered orders key set is small → broadcast anti-join, no shuffle of
    * customer. */
  def qAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val ord95 = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_custkey").as("c_custkey"))
    cust.join(ord95, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_inactive"))
      .orderBy(col("c_nationkey"))
  }

  /** q_semi_join — parts with any 1996-H1 shipment, counted per brand
    * (EXISTS = left_semi; the probe side never duplicates). */
  def qSemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.part(spark, sfDir)
    val li96 = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-07-01").cast("timestamp"))
      .select(col("l_partkey").as("p_partkey"))
    part.join(li96, Seq("p_partkey"), "left_semi")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))
  }

  /** q_setops — nation keys by membership: customers-only vs suppliers-only
    * vs both (EXCEPT / INTERSECT surface), tagged and unioned. */
  def qSetops(spark: SparkSession, sfDir: String): DataFrame = {
    val cn = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(spark, sfDir)
      .select(col("s_nationkey").as("nationkey")).distinct()
    val both = cn.intersect(sn).withColumn("membership", lit("both"))
    val custOnly = cn.except(sn).withColumn("membership", lit("customers_only"))
    val suppOnly = sn.except(cn).withColumn("membership", lit("suppliers_only"))
    both.unionByName(custOnly).unionByName(suppOnly)
      .orderBy(col("membership"), col("nationkey"))
  }

  /** q_rollup — grouping-sets surface: rollup over (returnflag, linestatus)
    * with subtotal rows (NULL markers sort first, matching the SQL's
    * NULLS FIRST). */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(Parity.decSum2(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q_outer_join — left outer with preserved unmatched rows: every nation,
    * including those with no high-balance customers (COUNT over the null-
    * extended side counts matches only). */
  def qOuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = Tables.nation(spark, sfDir)
    val richCust = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 9000)
    nation.join(richCust, col("n_nationkey") === col("c_nationkey"),
        "left_outer")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_rich"))
      .orderBy(col("n_name"))
  }

  /** q_window_running — cumulative frame (rowsBetween unbounded→current):
    * running revenue per customer in order date order. */
  def qWindowRunning(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_outer_join" -> (qOuterJoin _),
    "q_window_running" -> (qWindowRunning _),
    "q1_agg" -> (q1Agg _),
    "q6_filter" -> (q6Filter _),
    "q3_join" -> (q3Join _),
    "q5_join" -> (q5Join _),
    "q_window_topn" -> (qWindowTopn _),
    "q_anti_join" -> (qAntiJoin _),
    "q_semi_join" -> (qSemiJoin _),
    "q_setops" -> (qSetops _),
    "q_rollup" -> (qRollup _))

  val oracles: Map[String, String] = Map(
    "q_outer_join" ->
      """SELECT n_name, COUNT(c_custkey) AS n_rich
        |FROM nation
        |LEFT OUTER JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
        |  ON n_nationkey = c_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_total
        |FROM orders
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_base_price,
        |  ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_filter" ->
      """SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey, o_orderdate,
        |  ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-06-30'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_anti_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_inactive
        |FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate < TIMESTAMP '1996-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q_semi_join" ->
      """SELECT p_brand, COUNT(*) AS n_parts
        |FROM part
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-07-01')
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |SELECT nationkey, membership FROM (
        |  SELECT nationkey, 'both' AS membership
        |    FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        |  UNION ALL
        |  SELECT nationkey, 'customers_only' FROM
        |    (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
        |  UNION ALL
        |  SELECT nationkey, 'suppliers_only' FROM
        |    (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
        |) u
        |ORDER BY membership, nationkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
}
