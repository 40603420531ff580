package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Second analytics tranche (round 2): grouping sets, statistical
  * aggregates, full window-function breadth, higher-order array functions,
  * ordered string aggregation, regex scalars, conditional scalars, date
  * arithmetic, range (non-equi) join, MERGE-style upsert, salted two-stage
  * aggregation, and unpivot. Every query is DuckDB-oracle-checked.
  *
  * The reference itself has none of these (SURVEY.md §2: its only
  * aggregation is a COUNT(*) existence gate) — this is the extended
  * engine surface, Spark built-ins exercised in their 100 TB shapes
  * (broadcast range joins, partial-agg-friendly two-stage salting,
  * single-shuffle grouping sets).
  */
object Advanced {

  /** q_grouping_sets — explicit GROUPING SETS with grouping() flags: three
    * granularities in ONE shuffle (Spark expands grouping sets like cube —
    * a single Expand + hash aggregate, not three scans). */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(grouping(l_returnflag) AS INT) AS g_rf,
        CAST(grouping(l_linestatus) AS INT) AS g_ls,
        COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
          AS sum_price
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)
  }

  /** q_stats_agg — the statistical-aggregate surface (corr / covariance /
    * stddev / variance), all single-pass partial-aggregable moments.
    * Rounded to 4: moment accumulation order differs across engines. */
  def qStatsAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
          .as("covar_qp"),
        round(stddev_samp(col("l_discount")), 4).as("sd_disc"),
        round(var_samp(col("l_tax")), 4).as("var_tax"))
      .orderBy(col("l_returnflag"))

  /** q_window_breadth — the window functions q_window_funcs doesn't cover:
    * dense_rank, percent_rank, cume_dist, lag/lead with defaults. Ordering
    * is total within each partition (ties broken by key) so offset
    * functions are deterministic. */
  def qWindowBreadth(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        round(cume_dist().over(w), 6).as("cdist"),
        round(lag(col("o_totalprice"), 1, 0.0).over(w), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1, 0.0).over(w), 2).as("next_price"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** q_array_funcs — higher-order functions over per-group arrays:
    * collect → sort → transform / filter / aggregate, reduced back to
    * scalars (plus a joined string) for oracle comparison. */
  def qArrayFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 500)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity").cast("int"))).as("qs"))
      .select(col("l_orderkey"),
        size(col("qs")).as("n_items"),
        aggregate(col("qs"), lit(0), (a, x) => a + x * 2).cast("bigint")
          .as("sum_doubled"),
        size(filter(col("qs"), _ > 25)).as("n_big"),
        array_join(transform(col("qs"), _.cast("string")), ",").as("qstr"))
      .orderBy(col("l_orderkey"))

  /** q_string_agg — ordered, distinct string aggregation per group
    * (deterministic: the set is sorted before joining). */
  def qStringAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(concat_ws(",", array_sort(collect_set(col("o_orderstatus"))))
        .as("statuses"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** q_regex_funcs — regex scalar surface (extract + replace), patterns
    * chosen inside the RE2 ∩ Java-regex dialect the two engines share. */
  def qRegexFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        length(regexp_replace(col("p_name"), "[^aeiou]", "")).as("vowels"),
        col("p_retailprice"))
      .groupBy(col("first_word"))
      .agg(count(lit(1)).as("n"), sum(col("vowels")).as("n_vowels"),
        round(avg(col("p_retailprice")), 2).as("avg_price"))
      .orderBy(col("first_word"))

  /** q_conditional — CASE / nullif / coalesce / least / greatest. */
  def qConditional(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
          .as("status_or_open"),
        least(col("o_totalprice"), lit(100000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(1000.0)).as("floored"))
      .groupBy(col("band"), col("status_or_open"))
      .agg(count(lit(1)).as("n"),
        round(Parity.decSum2(col("capped")), 2).as("sum_capped"),
        round(min(col("floored")), 2).as("min_floored"))
      .orderBy(col("band"), col("status_or_open"))

  /** q_date_arith — date arithmetic (truncation, day offsets, month ends)
    * beyond q_date_parts's field extraction. */
  def qDateArith(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(date_trunc("quarter", col("o_orderdate")).cast("date")
        .cast("string").as("qstart"),
        datediff(last_day(col("o_orderdate")), col("o_orderdate").cast("date"))
          .as("days_to_eom"),
        when(quarter(date_add(col("o_orderdate").cast("date"), 30))
          =!= quarter(col("o_orderdate")), 1).otherwise(0).as("crosses"))
      .groupBy(col("qstart"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("days_to_eom")), 6).as("avg_days_to_eom"),
        sum(col("crosses")).as("n_q_crossers"))
      .orderBy(col("qstart"))

  /** q_range_join — non-equi (band) join: orders against a tiny derived
    * band table. The band side is explicitly broadcast, so the range join
    * is a map-side nested-loop against 4 rows — the only sane plan for
    * dim-table banding at 100 TB (a shuffle range join would be a skewed
    * cross product). */
  def qRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("p00_050k", 0.0, 50000.0),
      ("p05_100k", 50000.0, 100000.0),
      ("p10_200k", 100000.0, 200000.0),
      ("p20_600k", 200000.0, 600000.0)).toDF("band", "lo", "hi")
    Tables.orders(spark, sfDir)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("band"))
  }

  /** q_merge_upsert — MERGE INTO semantics (the reference's O13 insert-if-
    * absent generalized to upsert) as one full-outer join pass: matched →
    * update, unmatched-source → insert, unmatched-target → keep. Output is
    * the per-action audit (count + post-merge checksum), the shape a 100 TB
    * merge job would emit for reconciliation. */
  def qMergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val snapshot = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("s_price"))
    // Insert keys sit strictly above the table's actual max key — a fixed
    // offset would collide with real keys at large scale factors, and a
    // plain +max offset collides via key 0 (this data's keys start at 0);
    // either silently reclassifies inserts as updates.
    val maxKey = Tables.orders(spark, sfDir)
      .agg(max(col("o_orderkey"))).head().getLong(0) + 1L
    // u_price must be ARITHMETICALLY unambiguous across engines: the
    // earlier round(price * 1.1, 2) lands on .xx5 double boundaries where
    // Spark (exact-binary HALF_UP) and DuckDB (scaled double round)
    // disagree per row — observed at sf0.1. A plain IEEE add of the same
    // two doubles is bit-identical everywhere.
    val updates = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("key"),
        (col("o_totalprice") + lit(10.0)).as("u_price"))
      .unionByName(
        Tables.orders(spark, sfDir).filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + lit(maxKey)).as("key"),
            lit(100.0).as("u_price")))
    snapshot.join(updates, Seq("key"), "full_outer")
      .select(
        when(col("u_price").isNotNull && col("s_price").isNotNull, "update")
          .when(col("s_price").isNull, "insert")
          .otherwise("keep").as("action"),
        coalesce(col("u_price"), col("s_price")).as("price"))
      .groupBy(col("action"))
      // checksum accumulates in DECIMAL: prices are exact 2-dp quantities,
      // and a double sum over enough of them drifts past the 2-dp rounding
      // (observed at sf0.1: Spark's and DuckDB's float summation orders
      // disagreed in the cents digit over 1.5k addends). Exact decimal
      // arithmetic is order-independent, so the parity holds at ANY scale;
      // cast back to double for a stable output schema.
      .agg(count(lit(1)).as("n"),
        round(sum(col("price").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_price"))
      .orderBy(col("action"))
  }

  /** q_salted_agg — the two-stage salted aggregation
    * ([[graft.operators.Salting]]'s shape applied to aggregation): stage 1
    * aggregates on (key, salt) spreading each hot key over 16 reducers,
    * stage 2 combines the 16 partials per key. Same result as a direct
    * groupBy — which IS the oracle — with the skew spread the point at
    * scale (l_returnflag has 3 values; a direct shuffle would land a third
    * of 100 TB on one reducer... partial map-side aggregation also fixes
    * that here, but salting composes with aggregates that can't partial,
    * e.g. exact distincts or collect_list). */
  def qSaltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"),
        pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(16)).as("_salt"))
      .agg(Parity.decSum2(col("l_quantity")).as("pq"),
        count(lit(1)).as("pn"))
      .groupBy(col("l_returnflag"))
      // partials are exact 2-dp values well under 2^53/100, so the double
      // round-trip between the two decimal stages is lossless
      .agg(round(Parity.decSum2(col("pq")), 2).as("sum_qty"),
        sum(col("pn")).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** q_unpivot — wide→long reshaping (Dataset.unpivot): the q1-style wide
    * aggregate melted into (flag, metric, value) triples. */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(round(Parity.decSum2(col("l_quantity")), 2).as("sum_qty"),
        round(Parity.decSum2(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))

  /** q_corr_scalar — correlated scalar subquery (per-nation max): Catalyst
    * decorrelates to an aggregate + join, one pass over supplier — no
    * per-row re-execution. */
  def qCorrScalar(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    spark.sql("""
      SELECT s.s_nationkey, s.s_name, ROUND(s.s_acctbal, 2) AS top_bal
      FROM supplier s
      WHERE s.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s.s_nationkey)
      ORDER BY s.s_nationkey, s.s_name""")
  }

  /** q_in_subquery — IN / NOT IN predicate subqueries (both rewritten to
    * semi/anti joins by the optimizer). */
  def qInSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    spark.sql("""
      SELECT 'in' AS op, COUNT(*) AS n FROM customer
      WHERE c_nationkey IN (SELECT s_nationkey FROM supplier
                            WHERE s_acctbal > 5000)
      UNION ALL
      SELECT 'not_in' AS op, COUNT(*) AS n FROM customer
      WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier
                                WHERE s_acctbal > 5000)
      ORDER BY op""")
  }

  /** q_argmax — max_by/min_by with a composite (value, key) ordering so
    * ties are deterministic (the oracle expresses the same total order via
    * row_number — DuckDB's arg_max can't take a struct key). */
  def qArgmax(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("top_key"),
        round(max(col("o_totalprice")), 2).as("top_price"),
        min_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("bottom_key"))
      .orderBy(col("o_orderpriority"))

  /** q_gap_fill — time-series densification: generate the month spine with
    * `sequence` (no data shuffled to build a dimension) and left-join the
    * monthly rollup onto it, zero-filling gaps. */
  def qGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql("""
      WITH b AS (
        SELECT CAST(MIN(date_trunc('month', o_orderdate)) AS DATE) AS lo,
               CAST(MAX(date_trunc('month', o_orderdate)) AS DATE) AS hi
        FROM orders),
      spine AS (
        SELECT explode(sequence(lo, hi, INTERVAL 1 MONTH)) AS month FROM b),
      m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
          COUNT(*) AS n,
          ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
            AS revenue
        FROM orders GROUP BY 1)
      SELECT CAST(spine.month AS STRING) AS month, COALESCE(m.n, 0) AS n,
        COALESCE(m.revenue, 0.0) AS revenue
      FROM spine LEFT JOIN m ON spine.month = m.month
      ORDER BY month""")
  }

  /** q_map_funcs — MapType surface: build a status→count map per group
    * (map_from_entries over pre-aggregated entries), then read it back with
    * element_at / map_keys. The oracle recomputes the extracted scalars
    * directly (DuckDB maps exist but the portable contract is the values,
    * not the container). */
  def qMapFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("o_orderpriority"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("o_orderstatus"), col("c"))))).as("m"))
      .select(col("o_orderpriority"),
        coalesce(try_element_at(col("m"), lit("O")), lit(0L)).as("n_open"),
        coalesce(try_element_at(col("m"), lit("F")), lit(0L)).as("n_filled"),
        size(map_keys(col("m"))).as("n_statuses"))
      .orderBy(col("o_orderpriority"))

  /** q_try_funcs — ANSI-safe arithmetic: with ANSI mode ON (this engine's
    * default), x/0 and bad casts THROW; try_divide/try_cast give the
    * null-on-error escape hatch a 100 TB batch job needs (one poison row
    * must not kill a 6-hour job). day(o_orderdate)-1 is 0 for
    * first-of-month rows, so the nulls actually occur. */
  def qTryFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        try_divide(col("o_totalprice"),
          (dayofmonth(col("o_orderdate")) - 1).cast("double")).as("d"),
        try_to_number(substring(col("o_orderpriority"), 1, 1), lit("9"))
          .as("prio_num"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("d").isNull, 1L).otherwise(0L)).as("n_div_null"),
        round(sum(coalesce(col("d"), lit(0.0))), 2).as("sum_div"),
        max(col("prio_num")).cast("int").as("prio"))
      .orderBy(col("o_orderpriority"))

  /** q_having — HAVING over an aggregated IN-subquery (the TPC-H q18
    * shape): orders whose total line quantity clears a threshold. The
    * subquery aggregate runs once and semi-joins — no per-row re-execution. */
  def qHaving(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql("""
      SELECT o.o_orderkey, o.o_orderpriority, ROUND(o.o_totalprice, 2) AS price
      FROM orders o
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
      ORDER BY o.o_orderkey""")
  }

  /** q_window_range — time-RANGE window frame (peers by VALUE, not row
    * position): trailing-30-day revenue per priority. Range frames are
    * tie-deterministic by construction — all date peers share one frame —
    * so no tiebreaker column is needed, unlike every ROWS frame here. */
  def qWindowRange(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // orderdate is TIMESTAMP_NTZ; ANSI forbids a direct long cast — go via
    // TIMESTAMP (identity under the engine's fixed UTC session timezone)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("rev_30d"),
        count(lit(1)).over(w).as("n_30d"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_having" -> (qHaving _),
    "q_window_range" -> (qWindowRange _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_try_funcs" -> (qTryFuncs _),
    "q_corr_scalar" -> (qCorrScalar _),
    "q_in_subquery" -> (qInSubquery _),
    "q_argmax" -> (qArgmax _),
    "q_gap_fill" -> (qGapFill _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_stats_agg" -> (qStatsAgg _),
    "q_window_breadth" -> (qWindowBreadth _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_string_agg" -> (qStringAgg _),
    "q_regex_funcs" -> (qRegexFuncs _),
    "q_conditional" -> (qConditional _),
    "q_date_arith" -> (qDateArith _),
    "q_range_join" -> (qRangeJoin _),
    "q_merge_upsert" -> (qMergeUpsert _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_unpivot" -> (qUnpivot _))

  val oracles: Map[String, String] = Map(
    "q_having" ->
      """SELECT o.o_orderkey, o.o_orderpriority, ROUND(o.o_totalprice, 2) AS price
        |FROM orders o
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        |ORDER BY o.o_orderkey""".stripMargin,
    "q_window_range" ->
      """SELECT o_orderpriority, o_orderkey,
        |  ROUND(SUM(o_totalprice) OVER w, 2) AS rev_30d,
        |  COUNT(*) OVER w AS n_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_map_funcs" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_filled,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS INT) AS n_statuses
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q_try_funcs" ->
      """WITH t AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN EXTRACT(day FROM o_orderdate) = 1 THEN NULL
        |         ELSE o_totalprice / (EXTRACT(day FROM o_orderdate) - 1)
        |    END AS d,
        |    TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num
        |  FROM orders)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_div_null,
        |  ROUND(SUM(COALESCE(d, 0.0)), 2) AS sum_div,
        |  CAST(MAX(prio_num) AS INT) AS prio
        |FROM t GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q_corr_scalar" ->
      """SELECT s.s_nationkey, s.s_name, ROUND(s.s_acctbal, 2) AS top_bal
        |FROM supplier s
        |WHERE s.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
        |                     WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY s.s_nationkey, s.s_name""".stripMargin,
    "q_in_subquery" ->
      """SELECT 'in' AS op, COUNT(*) AS n FROM customer
        |WHERE c_nationkey IN (SELECT s_nationkey FROM supplier
        |                      WHERE s_acctbal > 5000)
        |UNION ALL
        |SELECT 'not_in' AS op, COUNT(*) AS n FROM customer
        |WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier
        |                          WHERE s_acctbal > 5000)
        |ORDER BY op""".stripMargin,
    "q_argmax" ->
      """WITH rnk AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rt,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rb
        |  FROM orders)
        |SELECT o_orderpriority,
        |  MAX(CASE WHEN rt = 1 THEN o_orderkey END) AS top_key,
        |  ROUND(MAX(CASE WHEN rt = 1 THEN o_totalprice END), 2) AS top_price,
        |  MAX(CASE WHEN rb = 1 THEN o_orderkey END) AS bottom_key
        |FROM rnk GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q_gap_fill" ->
      """WITH b AS (
        |  SELECT CAST(MIN(date_trunc('month', o_orderdate)) AS DATE) AS lo,
        |         CAST(MAX(date_trunc('month', o_orderdate)) AS DATE) AS hi
        |  FROM orders),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH))
        |    AS DATE) AS month FROM b),
        |m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    COUNT(*) AS n,
        |    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT CAST(spine.month AS VARCHAR) AS month,
        |  CAST(COALESCE(m.n, 0) AS BIGINT) AS n,
        |  COALESCE(m.revenue, 0.0) AS revenue
        |FROM spine LEFT JOIN m ON spine.month = m.month
        |ORDER BY month""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST,
        |  l_linestatus NULLS FIRST""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        |  ROUND(stddev_samp(l_discount), 4) AS sd_disc,
        |  ROUND(var_samp(l_tax), 4) AS var_tax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_window_breadth" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
        |  ROUND(CUME_DIST() OVER w, 6) AS cdist,
        |  ROUND(LAG(o_totalprice, 1, 0.0) OVER w, 2) AS prev_price,
        |  ROUND(LEAD(o_totalprice, 1, 0.0) OVER w, 2) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_array_funcs" ->
      """WITH g AS (
        |  SELECT l_orderkey,
        |    list_sort(list(CAST(l_quantity AS INT))) AS qs
        |  FROM lineitem WHERE l_orderkey < 500 GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  CAST(len(qs) AS INT) AS n_items,
        |  CAST(list_sum(list_transform(qs, x -> x * 2)) AS BIGINT)
        |    AS sum_doubled,
        |  CAST(len(list_filter(qs, x -> x > 25)) AS INT) AS n_big,
        |  array_to_string(list_transform(qs, x -> CAST(x AS VARCHAR)), ',')
        |    AS qstr
        |FROM g ORDER BY l_orderkey""".stripMargin,
    "q_string_agg" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
        |    AS statuses,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_regex_funcs" ->
      """SELECT regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  COUNT(*) AS n,
        |  CAST(SUM(length(regexp_replace(p_name, '[^aeiou]', '', 'g')))
        |    AS BIGINT) AS n_vowels,
        |  ROUND(AVG(p_retailprice), 2) AS avg_price
        |FROM part GROUP BY 1 ORDER BY first_word""".stripMargin,
    "q_conditional" ->
      """SELECT
        |  CASE WHEN o_totalprice < 50000 THEN 'low'
        |       WHEN o_totalprice < 150000 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(LEAST(o_totalprice, 100000.0)
        |    AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_capped,
        |  ROUND(MIN(GREATEST(o_totalprice, 1000.0)), 2) AS min_floored
        |FROM orders GROUP BY 1, 2 ORDER BY band, status_or_open""".stripMargin,
    "q_date_arith" ->
      """SELECT CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE)
        |    AS VARCHAR) AS qstart,
        |  COUNT(*) AS n,
        |  ROUND(AVG(date_diff('day', CAST(o_orderdate AS DATE),
        |    last_day(o_orderdate))), 6) AS avg_days_to_eom,
        |  CAST(SUM(CASE WHEN EXTRACT(quarter FROM CAST(o_orderdate AS DATE)
        |      + INTERVAL 30 DAY) <> EXTRACT(quarter FROM o_orderdate)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_q_crossers
        |FROM orders GROUP BY 1 ORDER BY qstart""".stripMargin,
    "q_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('p00_050k', 0.0, 50000.0), ('p05_100k', 50000.0, 100000.0),
        |  ('p10_200k', 100000.0, 200000.0), ('p20_600k', 200000.0, 600000.0))
        |SELECT band, COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
        |FROM orders JOIN bands
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q_merge_upsert" ->
      """WITH snapshot AS (
        |  SELECT o_orderkey AS key, o_totalprice AS s_price FROM orders),
        |updates AS (
        |  SELECT o_orderkey AS key, o_totalprice + 10.0 AS u_price
        |  FROM orders WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders) AS key,
        |    100.0 AS u_price
        |  FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT
        |  CASE WHEN u_price IS NOT NULL AND s_price IS NOT NULL THEN 'update'
        |       WHEN s_price IS NULL THEN 'insert'
        |       ELSE 'keep' END AS action,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(COALESCE(u_price, s_price) AS DECIMAL(18,2)))
        |    AS DOUBLE), 2) AS sum_price
        |FROM snapshot FULL OUTER JOIN updates USING (key)
        |GROUP BY 1 ORDER BY action""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS sum_qty,
        |    ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS sum_price,
        |    ROUND(AVG(l_discount), 6) AS avg_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price', sum_price FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'avg_disc', avg_disc FROM wide)
        |ORDER BY l_returnflag, metric""".stripMargin)
}
