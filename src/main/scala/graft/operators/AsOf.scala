package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoin

import graft.sources.Tables

/** Public facade for the custom as-of join operator
  * ([[org.apache.spark.sql.graft.AsOfJoinExec]] — logical node + planner
  * strategy + sorted-merge physical exec).
  */
object AsOf {

  /** For every left row, attach the latest right row with the same key and
    * right ts ≤ left ts (left-outer). Right-side columns must not collide
    * with left-side names — rename before joining. */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, leftTs: String,
           rightKey: String, rightTs: String): DataFrame =
    AsOfJoin.join(left, right, leftKey, leftTs, rightKey, rightTs)

  /** Forward as-of: for every left row, the EARLIEST right row with the same
    * key and right ts ≥ left ts (left-outer) — "next reading after the
    * event". Reduced to the backward exec by order reversal:
    * first r ≥ t under ts is exactly last r' ≤ t' under the negated axis
    * (t' = −t), so the same co-partitioned sorted-merge runs unchanged —
    * no second exec to maintain, same single shuffle+sort per side.
    * Each ts type negates within its own width family — TIMESTAMP via
    * `unix_micros` (micros-like long), DATE via `unix_date` (days-like
    * int), integral columns as themselves — so the exec's planning-time
    * unit-mismatch validation still fires (a blanket long cast would erase
    * it and let a days-vs-micros pair join silently wrong). TIMESTAMP_NTZ
    * is rejected with a clear error: no public expression extracts its
    * micros without a session-timezone reinterpretation, and a DST-affected
    * mapping is not order-preserving — cast to TIMESTAMP (or epoch micros)
    * explicitly to state the intended semantics. Right-side ts ties must be
    * pre-deduped, as with [[join]]. */
  def joinForward(left: DataFrame, right: DataFrame,
                  leftKey: String, leftTs: String,
                  rightKey: String, rightTs: String): DataFrame = {
    import org.apache.spark.sql.types.{DateType, IntegerType, LongType, ShortType, TimestampType}
    def negated(df: DataFrame, c: String) = df.schema(c).dataType match {
      case TimestampType => negate(unix_micros(col(c)))
      case DateType => negate(unix_date(col(c)))
      case LongType | IntegerType | ShortType => negate(col(c))
      case other => throw new IllegalArgumentException(
        s"forward as-of ts column '$c' has unsupported type ${other.sql}: " +
          "supported are TIMESTAMP, DATE, and integral epochs; cast " +
          "TIMESTAMP_NTZ to TIMESTAMP (or epoch micros) first")
    }
    val ln = "__asof_fwd_lts"; val rn = "__asof_fwd_rts"
    AsOfJoin.join(
        left.withColumn(ln, negated(left, leftTs)),
        right.withColumn(rn, negated(right, rightTs)),
        leftKey, ln, rightKey, rn)
      .drop(ln, rn)
  }

  /** q_asof_join — each purchase event gains the user's most recent signup
    * event at-or-before it (the canonical as-of shape: fact × snapshot).
    * Right side pre-dedups ts ties so the match is deterministic; DuckDB's
    * native ASOF LEFT JOIN is the oracle. */
  def qAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("s_user_id"), col("ts").as("s_ts"))
      .agg(min(col("event_id")).as("signup_event_id"))
    join(purchases, signups, "user_id", "ts", "s_user_id", "s_ts")
      .select(col("event_id"), col("user_id"), col("signup_event_id"))
      .orderBy(col("event_id"))
  }

  /** q_asof_forward — each signup gains the user's FIRST purchase at-or-
    * after it (conversion lag accounting — the forward twin of
    * [[qAsofJoin]]). Oracle = plain-SQL first-match emulation (DuckDB's
    * native ASOF is backward-only). */
  def qAsofForward(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user_id"), col("ts").as("p_ts"))
      .agg(min(col("event_id")).as("purchase_event_id"))
    joinForward(signups, purchases, "user_id", "ts", "p_user_id", "p_ts")
      .select(col("event_id"), col("user_id"), col("purchase_event_id"))
      .orderBy(col("event_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_forward" -> (qAsofForward _))

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH purchases AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |signups AS (
        |  SELECT user_id AS s_user_id, ts AS s_ts,
        |    MIN(event_id) AS signup_event_id
        |  FROM events WHERE event_type = 'signup'
        |  GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, s.signup_event_id
        |FROM purchases p
        |ASOF LEFT JOIN signups s
        |  ON p.user_id = s.s_user_id AND p.ts >= s.s_ts
        |ORDER BY p.event_id""".stripMargin,
    "q_asof_forward" ->
      """WITH signups AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'signup'),
        |purchases AS (
        |  SELECT user_id AS p_user_id, ts AS p_ts,
        |    MIN(event_id) AS purchase_event_id
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1, 2),
        |matched AS (
        |  SELECT s.event_id, s.user_id, p.purchase_event_id,
        |    ROW_NUMBER() OVER (PARTITION BY s.event_id
        |      ORDER BY p.p_ts) AS rn
        |  FROM signups s
        |  LEFT JOIN purchases p
        |    ON s.user_id = p.p_user_id AND p.p_ts >= s.ts)
        |SELECT event_id, user_id, purchase_event_id
        |FROM matched WHERE rn = 1
        |ORDER BY event_id""".stripMargin)
}
