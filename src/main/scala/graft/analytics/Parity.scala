package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum

/** Exact-decimal accumulation for oracle-parity sums of money-like columns.
  *
  * Two float-parity traps surfaced by running the oracle gate at 10× the
  * driver scale (q_merge_upsert, sf0.1):
  *
  *  1. a double SUM over enough 1e4–1e5-magnitude addends drifts past the
  *     2-dp output rounding, and Spark's and DuckDB's summation orders
  *     differ, so the drift differs;
  *  2. ROUND(expr, 2) on a double sitting AT a .xx5 representation
  *     boundary resolves differently per engine (exact-binary HALF_UP vs
  *     scaled-double rounding).
  *
  * Source columns here are exact decimal QUANTITIES (prices with 2 dp,
  * price×discount products with 4 dp): their doubles sit ~1e-11 from the
  * decimal grid — far from any cast boundary — so casting each addend to
  * DECIMAL of the right scale is unambiguous, and decimal addition is
  * order-independent. The sum is then cast back to double for a stable
  * output schema. The oracle twin is
  * `ROUND(CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE), 2)`.
  *
  * NOT for columns that are arbitrary reals (ratios, divisions, random
  * measures): those have no decimal grid, so a per-addend cast would
  * introduce exactly the boundary ambiguity this helper removes.
  */
object Parity {

  /** Order-independent sum of an exact-`scale`-dp quantity, as double. */
  def decSum(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Sum of an exact 2-dp quantity (prices, balances, quantities). */
  def decSum2(c: Column): Column = decSum(c, 2)

  /** Sum of an exact 4-dp quantity (2-dp × 2-dp products). */
  def decSum4(c: Column): Column = decSum(c, 4)
}
