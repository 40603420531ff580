package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (build-prompt "salting for skew"): when
  * one join key carries a disproportionate share of the big side, a plain
  * hash join lands the whole hot key on one reducer. Salting splits each key
  * into `factor` sub-keys: the big side gets a deterministic per-row salt,
  * the small side is replicated ×factor, and the join runs on
  * (key, salt) — the hot key now spreads over `factor` reducers at the cost
  * of replicating the small side.
  *
  * AQE's skew-join handles this at runtime for sort-merge joins; explicit
  * salting remains the tool when AQE can't see the skew (aggregations
  * pre-join, or deliberately partitioned layouts).
  */
object Salting {

  /** Deterministic row salt in [0, factor): hashes the row content, plus
    * any caller-designated `uniqueCols` (an event id, a line number) that
    * distinguish otherwise-identical rows so they spread across sub-keys.
    *
    * Deliberately NOT monotonically_increasing_id() or rand(): both are
    * nondeterministic under task recomputation when the input is a shuffle
    * output, and a salt that changes on retry silently drops/duplicates
    * rows in the salted join (the SPARK-23207 class of bug). Content-only
    * hashing is always retry-safe; byte-identical duplicate rows without a
    * distinguishing column share a salt — if that IS the skew shape,
    * aggregate the duplicates first (count column), which is the correct
    * shuffle-reduction anyway. */
  def rowSalt(df: DataFrame, factor: Int,
              uniqueCols: Seq[String] = Nil): Column = {
    val cols = if (uniqueCols.nonEmpty) uniqueCols else df.columns.toSeq
    pmod(hash(struct(cols.map(col): _*)), lit(factor))
  }

  /** Inner equi-join of skewed `big` with `small` on `key`, salted. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int, uniqueCols: Seq[String] = Nil): DataFrame = {
    val saltedBig = big.withColumn("_salt", rowSalt(big, factor, uniqueCols))
    val saltedSmall = small
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
