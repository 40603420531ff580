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

  /** Deterministic row salt in [0, factor): hashes the row content PLUS the
    * row's position (monotonically_increasing_id), so a hot key made of
    * byte-identical repeated rows — the classic skew shape — still spreads
    * over all `factor` sub-keys. No rand(): a task retry recomputes the same
    * partition in the same order, so ids and salts replay identically
    * (retry idempotence — the reference's core guarantee). */
  def rowSalt(df: DataFrame, factor: Int): Column =
    pmod(hash(struct(df.columns.map(col): _*),
      monotonically_increasing_id()), lit(factor))

  /** Inner equi-join of skewed `big` with `small` on `key`, salted. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", rowSalt(big, factor))
    val saltedSmall = small
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
