package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split can't apply (it only splits SORT-MERGE join partitions,
  * and only when the skew is visible in runtime stats; a salted layout also
  * survives into downstream stages that reuse the partitioning).
  *
  * Shape: the skewed (probe) side gets a deterministic salt in [0, nSalts)
  * hashed from a caller-chosen unique column — hash, not rand(), so a
  * retried task salts identically and the join stays exactly-once under
  * speculative execution. The build side is exploded ×nSalts (its rows are
  * duplicated once per salt), and the join key becomes (key, salt): a hot
  * key's 10⁹ rows now land on nSalts different reducers instead of one.
  * The ×nSalts build amplification is the price, so this is for
  * moderate-cardinality build sides joined to skewed big sides — a
  * broadcastable build side should broadcast instead (no shuffle at all),
  * which the caller controls by just not salting.
  *
  * Inner joins only: outer semantics over a replicated build side would
  * need null-deduplication that re-introduces the skewed shuffle.
  */
object SkewJoin {

  /** Inner-join `big` (skewed on `bigKey`) with `dim`, spreading each key
    * across `nSalts` reducers. `saltFrom` must be unique-ish per big row
    * (an id column) so salts distribute evenly. */
  def saltedJoin(big: DataFrame, bigKey: String, dim: DataFrame,
                 dimKey: String, saltFrom: Column, nSalts: Int): DataFrame = {
    require(nSalts > 1, s"nSalts must be > 1: $nSalts")
    val b = big.withColumn("__salt_b", pmod(hash(saltFrom), lit(nSalts)))
    val d = dim.withColumn("__salt_d",
      explode(lit((0 until nSalts).toArray)))
    b.join(d, b(bigKey) === d(dimKey) && b("__salt_b") === d("__salt_d"))
      .drop(d(dimKey)) // equal to big's key by the join predicate
      .drop("__salt_b", "__salt_d")
  }
}
