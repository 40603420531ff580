package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.GraftExpressions.{column, expression}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-filtered joins: cut the big side of a shuffle join down
  * to (approximately) the rows that can match BEFORE the shuffle moves them.
  *
  * The reference's only join is MySQL's dedup lookup; at 100 TB the joins
  * that hurt are large-large equi-joins where the build side is selective —
  * e.g. "lineitems of the urgent 1993 orders". A broadcast join is off the
  * table when the filtered build side is still tens of GB of payload, but a
  * bloom filter over just its KEYS is megabytes: build it once, probe it
  * map-side on the big side, and the shuffle carries only probable matches.
  * False positives are harmless — the exact join still runs after the
  * pre-filter — so results are bit-identical to the unfiltered join
  * (q_bloom_join hash-matches the plain-join oracle). False negatives are
  * impossible by the bloom contract.
  *
  * This is the manual, composable twin of Spark's own runtime filter
  * injection (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which
  * plants the same BloomFilterAggregate/BloomFilterMightContain pair behind
  * a scalar subquery when stats justify it). The explicit form exists for
  * when the optimizer can't see the opportunity: the build side hides
  * behind an aggregate or a non-deterministic curation step, the probe is
  * reused across several queries, or the filter should be built once and
  * shipped to a different job entirely (the returned bytes are just the
  * serialized `org.apache.spark.util.sketch.BloomFilter`).
  *
  * Scale shape: the bloom itself is bounded driver/model state — sizing is
  * the standard m = -n·ln(p)/ln²2, i.e. ~1.2 MB per 10⁶ keys at 1% fpp —
  * and the build is a full map-side-combining aggregate (each partition
  * builds a local filter; merge is bitwise OR), so the build-side keys
  * shuffle only as already-merged filter blobs, never as rows. For build
  * sides beyond ~10⁸ keys prefer the optimizer's subquery form (the blob
  * stops being driver-friendly) or raise
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`, which also clamps
  * the explicit aggregate here.
  */
object BloomJoin {

  /** Optimal bit count for `expectedItems` at false-positive rate `fpp`
    * (m = -n·ln p / ln²2), floored to 64 bits. The engine clamps this to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 8 MB),
    * degrading fpp rather than failing. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val ln2sq = math.log(2) * math.log(2)
    math.max(64L, math.ceil(-expectedItems * math.log(fpp) / ln2sq).toLong)
  }

  /** Build a bloom filter over `key` of `build` (xxhash64-hashed, the same
    * family Spark's runtime filters use). Returns the serialized filter, or
    * null when the build side is empty — [[mightContain]] of a null filter
    * is null, so a pre-filter on it keeps nothing, which is exactly the
    * inner/semi-join semantics of an empty build side. */
  def buildBloom(build: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.01): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(key))),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp))).toAggregateExpression()
    build.select(column(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** Predicate: `key` might be in `bloom`. Map-side, codegen'd, no shuffle.
    * Null for a null filter (empty build side) — null filters out. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    column(BloomFilterMightContain(
      Literal(bloom, BinaryType), new XxHash64(Seq(expression(key)))))

  /** `big` reduced to rows whose `bigKey` might match a `buildKey`. The
    * superset-of-matches contract means any exact join/aggregate downstream
    * is unchanged; only the shuffle volume shrinks. */
  def preFilter(big: DataFrame, bigKey: Column,
                build: DataFrame, buildKey: Column,
                expectedItems: Long, fpp: Double = 0.01): DataFrame =
    big.filter(mightContain(buildBloom(build, buildKey, expectedItems, fpp), bigKey))

  /** Exact inner equi-join with the big side bloom-pre-filtered. Identical
    * results to `big.join(build, bigKey === buildKey)` for any fpp. */
  def bloomJoin(big: DataFrame, bigKey: Column,
                build: DataFrame, buildKey: Column,
                expectedItems: Long, fpp: Double = 0.01): DataFrame =
    preFilter(big, bigKey, build, buildKey, expectedItems, fpp)
      .join(build, bigKey === buildKey)
}
