package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving summary state: parallel arrays of tracked items, their
  * (over)counts, and per-item max overestimation. ≤ capacity entries on
  * every path. */
case class SpaceSavingBuf(var items: Array[String], var counts: Array[Long],
                          var errors: Array[Long])

/** SpaceSaving heavy hitters (Metwally et al., "Efficient Computation of
  * Frequent and Top-k Elements in Data Streams"): track at most `capacity`
  * items; an unseen item evicts the current minimum and inherits its count
  * as overestimation error. Guarantees, per summary over n rows:
  * every item with true count > n/capacity is present, and
  * true ≤ reported ≤ true + n/capacity.
  *
  * The merge is the mergeable-summaries form (Agarwal et al.): absent items
  * are credited the other side's minimum count (their maximum possible
  * count there), then the union is truncated back to the top `capacity` —
  * associative-in-guarantee, so partial aggregation works map-side like any
  * built-in and the shuffle carries one ≤capacity-entry summary per
  * (partition, group) instead of the raw rows.
  *
  * That state bound is the 100 TB point: exact top-k over a 10⁹-cardinality
  * column (URLs, user ids, shingles) is a full groupBy shuffle of every
  * distinct key; this summary answers "the heavy tail" with capacity·groups
  * state and one shuffle of summaries. When capacity ≥ the column's distinct
  * count the eviction path never runs and the summary IS the exact count
  * table — q_heavy_hitters exploits that to hash-match an exact oracle,
  * while the error-bound behavior under pressure is spec-pinned.
  *
  * Reduce is O(capacity) per row (linear probe over a flat array — cache
  * friendly for the intended capacity ≤ a few thousand); for larger
  * capacities use an exact groupBy instead, the economics flip.
  */
class SpaceSavingAgg(capacity: Int)
    extends Aggregator[String, SpaceSavingBuf, Seq[(String, Long, Long)]] {
  require(capacity > 0, s"capacity must be positive: $capacity")

  override def zero: SpaceSavingBuf =
    SpaceSavingBuf(Array.empty, Array.empty, Array.empty)

  override def reduce(b: SpaceSavingBuf, item: String): SpaceSavingBuf = {
    if (item == null) return b
    val n = b.items.length
    var i = 0
    while (i < n) {
      if (b.items(i) == item) { b.counts(i) += 1L; return b }
      i += 1
    }
    if (n < capacity) {
      b.items = b.items :+ item
      b.counts = b.counts :+ 1L
      b.errors = b.errors :+ 0L
      return b
    }
    // evict the minimum (ties: first) — the newcomer inherits its count
    var min = 0; i = 1
    while (i < n) { if (b.counts(i) < b.counts(min)) min = i; i += 1 }
    b.errors(min) = b.counts(min)
    b.counts(min) += 1L
    b.items(min) = item
    b
  }

  override def merge(x: SpaceSavingBuf, y: SpaceSavingBuf): SpaceSavingBuf = {
    if (y.items.isEmpty) return x
    if (x.items.isEmpty) return y
    val mx = if (x.items.length < capacity) 0L else x.counts.min
    val my = if (y.items.length < capacity) 0L else y.counts.min
    val yIdx = y.items.zipWithIndex.toMap
    val out = collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val seen = collection.mutable.HashSet.empty[String]
    var i = 0
    while (i < x.items.length) {
      val it = x.items(i)
      seen += it
      yIdx.get(it) match {
        case Some(j) =>
          out += ((it, x.counts(i) + y.counts(j), x.errors(i) + y.errors(j)))
        case None =>
          // `it` may have occurred up to `my` times uncounted on y's side
          out += ((it, x.counts(i) + my, x.errors(i) + my))
      }
      i += 1
    }
    i = 0
    while (i < y.items.length) {
      val it = y.items(i)
      if (!seen(it)) out += ((it, y.counts(i) + mx, y.errors(i) + mx))
      i += 1
    }
    val kept = out.sortBy { case (it, c, _) => (-c, it) }.take(capacity)
    x.items = kept.map(_._1).toArray
    x.counts = kept.map(_._2).toArray
    x.errors = kept.map(_._3).toArray
    x
  }

  /** (item, count, max_overestimate) sorted by count desc, item asc —
    * a deterministic total order for downstream top-k slicing. */
  override def finish(r: SpaceSavingBuf): Seq[(String, Long, Long)] =
    r.items.indices
      .sortBy(i => (-r.counts(i), r.items(i)))
      .map(i => (r.items(i), r.counts(i), r.errors(i)))

  override def bufferEncoder: Encoder[SpaceSavingBuf] =
    Encoders.product[SpaceSavingBuf]
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}
