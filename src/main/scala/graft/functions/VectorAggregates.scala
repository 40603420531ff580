package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable aggregation buffer: element-wise sums (double accumulation) and
  * the contributing vector count. Fixed-size per group — dim doubles —
  * regardless of group cardinality. */
case class VecSumBuf(var sums: Array[Double], var n: Long)

/** Typed `Aggregator` (SURVEY.md §2 UDF/UDAF surface): element-wise mean of
  * an `array<float>` column.
  *
  * This is the bounded-state replacement for the
  * `aggregate(collect_list(embedding), ...)` formulation: collect_list
  * materializes EVERY vector of a group in one buffer (unbounded state — a
  * hot group at 100 TB OOMs an executor), while this buffer is dim doubles
  * + a long, partial-aggregated map-side and merged associatively like any
  * built-in. Mismatched vector lengths throw (same fail-loudly contract as
  * the LSH kernels); null inputs are skipped like built-in aggregates. */
class VectorMeanAgg extends Aggregator[Seq[Float], VecSumBuf, Seq[Float]] {
  override def zero: VecSumBuf = VecSumBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecSumBuf, in: Seq[Float]): VecSumBuf = {
    if (in == null) return b
    if (b.n == 0L && b.sums.isEmpty) b.sums = new Array[Double](in.length)
    require(in.length == b.sums.length,
      s"vector_mean: dimension ${in.length} != ${b.sums.length}")
    var i = 0
    while (i < b.sums.length) { b.sums(i) += in(i); i += 1 }
    b.n += 1L
    b
  }

  override def merge(x: VecSumBuf, y: VecSumBuf): VecSumBuf = {
    if (y.n == 0L) return x
    if (x.n == 0L) return y
    require(x.sums.length == y.sums.length,
      s"vector_mean: merging dimension ${y.sums.length} != ${x.sums.length}")
    var i = 0
    while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(r: VecSumBuf): Seq[Float] =
    if (r.n == 0L) null
    else {
      val out = new Array[Float](r.sums.length)
      var i = 0
      while (i < out.length) { out(i) = (r.sums(i) / r.n).toFloat; i += 1 }
      out.toSeq
    }

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
  override def outputEncoder: Encoder[Seq[Float]] = ExpressionEncoder[Seq[Float]]()
}

object VectorAggregates {
  /** vector_mean(emb): element-wise mean of an array<float> column —
    * fixed-size mergeable state, usable anywhere a built-in aggregate is. */
  def vector_mean(emb: Column): Column =
    udaf(new VectorMeanAgg).apply(emb)
}
