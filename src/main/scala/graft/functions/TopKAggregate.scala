package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded buffer for top-k selection: parallel arrays sorted by
  * (score DESC, id ASC). At most k entries per group at any moment,
  * map-side and merge-side alike. */
case class TopKBuf(var scores: Array[Double], var ids: Array[Long])

/** Per-group top-k by score with bounded state — the aggregator form of
  * `row_number() over (partition by g order by score desc, id)` ≤ k.
  *
  * The scale point is the same one [[BottomKByHashAgg]] makes for sampling:
  * the window formulation sorts EVERY row of a group through the shuffle to
  * keep k of them — under a hot group (one event type carrying 10⁹ of the
  * 10¹⁰ rows) that is a single reducer sorting a terabyte. This aggregator's
  * buffer is ≤ k entries per group on every path: partial aggregation
  * discards non-contenders map-side, the shuffle carries at most k·groups
  * (score, id) pairs, and a hot group costs the same as a cold one. "Top 100
  * per domain over the crawl" becomes a map-side scan plus a k·|domains|-row
  * shuffle instead of a corpus-wide sort.
  *
  * Determinism: (score DESC, id ASC) is a total order when ids are unique
  * within a group — results are exactly reproducible (retry-safe) and
  * oracle-able against the ROW_NUMBER window formulation (q_topk_group
  * hash-matches it).
  */
class TopKByScoreAgg(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: TopKBuf = TopKBuf(Array.empty[Double], Array.empty[Long])

  /** true iff (s1, i1) ranks strictly before (s2, i2): higher score first,
    * ties to the smaller id. */
  private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf = {
    val (s, id) = in
    if (s.isNaN) return b // NaN never ranks (same as ORDER BY ... DESC NULLS LAST for undefined scores)
    val n = b.scores.length
    if (n == k && !before(s, id, b.scores(n - 1), b.ids(n - 1))) return b
    // insertion point (k is small — linear scan beats branch-missing bsearch)
    var pos = 0
    while (pos < n && before(b.scores(pos), b.ids(pos), s, id)) pos += 1
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m); val ni = new Array[Long](m)
    System.arraycopy(b.scores, 0, ns, 0, pos)
    System.arraycopy(b.ids, 0, ni, 0, pos)
    ns(pos) = s; ni(pos) = id
    val tail = m - pos - 1
    if (tail > 0) {
      System.arraycopy(b.scores, pos, ns, pos + 1, tail)
      System.arraycopy(b.ids, pos, ni, pos + 1, tail)
    }
    b.scores = ns; b.ids = ni
    b
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    if (y.scores.isEmpty) return x
    if (x.scores.isEmpty) return y
    val m = math.min(x.scores.length + y.scores.length, k)
    val ns = new Array[Double](m); val ni = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeX = j >= y.scores.length || (i < x.scores.length &&
        before(x.scores(i), x.ids(i), y.scores(j), y.ids(j)))
      if (takeX) { ns(o) = x.scores(i); ni(o) = x.ids(i); i += 1 }
      else { ns(o) = y.scores(j); ni(o) = y.ids(j); j += 1 }
      o += 1
    }
    x.scores = ns; x.ids = ni
    x
  }

  /** (score, id) pairs in rank order — rank via posexplode. */
  override def finish(r: TopKBuf): Seq[(Double, Long)] =
    r.scores.zip(r.ids).toSeq

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
