package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded buffer for bottom-k selection: parallel arrays sorted ascending
  * by (hash, id). At most k entries per group at any moment, map-side and
  * merge-side alike. */
case class BottomKBuf(var hashes: Array[String], var ids: Array[Long])

/** Per-group deterministic sample: the k records with the smallest
  * (hash, id) — "bottom-k by hash", the mergeable form of reservoir
  * sampling. Hashing gives every row a deterministic pseudo-random rank, so
  * bottom-k over it IS a uniform sample without an RNG; determinism makes
  * it retry-safe (a recomputed task picks the same rows — rand() would
  * not) and oracle-able (q_sample_group hash-matches a ROW_NUMBER window
  * oracle).
  *
  * The scale point is the state bound: the window formulation
  * (`row_number over (partition by g order by hash)`) sorts EVERY row of a
  * group through the shuffle to keep k of them; this aggregator's buffer
  * is ≤ k entries per group on every path — partial aggregation discards
  * non-sample rows map-side, the shuffle carries at most k·groups entries,
  * and a hot group costs the same as a cold one. That is the difference
  * between "sample 1k docs per domain" running on a 100 TB corpus and the
  * sort spilling a terabyte per hot domain.
  *
  * Ties: (hash, id) is a total order when ids are unique per group — the
  * usual case (sample BY key) — so results are exactly reproducible.
  */
class BottomKByHashAgg(k: Int)
    extends Aggregator[(String, Long), BottomKBuf, Seq[Long]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: BottomKBuf =
    BottomKBuf(Array.empty[String], Array.empty[Long])

  private def lt(h1: String, i1: Long, h2: String, i2: Long): Boolean = {
    val c = h1.compareTo(h2)
    c < 0 || (c == 0 && i1 < i2)
  }

  override def reduce(b: BottomKBuf, in: (String, Long)): BottomKBuf = {
    val (h, id) = in
    if (h == null) return b
    val n = b.hashes.length
    if (n == k && !lt(h, id, b.hashes(n - 1), b.ids(n - 1))) return b
    // insertion point (k is small — linear scan beats branch-missing bsearch)
    var pos = 0
    while (pos < n && lt(b.hashes(pos), b.ids(pos), h, id)) pos += 1
    val m = math.min(n + 1, k)
    val nh = new Array[String](m); val ni = new Array[Long](m)
    System.arraycopy(b.hashes, 0, nh, 0, pos)
    System.arraycopy(b.ids, 0, ni, 0, pos)
    nh(pos) = h; ni(pos) = id
    val tail = m - pos - 1
    if (tail > 0) {
      System.arraycopy(b.hashes, pos, nh, pos + 1, tail)
      System.arraycopy(b.ids, pos, ni, pos + 1, tail)
    }
    b.hashes = nh; b.ids = ni
    b
  }

  override def merge(x: BottomKBuf, y: BottomKBuf): BottomKBuf = {
    if (y.hashes.isEmpty) return x
    if (x.hashes.isEmpty) return y
    val m = math.min(x.hashes.length + y.hashes.length, k)
    val nh = new Array[String](m); val ni = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeX = j >= y.hashes.length || (i < x.hashes.length &&
        lt(x.hashes(i), x.ids(i), y.hashes(j), y.ids(j)))
      if (takeX) { nh(o) = x.hashes(i); ni(o) = x.ids(i); i += 1 }
      else { nh(o) = y.hashes(j); ni(o) = y.ids(j); j += 1 }
      o += 1
    }
    x.hashes = nh; x.ids = ni
    x
  }

  /** Sampled ids in hash order (ties by id) — rank via posexplode. */
  override def finish(r: BottomKBuf): Seq[Long] = r.ids.toSeq

  override def bufferEncoder: Encoder[BottomKBuf] = Encoders.product[BottomKBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
