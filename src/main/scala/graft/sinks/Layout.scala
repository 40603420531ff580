package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftExpressions, InterleaveBits, RankBucket}

/** Z-order (multi-dimensional clustering) layout for parquet tables.
  *
  * Partition pruning handles ONE column; every other selective predicate
  * on a 100 TB table lives or dies by parquet row-group min/max stats, and
  * those only prune if the data is clustered on the filtered columns.
  * Sorting by a single column clusters that column alone; interleaving the
  * quantile-bucket bits of several columns into one Morton code and
  * range-sorting by it gives every interleaved dimension locality, so a
  * 2-D box predicate skips all but a few files instead of decoding the
  * whole table. (Same layout idea as public lakehouse OPTIMIZE ZORDER
  * implementations; here it is a pure DataFrame rewrite.)
  *
  * Mechanics — three bounded steps, one data shuffle:
  *  1. ONE `approxQuantile` pass computes (2^bits − 1) equi-depth
  *     boundaries per dimension (driver state: nDims · 2^bits doubles —
  *     KBs, the same bounded-model-state shape as the IVF centroids);
  *  2. a fused map-side kernel ([[RankBucket]] binary search +
  *     [[InterleaveBits]]) turns each row into a 63-bit z-code — O(1) plan
  *     size regardless of bucket count;
  *  3. `repartitionByRange` on the z-code (sampled range boundaries, one
  *     shuffle) + `sortWithinPartitions` (fused into the shuffle sort)
  *     writes `numFiles` files, each covering a compact z-range.
  */
object Layout {

  private val ZCol = "__graft_zval"

  /** The z-code column for `dims` of `df`: equi-depth rank buckets per dim
    * (boundaries from one approxQuantile pass over `df`), bits interleaved
    * dim-0-most-significant. Dims must be castable to double; an all-NULL
    * dim throws (empty quantile array). NULL values bucket to 0. */
  def zvalue(df: DataFrame, dims: Seq[String], bitsPerDim: Int): Column = {
    require(dims.nonEmpty, "zvalue needs at least one dimension")
    require(dims.size * bitsPerDim <= 63,
      s"${dims.size} dims x $bitsPerDim bits exceeds 63")
    val nBuckets = 1 << bitsPerDim
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // rank error of a quarter-bucket keeps neighboring buckets honest
    // without a second data pass
    val err = math.max(1e-4, 0.25 / nBuckets)
    val doubled = dims.foldLeft(df)((d, c) =>
      d.withColumn(c + "__gd", col(c).cast("double")))
    val bounds = doubled.stat
      .approxQuantile(dims.map(_ + "__gd").toArray, probs, err)
    val buckets = dims.zip(bounds).map { case (c, bs) =>
      GraftExpressions.column(RankBucket(
        GraftExpressions.expression(col(c).cast("double")), bs))
    }
    GraftExpressions.column(InterleaveBits(
      GraftExpressions.expression(array(buckets: _*)), bitsPerDim))
  }

  /** Rewrites `df` to `path` as `numFiles` parquet files z-ordered on
    * `dims`. Row set is byte-identical to the input — only layout changes.
    * One quantile pass + one range shuffle; the z-code is dropped before
    * the write (it is derivable, and stats on the real columns are what
    * prune). Callers compacting an ingestion table should prefer this over
    * [[Compaction]] when queries filter on known columns. */
  def writeZordered(df: DataFrame, dims: Seq[String], path: String,
                    numFiles: Int, bitsPerDim: Int = 8): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn(ZCol, zvalue(df, dims, bitsPerDim))
      .repartitionByRange(numFiles, col(ZCol))
      .sortWithinPartitions(ZCol)
      .drop(ZCol)
      .write.mode("overwrite").parquet(path)
  }
}
