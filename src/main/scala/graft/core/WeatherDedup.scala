package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O13 — the reference's idempotent insert (check-then-insert at
  * /root/reference/airflow/dags/weather_etl.py:156–187) re-expressed as set
  * semantics.
  *
  * The reference's guarantee: after any number of replays, the landed table
  * has at most one row per (city, utc) (:158–168, skip at :186–187). Its
  * mechanism is racy (no transaction spans the SELECT at :158 and the INSERT
  * at :170); ours is a single atomic batch append of `new ∖ existing`.
  *
  * Scale: the anti-join shuffles both sides on (city, utc) — at 100 TB the
  * existing side must be pruned first (partition the landed table by
  * date(utc) so only the incoming batch's date range is scanned) and the
  * incoming batch (tiny: 1 row/2 min in the reference) broadcasts, making
  * the "shuffle" a broadcast-anti-join with zero movement of the big side.
  * [[graft.streaming.WeatherStream]] is the bounded-state streaming variant.
  */
object WeatherDedup {

  /** Drop in-batch duplicates, keeping an explicit deterministic winner per
    * key: the row with the greatest payload in column order (row_number over
    * a total order on the non-key columns). `dropDuplicates` would keep
    * whichever row came first in physical order, which can differ across
    * retries/repartitioning when rows share (city, utc) but differ in
    * payload — this pick is stable under any physical order. Same single
    * shuffle on the key as dropDuplicates; the added intra-partition sort is
    * noise at micro-batch sizes (1 row / 2 min in the reference). */
  def dedupWithinBatch(batch: DataFrame): DataFrame = {
    val payload = batch.columns.filterNot(WeatherSchema.key.contains)
    if (payload.isEmpty) batch.dropDuplicates(WeatherSchema.key)
    else {
      val w = Window.partitionBy(WeatherSchema.key.map(col): _*)
        .orderBy(payload.map(c => col(c).desc_nulls_last): _*)
      batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** `batch ∖ existing` on the logical key — left_anti join, the exact
    * semantics of the reference's COUNT(*)==0 gate (weather_etl.py:158–168).
    * For a left_anti hash join Spark builds (and may broadcast) the right
    * side, so the big landed table must be shrunk BEFORE this join — see
    * [[idempotentAppend]]'s date pruning. */
  def newRowsOnly(batch: DataFrame, existing: DataFrame): DataFrame =
    batch.join(existing.select(WeatherSchema.key.map(col): _*),
      WeatherSchema.key, "left_anti")

  /** Idempotent append to a parquet table path. Returns rows actually
    * appended.
    *
    * Scale shape: the existing side is reduced to key columns (column
    * pruning) AND to the batch's own utc-date range (partition pruning when
    * the table is laid out by date(utc)); the incoming micro-batch is tiny
    * (1 row / 2 min in the reference), so what remains is a small build side
    * the anti-join can broadcast — no shuffle of the landed table, ever. */
  def idempotentAppend(spark: SparkSession, batch: DataFrame,
                       tablePath: String): Long =
    appendImpl(spark, dedupWithinBatch(batch), tablePath,
      partitionCol = None)

  /** Shared core for the flat ([[idempotentAppend]]) and partitioned
    * ([[graft.sinks.LandedTable]]) layouts. `batch` is already
    * in-batch-deduped; when `partitionCol` is set the batch must carry that
    * date column, the existing-side read prunes to the batch's dates through
    * it, and the write partitions by it. */
  private[graft] def appendImpl(spark: SparkSession, rawBatch: DataFrame,
                                tablePath: String,
                                partitionCol: Option[String]): Long = {
    // A NULL logical key can never satisfy the at-most-one-row-per-(city,
    // utc) invariant: the anti-join never matches NULLs, so such a row
    // would re-append on every replay. Drop them — the reference itself
    // could never land one (its transform crashes first, weather_etl.py:125).
    val batch = rawBatch.filter(
      WeatherSchema.key.map(col(_).isNotNull).reduce(_ && _))
    val dateCol = partitionCol.map(col).getOrElse(to_date(col("utc")))
    val fresh =
      if (tableExists(spark, tablePath)) {
        // Bounded driver-side collect: micro-batches span few distinct dates.
        // Null dates (permissive-mode rows with no utc) can never equal an
        // existing key, so they skip the prune list rather than NPE it.
        val dates = batch.select(dateCol.as("d")).filter(col("d").isNotNull)
          .distinct().collect().map(_.getDate(0).toString)
        val existingKeys = spark.read.parquet(tablePath)
          .filter(dateCol.cast("string").isin(dates: _*))
          .select(WeatherSchema.key.map(col): _*)
        batch.join(existingKeys, WeatherSchema.key, "left_anti")
      } else batch
    // One shot: count+write from a cached plan so the append is consistent
    // with the reported count even if the source is re-evaluated.
    val materialized = fresh.cache()
    try {
      val n = materialized.count()
      if (n > 0) {
        val w = materialized.write.mode(SaveMode.Append)
        partitionCol.fold(w)(c => w.partitionBy(c)).parquet(tablePath)
      }
      n
    } finally materialized.unpersist()
  }

  private[graft] def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
