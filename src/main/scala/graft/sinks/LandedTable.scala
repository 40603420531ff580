package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.WeatherDedup

/** The 100 TB layout of the landed `weather` table (SURVEY.md §7 "partition
  * landed table by date(utc)"): parquet partitioned by `utc_date`, so
  *
  *  - the idempotent-append dup check reads ONLY the partitions the incoming
  *    micro-batch touches (partition pruning — `PartitionFilters` in the
  *    scan, asserted in LandedTableSpec), and
  *  - time-ranged analytics prune to their date range for free.
  *
  * [[graft.core.WeatherDedup]] is the layout-agnostic single-directory
  * variant; this is the scale layout.
  */
object LandedTable {

  val partitionCol = "utc_date"

  /** Idempotent dedup-append into the partitioned layout. Returns rows
    * actually appended. Delegates to the shared
    * [[graft.core.WeatherDedup.appendImpl]] core — one implementation of
    * dedup → date-prune → anti-join → append, two layouts. */
  def append(spark: SparkSession, flat: DataFrame, path: String): Long = {
    // deterministic in-batch winner (same rule as the flat layout)
    val batch = WeatherDedup.dedupWithinBatch(flat)
      .withColumn(partitionCol, to_date(col("utc")))
    WeatherDedup.appendImpl(spark, batch, path,
      partitionCol = Some(partitionCol))
  }

  /** Backfill/restatement: dynamic partition overwrite — rewrites ONLY the
    * date partitions present in `flat`, leaving every other partition's
    * files untouched. This is the day-level recompute path a 100 TB table
    * needs: restating one day moves one day of data, not the table. The
    * batch replaces the partition wholesale (no anti-join — restatement
    * semantics, not append semantics). Returns rows written. */
  def overwriteDates(spark: SparkSession, flat: DataFrame, path: String): Long = {
    val batch = WeatherDedup.dedupWithinBatch(flat)
      .withColumn(partitionCol, to_date(col("utc")))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      val materialized = batch.cache()
      try {
        val n = materialized.count()
        if (n > 0)
          materialized.write.mode("overwrite")
            .partitionBy(partitionCol).parquet(path)
        n
      } finally materialized.unpersist()
    } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  /** Date-ranged read — partition pruning does the work. */
  def readRange(spark: SparkSession, path: String,
                fromDate: String, toDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col(partitionCol) >= lit(fromDate) &&
              col(partitionCol) <= lit(toDate))
}
