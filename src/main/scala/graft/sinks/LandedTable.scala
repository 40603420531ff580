package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.WeatherSchema

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
    val batch = flat
      .withColumn(partitionCol, to_date(col("utc")))
      .dropDuplicates(WeatherSchema.key)
    graft.core.WeatherDedup.appendImpl(spark, batch, path,
      partitionCol = Some(partitionCol))
  }

  /** Date-ranged read — partition pruning does the work. */
  def readRange(spark: SparkSession, path: String,
                fromDate: String, toDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col(partitionCol) >= lit(fromDate) &&
              col(partitionCol) <= lit(toDate))
}
