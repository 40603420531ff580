package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
    * actually appended. */
  def append(spark: SparkSession, flat: DataFrame, path: String): Long = {
    val batch = flat
      .withColumn(partitionCol, to_date(col("utc")))
      .dropDuplicates(WeatherSchema.key)
    val fresh =
      if (exists(spark, path)) {
        val dates = batch.select(col(partitionCol)).distinct()
          .collect().map(_.getDate(0)) // bounded: micro-batches span few dates
        val existingKeys = spark.read.parquet(path)
          .filter(col(partitionCol).isin(dates.map(_.toString): _*))
          .select(WeatherSchema.key.map(col): _*)
        batch.join(existingKeys, WeatherSchema.key, "left_anti")
      } else batch
    val materialized = fresh.cache()
    try {
      val n = materialized.count()
      if (n > 0)
        materialized.write.mode(SaveMode.Append)
          .partitionBy(partitionCol).parquet(path)
      n
    } finally materialized.unpersist()
  }

  /** Date-ranged read — partition pruning does the work. */
  def readRange(spark: SparkSession, path: String,
                fromDate: String, toDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col(partitionCol) >= lit(fromDate) &&
              col(partitionCol) <= lit(toDate))

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
