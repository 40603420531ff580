package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for the 100 TB fact-fact join path (SURVEY.md §2
  * joins / build-prompt "co-located joins via bucketing").
  *
  * Writing both fact tables bucketed AND sorted by the join key means the
  * orders⋈lineitem join needs NO Exchange and NO Sort at read time — the
  * shuffle is paid once at layout time and amortized over every subsequent
  * join. This is the difference between re-shuffling 100 TB per query and
  * never shuffling it again.
  */
object Bucketing {

  /** Lay out `df` bucketed+sorted by `key` as a managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed: spark.sql.warehouse.dir

  /** Bucket orders + lineitem on the order key with matching bucket counts
    * (equal counts are required for the zip — mismatched counts degrade to
    * a shuffle on one side). */
  def layoutFacts(spark: SparkSession, sfDir: String, buckets: Int = 8): Unit = {
    writeBucketed(Tables.orders(spark, sfDir), "orders_b", "o_orderkey", buckets)
    writeBucketed(Tables.lineitem(spark, sfDir), "lineitem_b", "l_orderkey", buckets)
  }

  /** The co-located join: reads both bucketed tables and joins on the bucket
    * key — plan must show zero ShuffleExchange. */
  def colocatedJoin(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
  }
}
