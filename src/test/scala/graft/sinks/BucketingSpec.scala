package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed layout: the join must be exchange-free and row-preserving. */
class BucketingSpec extends SparkSpec {

  private lazy val prepared: (String, String) = {
    val dir = tmpDir("bucket_spec")
    Bucketing.writeBucketed(
      graft.sources.Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity")),
      "spec_bkt_lineitem", s"$dir/l", "l_orderkey", nBuckets = 4)
    Bucketing.writeBucketed(
      graft.sources.Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
      "spec_bkt_orders", s"$dir/o", "o_orderkey", nBuckets = 4)
    ("spec_bkt_lineitem", "spec_bkt_orders")
  }

  test("bucket metadata survives the catalog (join-side scans read bucketed)") {
    val (lTbl, oTbl) = prepared
    // a bare scan may legitimately skip bucketed reading (autoBucketedScan
    // disables it when nothing consumes the partitioning) — the contract is
    // that a JOIN on the bucket key reads both sides bucketed
    val plan = spark.table(lTbl).hint("merge")
      .join(spark.table(oTbl).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"bucket metadata lost:\n$plan")
  }

  test("bucket-to-bucket join plans ZERO exchanges") {
    val (lTbl, oTbl) = prepared
    val joined = Bucketing.bucketJoinPlan(spark, lTbl, oTbl)
    // executedPlan of the JOIN stage only (strip the final orderBy's range
    // exchange, which is the query's presentation sort, not the join)
    val joinOnly = spark.table(lTbl).hint("merge")
      .join(spark.table(oTbl).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joinOnly.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(joined.count() > 0)
  }

  test("bucketed rewrite is row-preserving (join parity vs original parquet)") {
    val (lTbl, oTbl) = prepared
    val viaBuckets = Bucketing.bucketJoinPlan(spark, lTbl, oTbl).collect()
    val plain = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("yr"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_lines"),
        round(graft.analytics.Parity.decSum2(col("l_extendedprice")), 2)
          .as("sum_price"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("yr"), col("priority")).collect()
    assert(viaBuckets.toSeq == plain.toSeq)
  }
}
