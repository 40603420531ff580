package graft.sources

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("bucketed layout joins without any shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.layoutFacts(spark, sf, buckets = 4)
      val q = Bucketing.colocatedJoin(spark)
      val plan = q.queryExecution.executedPlan.toString
      // the join itself: SortMergeJoin reading bucketed scans, no
      // ShuffleExchange anywhere below the aggregation's own exchange
      val joinPart = plan.split("SortMergeJoin").last
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
        plan)
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        plan)
      // and it still computes the right thing
      val n = q.collect().map(_.getAs[Long]("n")).sum
      assert(n == Tables.lineitem(spark, sf).count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
