package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join: the runtime half of the skew story (the compile-time
  * half, two-stage salting, is spec-proven in AdvancedSpec/Salting). A
  * hash-partitioned join with one hot key lands a partition orders of
  * magnitude above the median; AQE's OptimizeSkewedJoin splits it into
  * sub-partitions at runtime — no salting code, no plan changes — which is
  * the 100 TB answer for skew you did NOT anticipate.
  */
class SkewJoinSpec extends SparkSpec {

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a skewed sort-merge join") {
    import spark.implicits._
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      // coalescing would merge the split back below the advisory size
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // 80% of rows on key 0; the payload is a per-row hash — shuffle
      // sizes are COMPRESSED bytes, so a constant pad would deflate to
      // nothing and never cross the skew threshold
      val left = spark.range(0, 200000).select(
        when(col("id") % 5 =!= 0, lit(0L))
          .otherwise(col("id") % 50 + 1).as("k"),
        sha2(col("id").cast("string"), 256).as("pad"))
      val right = (0L until 51L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // collect (not count) so THIS plan executes and finalizes — count()
      // builds its own derived aggregate plan and leaves this one initial
      val n = joined.collect().length
      assert(n == 200000) // every left row matches exactly one dim row
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // OptimizeSkewedJoin marks the exec node when it split something
      assert(plan.contains("skew=true"), plan.take(4000))
    }
  }
}
