package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental rollup: partial state must merge to the one-pass answer in
  * any batch order, and DPP must prune the partitioned fact scan. */
class IncrementalSpec extends SparkSpec {

  private lazy val ev = graft.sources.Tables.events(spark, sf)

  test("merge(partials(A), partials(B)) equals one-pass aggregate of A ∪ B") {
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 === 1)
    val merged = Incremental.present(
      Incremental.merge(Incremental.partials(a), Incremental.partials(b)))
      .orderBy("day", "event_type").collect()
    val onePass = Incremental.present(Incremental.partials(ev))
      .orderBy("day", "event_type").collect()
    assert(merged.toSeq == onePass.toSeq)
  }

  test("merge is batch-order-insensitive (3 batches, two orders)") {
    val parts = (0 until 3).map(i =>
      Incremental.partials(ev.filter(col("event_id") % 3 === i)))
    val fwd = Incremental.present(Incremental.merge(parts: _*))
      .orderBy("day", "event_type").collect()
    val rev = Incremental.present(Incremental.merge(parts.reverse: _*))
      .orderBy("day", "event_type").collect()
    assert(fwd.toSeq == rev.toSeq)
  }

  test("state stays bounded: one row per (day, event_type) regardless of batch count") {
    val groups = ev.select(to_date(col("ts")), col("event_type"))
      .distinct().count()
    val parts = (0 until 4).map(i =>
      Incremental.partials(ev.filter(col("event_id") % 4 === i)))
    assert(Incremental.merge(parts: _*).count() == groups)
  }

  test("q_dpp_scan: fact scan carries a dynamicpruning partition filter") {
    val base = tmpDir("dpp_spec")
    val withDay = ev.withColumn("day", to_date(col("ts")))
    withDay.write.partitionBy("day").parquet(s"$base/fact")
    withDay.select(col("day")).distinct()
      .withColumn("dow", dayofweek(col("day")))
      .write.parquet(s"$base/dim")
    val df = ScaleOps.dppJoin(spark, s"$base/fact", s"$base/dim")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a runtime partition-pruning subquery on the fact scan:\n$plan")
    // parity: pruned scan loses no rows vs the static predicate
    val viaDpp = df.collect()
    val static = ev.filter(dayofweek(to_date(col("ts"))) === 2)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(Parity.decSum(col("value"), 4), 4).as("sum_v"))
      .orderBy(col("event_type")).collect()
    assert(viaDpp.toSeq == static.toSeq)
  }
}
