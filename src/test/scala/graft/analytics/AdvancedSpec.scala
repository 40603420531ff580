package graft.analytics

import graft.SparkSpec

/** Plan-shape and semantics checks for the round-2 analytics tranche.
  * Value correctness is the DuckDB oracle's job (Verify gate); these
  * assert the physical plans have the 100 TB-sane shapes the Scaladocs
  * claim. */
class AdvancedSpec extends SparkSpec {

  test("range join broadcasts the band table (no shuffle of the fact side)") {
    val plan = Advanced.qRangeJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("grouping sets expand once — one aggregate pass, not one per set") {
    val plan = Advanced.qGroupingSets(spark, sf).queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).size == 1, plan)
  }

  test("salted agg: stage-1 partials spread a key over 16 sub-keys and recombine exactly") {
    import org.apache.spark.sql.functions._
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag")).collect().toSeq
    val salted = Advanced.qSaltedAgg(spark, sf).collect().toSeq
    assert(salted == direct)
  }

  test("merge upsert actions partition the key space (n_update + n_insert = |updates|)") {
    val rows = Advanced.qMergeUpsert(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every update key exists in the snapshot; every insert key does not
    val nSource = graft.sources.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 97 === 0).count()
    assert(rows("update") == nSource, rows)
    assert(rows("insert") == nSource, rows)
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(rows("keep") == total - nSource, rows)
  }

  test("unpivot emits 3 metrics per flag, no nulls") {
    val df = Advanced.qUnpivot(spark, sf)
    val n = df.count()
    val flags = df.select("l_returnflag").distinct().count()
    assert(n == flags * 3, s"n=$n flags=$flags")
    assert(df.filter(df("value").isNull).count() == 0)
  }
}
