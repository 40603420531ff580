package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Join-strategy hints: at 100 TB the difference between broadcast, shuffle
  * hash, and sort-merge is the difference between minutes and hours — the
  * engine must honor an explicit strategy choice when the stats-based pick
  * is wrong (stale stats, skew the optimizer can't see). */
class JoinHintsSpec extends SparkSpec {

  private def planFor(hint: String): String = {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    orders.join(customer.hint(hint),
      orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
  }

  test("broadcast hint plans a BroadcastHashJoin") {
    assert(planFor("broadcast").contains("BroadcastHashJoin"))
  }

  test("merge hint plans a SortMergeJoin") {
    assert(planFor("merge").contains("SortMergeJoin"))
  }

  test("shuffle_hash hint plans a ShuffledHashJoin") {
    assert(planFor("shuffle_hash").contains("ShuffledHashJoin"))
  }
}
