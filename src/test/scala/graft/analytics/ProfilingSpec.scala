package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class ProfilingSpec extends SparkSpec {

  test("profile reports exact basic stats on a known corpus") {
    val li = Tables.lineitem(spark, sf)
    val p = Profiling.profile(li, Seq("l_quantity"), exactDistinct = true)
      .collect().head
    val n = li.count()
    assert(p.getAs[String]("col_name") == "l_quantity")
    assert(p.getAs[Long]("n_rows") == n)
    assert(p.getAs[Long]("n_null") == 0L)
    assert(p.getAs[Long]("n_distinct") ==
      li.select(countDistinct(col("l_quantity"))).collect().head.getLong(0))
    assert(p.getAs[Double]("min_v") == 1.0)
  }

  test("constraint checks read directly off the profile artifact") {
    // Deequ-style gate: uniqueness of the key, completeness of a measure.
    val o = Tables.orders(spark, sf)
    val p = Profiling.profile(o, Seq("o_orderkey"), exactDistinct = true)
      .collect().head
    assert(p.getAs[Long]("n_distinct") == p.getAs[Long]("n_rows"),
      "o_orderkey is not unique")
    assert(p.getAs[Long]("n_null") == 0L, "o_orderkey has nulls")
  }

  test("nulls are counted, not silently dropped from stats") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, Long)]((1.0, 1L), (null, 2L), (3.0, 3L))
      .toDF("x", "id")
    val p = Profiling.profile(df, Seq("x"), exactDistinct = true)
      .collect().head
    assert(p.getAs[Long]("n_rows") == 3L)
    assert(p.getAs[Long]("n_null") == 1L)
    assert(p.getAs[Long]("n_distinct") == 2L)
    assert(p.getAs[Double]("avg_v") == 2.0) // mean over non-null values
  }

  test("approx mode plans one scan with NO Expand and partial aggregation") {
    val plan = Profiling.profile(Tables.lineitem(spark, sf),
        Seq("l_quantity", "l_discount", "l_tax"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan) // partial+final
    assert("FileScan".r.findAllIn(plan).size == 1, plan)
  }

  test("approx distinct stays within a few percent of exact at sf0.001") {
    val li = Tables.lineitem(spark, sf)
    val approx = Profiling.profile(li, Seq("l_extendedprice"))
      .collect().head.getAs[Long]("n_distinct")
    val exact = li.select(countDistinct(col("l_extendedprice")))
      .collect().head.getLong(0)
    // default HLL++ rsd is 5% — 10% is a deterministic-seed-safe bound
    assert(math.abs(approx - exact).toDouble / exact < 0.10,
      s"approx=$approx exact=$exact")
  }
}
