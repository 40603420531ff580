package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class RelationalExtraSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within its 2% rsd envelope (×3 safety)") {
    val rows = RelationalExtra.qApproxDistinct(spark, sf).collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val approx = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"approx $approx vs exact $exact")
    }
  }

  test("bernoulli sample: seeded determinism and fraction sanity") {
    val ord = Tables.orders(spark, sf)
    val s1 = ord.sample(withReplacement = false, 0.1, seed = 42).count()
    val s2 = ord.sample(withReplacement = false, 0.1, seed = 42).count()
    assert(s1 == s2) // same seed + partitioning → identical sample
    val n = ord.count()
    assert(s1 > n / 20 && s1 < n / 5, s"sampled $s1 of $n")
  }

  test("cube emits all four grouping sets") {
    val res = RelationalExtra.qCube(spark, sf)
      .select(col("n_name").isNull.as("n1"), col("c_mktsegment").isNull.as("n2"))
      .distinct().collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1))).toSet
    assert(res == Set((false, false), (false, true), (true, false), (true, true)))
  }

  test("correlated EXISTS decorrelates to a semi join (no per-row subquery)") {
    val plan = RelationalExtra.qExistsSubquery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
  }
}
