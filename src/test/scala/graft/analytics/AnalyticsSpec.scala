package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** Smoke + plan-shape checks for the analytics surface. Value correctness is
  * the DuckDB oracle's job (tools/oracle_check.py); here we pin the physical
  * plans we want at scale: broadcasts where a side is small, pushed filters at
  * the parquet scan, no cartesian products anywhere.
  */
class AnalyticsSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    // rows-only by design: hash-family / LSH / recall internals that no
    // portable SQL reproduces; each has behavioral assertions in its spec.
    // (q_text_langid left this list in round 11 — the marker vote IS
    // portable: list_intersect + a CASE-chain argmax; q_quant_recall in
    // round 13 — int8 symmetric quantization is exact small-integer
    // arithmetic, replayed in DuckDB list lambdas.)
    val rowsOnly = Set("q_dedup_minhash", "q_dedup_simhash",
      "q_dedup_embedding", "q_sim_ann", "q_sim_ivf", "q_approx_distinct",
      "q_dedup_semantic", "q_dedup_incr", "q_sim_pq",
      "q_sim_ivfpq")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == rowsOnly, s"unexpected oracle coverage drift: " +
      s"missing=${noOracle -- rowsOnly} newly-covered=${rowsOnly -- noOracle}")
  }

  test("q6_filter pushes its predicates into the parquet scan") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
           p.contains("IsNotNull(l_shipdate)"), p)
  }

  test("q3_join broadcasts the filtered customer dimension") {
    assert(plan("q3_join").contains("BroadcastHashJoin"))
  }

  test("q5_join broadcasts nation and region") {
    val p = plan("q5_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("q_anti_join plans a broadcast anti join, not a shuffle of customer") {
    val p = plan("q_anti_join")
    assert(p.contains("LeftAnti"), p)
  }

  test("no query plans a cartesian product") {
    SparkEntry.queries.keys.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"), s"$name has a cartesian")
    }
  }

  test("driver smoke: entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
