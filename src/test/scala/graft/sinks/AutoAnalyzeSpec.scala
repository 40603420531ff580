package graft.sinks

import graft.SparkSpec

/** Landing-cadence auto-ANALYZE (`stats.auto.rows`): the commit that
  * crosses the row threshold pays one writeStats pass — CBO stats serve
  * with no CALL — and the advisory counter resets so refreshes amortize
  * over the configured cadence. */
class AutoAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def land(dir: String, lo: Int, hi: Int): Int =
    ops.commit((lo until hi).map(i => (i.toLong, s"k${i % 7}"))
      .toDF("id", "k"), dir)

  test("the landing that crosses stats.auto.rows ANALYZEs with no CALL; " +
      "under-threshold landings never pay the pass") {
    val dir = tmpDir("auto-analyze")
    land(dir, 0, 10) // property set after birth, like any ALTER
    ops.setTableProperty(dir, "stats.auto.rows", "100")
    ops.setTableProperty(dir, "stats.auto.cols", "id")
    val v1 = land(dir, 10, 70) // acc 60 < 100: no ANALYZE
    assert(ops.columnStatsOf(dir, v1).isEmpty,
      "an under-threshold landing must not pay the ANALYZE pass")
    val v2 = land(dir, 70, 130) // acc 120 >= 100: ANALYZE rides the landing
    val served = ops.columnStatsOf(dir, v2)
    assert(served.get("id").exists { case (nulls, ndv) =>
      nulls.contains(0L) && ndv.exists(n => math.abs(n - 130) <= 5)
    }, s"threshold crossing must serve CBO stats with no CALL: $served")
    // the counter reset: the next small landing is under threshold again,
    // so its new files carry no CBO lines and the whole-snapshot fold
    // goes stale (correctly — stale means unpriced, never wrong)
    val v3 = land(dir, 130, 140)
    assert(ops.columnStatsOf(dir, v3).isEmpty,
      "the advisory counter must reset after a pass")
    // and the cadence repeats: crossing again refreshes over ALL files
    val v4 = land(dir, 140, 240)
    assert(ops.columnStatsOf(dir, v4).get("id")
      .exists(_._2.exists(n => math.abs(n - 240) <= 8)),
      "the next crossing must re-ANALYZE the whole head")
  }

  test("a table without the property never pays or counts") {
    val dir = tmpDir("auto-analyze-off")
    val v = land(dir, 0, 500)
    assert(ops.columnStatsOf(dir, v).isEmpty)
  }
}
