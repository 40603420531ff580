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

  test("a threshold crossing is INCREMENTAL: it scans only the files " +
      "missing CBO lines, and the fold equals the full rescan's") {
    val dir = tmpDir("auto-analyze-incr")
    land(dir, 0, 10)
    ops.setTableProperty(dir, "stats.auto.rows", "50")
    ops.setTableProperty(dir, "stats.auto.cols", "id,k")
    // crossing #1 (acc 70 >= 50): every head file lacks CBO lines, so
    // this first pass legitimately scans the whole head
    val vA = land(dir, 10, 80)
    val mark = ops.statsFilesScanned.get()
    land(dir, 80, 100) // acc 20 < 50: no ANALYZE (and, unpartitioned,
    // the landing's own bounds pass reads footers, not statsLines — the
    // counter window below contains ONLY the crossing's ANALYZE scan)
    val v3 = land(dir, 100, 160) // acc 80 >= 50: crossing #2
    val added = ops.filesOf(dir, v3).toSet -- ops.filesOf(dir, vA).toSet
    val scanned = ops.statsFilesScanned.get() - mark
    assert(scanned == added.size,
      s"incremental ANALYZE must scan only the ${added.size} files " +
        s"landed since the last pass, not the whole head ($scanned)")
    // fold equality: the kept per-file sketches fold to exactly what a
    // full rescan derives (HLL is order-insensitive and deterministic,
    // null counts exact) — "incremental" changes cost, never answers
    val incr = ops.columnStatsOf(dir, v3)
    ops.writeStats(spark, dir, v3, Seq("id", "k")) // the full-rescan door
    val full = ops.columnStatsOf(dir, v3)
    assert(incr == full,
      s"incremental fold $incr must equal the full-rescan fold $full")
    assert(incr.get("id").exists { case (nulls, ndv) =>
      nulls.contains(0L) && ndv.exists(n => math.abs(n - 160) <= 6)
    }, s"crossing #2 must serve fresh whole-snapshot stats: $incr")
    assert(incr.get("k").exists(_._2.exists(n => math.abs(n - 7) <= 1)))
  }

  test("racing committers never lose an increment: the accumulated " +
      "count equals the rows landed") {
    val dir = tmpDir("auto-analyze-race")
    land(dir, 0, 10)
    // threshold far above what the race lands: no crossing consumes
    ops.setTableProperty(dir, "stats.auto.rows", "1000000")
    ops.setTableProperty(dir, "stats.auto.cols", "id")
    val threads = 8
    val rowsEach = 25
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val tasks = (0 until threads).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val lo = 100 + i * rowsEach
            land(dir, lo, lo + rowsEach); ()
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    val pending = ops.analyzePendingRows(dir)
    assert(pending == threads.toLong * rowsEach,
      s"the delta ledger must accumulate exactly ${threads * rowsEach} " +
        s"rows across $threads racing committers, got $pending — a " +
        "read-modify-write counter would lose increments here")
  }
}
