package graft

import org.apache.spark.sql.functions._

/** CI gate for the scale exponents — the always-on twin of the manual
  * [[Scaling]] sweep (docs/SCALING_r15.md). The r15 probe found three
  * real scale-killers (mis-broadcast exploded pair tables, INT-overflow
  * IVF seeding); an exponent table that can silently rot is where the
  * NEXT such bug hides, so the core budget is asserted per run at a
  * scale CI can afford: sf0.01 vs a deterministic 10× key-shifted
  * blowup of it (the same generator the manual sweep uses — identical
  * text across copies, so dedup candidate growth is honest).
  *
  * Each probe declares its exponent budget: a measured x10/x1 ratio
  * above budget fails the suite — a new super-linear term landed.
  * Ratio noise control: min-of-2 timings per point, and a probe whose
  * x10 point finishes under the absolute floor passes outright (in the
  * fixed-cost regime a ratio is JIT/GC noise, and a run that crosses
  * 10× the data in 2s is not hiding a scale-killer).
  *
  * The three unguarded-parity probes (q_triangles, q_curation_funnel,
  * q_dedup_cluster) stay in the MANUAL sweep only: their declared
  * exponent IS ~100× pair growth (identical text × 10 copies), so a CI
  * budget would either cost minutes or assert nothing. Everything the
  * production doors run is gated here.
  */
class ScalingGateSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.01"
  private val factor = 10
  /** x10 points under this many seconds are fixed-cost regime: pass. */
  private val FloorSec = 2.0

  private lazy val blowup: String = {
    val out = s"${tmpDir("scale-gate")}/x$factor"
    Scaling.buildBlowup(spark, base, out, factor)
    out
  }

  private def time(body: => Unit): Double = {
    def once(): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  private def timeQuery(name: String, dir: String): Double =
    time(SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save())

  /** (probe, budget): max tolerated x10/x1 ratio. Budgets sit 2–4×
    * above the r15 MEASURED exponents (SCALING_r15.md) to absorb
    * shared-machine noise while still catching a term that jumps an
    * exponent class (flat→linear is >10× at factor 10; linear→quadratic
    * is >100×). */
  private val probes = Seq(
    ("q_pagerank", 5.0), // measured 1.06× (flat)
    ("q_change_feed", 7.0), // measured 2.28× (churn-proportional)
    ("q_substr_dedup", 5.0), // measured 1.04× (map-side window hashing)
    ("q_ngram_perplexity", 6.0), // measured 1.36× (map-side term stats)
    ("q_dedup_minhash", 8.0), // measured 3.52× (banding-bounded)
    ("q_sim_ivf", 5.0), // measured 0.84× (probe-broadcast, map-side)
    ("q_sim_ivfpq", 6.0)) // measured 1.29× (map-side ADC)

  for ((q, budget) <- probes)
    test(s"scale gate: $q stays within ${budget}x at a ${factor}x blowup") {
      val t1 = timeQuery(q, base)
      val tN = timeQuery(q, blowup)
      val ratio = tN / math.max(t1, 1e-3)
      info(f"$q: x1=$t1%.2fs x$factor=$tN%.2fs ratio=$ratio%.2fx " +
        f"(budget ${budget}x)")
      assert(tN <= FloorSec || ratio <= budget,
        f"$q grew $ratio%.1fx at a ${factor}x blowup (budget ${budget}x," +
          f" x1=$t1%.2fs x$factor=$tN%.2fs) — a super-linear term " +
          "landed; profile the plan before shipping")
    }

  test("scale gate: the commit-path family (append / cdf-slice / " +
      "compact) keeps its exponents") {
    def family(dir: String): Map[String, Double] = {
      val ops = graft.sinks.VersionedTable
      val t = tmpDir("scale-gate-commit") + "/t"
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val appendSec = time { ops.commit(li, t); () }
      (1 to 3).foreach(i => ops.commit(li.limit(500)
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)),
        t))
      val cdfSec = time {
        ops.readChanges(spark, t, fromVersion = 1, toVersion = 4)
          .write.format("noop").mode("overwrite").save()
      }
      val compactSec = time {
        ops.compact(spark, t, targetBytes = 512L * 1024 * 1024); ()
      }
      Map("append" -> appendSec, "cdf_slice" -> cdfSec,
        "compact" -> compactSec)
    }
    val f1 = family(base)
    val fN = family(blowup)
    // append is O(batch) — linear in the batch we hand it (the batch IS
    // 10x bigger), so its budget is linear-with-headroom; cdf-slice is
    // O(delta) with a FIXED delta here (flat); compact is linear in
    // bytes rewritten (the measured r15 exponent)
    val budgets = Map("append" -> 25.0, "cdf_slice" -> 5.0,
      "compact" -> 30.0)
    for ((k, b) <- budgets) {
      val ratio = fN(k) / math.max(f1(k), 1e-3)
      info(f"commit_$k: x1=${f1(k)}%.2fs x$factor=${fN(k)}%.2fs " +
        f"ratio=$ratio%.2fx (budget ${b}x)")
      assert(fN(k) <= FloorSec || ratio <= b,
        f"commit_$k grew $ratio%.1fx at a ${factor}x blowup " +
          f"(budget ${b}x)")
    }
  }
}
