package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VersionedTable

class ProfileGateSpec extends SparkSpec {
  import spark.implicits._

  // trusted reference shape: value ~ [0, 100], no nulls
  private def goodBatch(ids: Range): DataFrame =
    ids.map(i => (i.toLong, (i % 101).toDouble)).toDF("id", "value")

  // drifted shape: mean walked far outside the reference range
  private def shiftedBatch(ids: Range): DataFrame =
    ids.map(i => (i.toLong, 1000.0 + i)).toDF("id", "value")

  // drifted shape: null rate spiked
  private def nullyBatch(ids: Range): DataFrame =
    ids.map(i => (i.toLong,
      if (i % 2 == 0) null else java.lang.Double.valueOf(i % 101)))
      .toDF("id", "value")

  test("drift report flags mean shift and null rise, passes the clean batch") {
    val refPath = tmpDir("gate-ref")
    ProfileGate.writeReference(goodBatch(0 until 1000), Seq("value"), refPath)
    val ref = spark.read.parquet(refPath)

    def verdict(b: DataFrame): Boolean =
      ProfileGate.driftReport(
        graft.analytics.Profiling.profile(b, Seq("value")), ref,
        maxNullRise = 0.05, maxMeanShift = 0.25)
        .filter(col("drifted")).count() > 0

    assert(!verdict(goodBatch(2000 until 3000)))
    assert(verdict(shiftedBatch(0 until 1000)))
    assert(verdict(nullyBatch(0 until 1000)))
  }

  test("stream routes clean batches to out, drifted to quarantine, logs all") {
    val inDir = tmpDir("gate-in")
    val refPath = tmpDir("gate-refp")
    val outDir = tmpDir("gate-out") + "/t"
    val qDir = tmpDir("gate-quar") + "/t"
    val histDir = tmpDir("gate-hist") + "/t"
    val ckpt = tmpDir("gate-ckpt")

    ProfileGate.writeReference(goodBatch(0 until 1000), Seq("value"), refPath)

    val b1 = goodBatch(0 until 500)
    b1.write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "100").parquet(inDir)
    val q = ProfileGate.writer(stream, Seq("value"), refPath, outDir, qDir,
      histDir, ckpt).start()
    try {
      q.processAllAvailable()
      assert(VersionedTable.read(spark, outDir).count() == 500)

      shiftedBatch(500 until 900).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      // clean landing unchanged, drifted batch quarantined whole
      assert(VersionedTable.read(spark, outDir).count() == 500)
      assert(VersionedTable.read(spark, qDir).count() == 400)

      // the profile history recorded every data-bearing batch with its
      // verdict. Under load the engine may slice a source write into
      // several micro-batches (or an extra empty one) — so assert on
      // routed ROWS, which slicing cannot change, not on batch counts
      val hist = VersionedTable.read(spark, histDir)
        .filter(col("n_rows") > 0)
      assert(hist.filter(col("quarantined"))
        .agg(sum(col("n_rows"))).head().getLong(0) == 400L)
      assert(hist.filter(!col("quarantined"))
        .agg(sum(col("n_rows"))).head().getLong(0) == 500L)
    } finally q.stop()
  }

  test("a redelivered batch id no-ops: no double landing, no dup history") {
    val refPath = tmpDir("gate-ref4")
    ProfileGate.writeReference(goodBatch(0 until 1000), Seq("value"), refPath)
    val outDir = tmpDir("gate-out4") + "/t"
    val qDir = tmpDir("gate-quar4") + "/t"
    val histDir = tmpDir("gate-hist4") + "/t"
    def deliver(b: DataFrame, id: Long) =
      ProfileGate.gateBatch(b, id, Seq("value"), refPath, outDir, qDir,
        histDir, maxNullRise = 0.05, maxMeanShift = 0.25)
    // crash-window replay of a clean batch: same query, same batch id
    assert(deliver(goodBatch(0 until 200), 0L))
    assert(deliver(goodBatch(0 until 200), 0L))
    assert(VersionedTable.read(spark, outDir).count() == 200)
    // and of a drifted batch
    assert(!deliver(shiftedBatch(0 until 50), 1L))
    assert(!deliver(shiftedBatch(0 until 50), 1L))
    assert(VersionedTable.read(spark, qDir).count() == 50)
    // history holds exactly one entry per batch id
    val hist = VersionedTable.read(spark, histDir)
    assert(hist.count() == 2)
    assert(hist.select(col("batch_id")).distinct().count() == 2)
    // a genuinely new batch still lands
    assert(deliver(goodBatch(200 until 300), 2L))
    assert(VersionedTable.read(spark, outDir).count() == 300)
  }

  test("quarantined data is preserved byte-complete for re-admission") {
    val refPath = tmpDir("gate-ref3")
    ProfileGate.writeReference(goodBatch(0 until 1000), Seq("value"), refPath)
    val outDir = tmpDir("gate-out3") + "/t"
    val qDir = tmpDir("gate-quar3") + "/t"
    val histDir = tmpDir("gate-hist3") + "/t"
    val bad = shiftedBatch(0 until 50)
    val pass = ProfileGate.gateBatch(bad, 7L, Seq("value"), refPath, outDir,
      qDir, histDir, maxNullRise = 0.05, maxMeanShift = 0.25)
    assert(!pass)
    val quarantined = VersionedTable.read(spark, qDir)
    assert(quarantined.count() == 50)
    assert(quarantined.except(bad).isEmpty && bad.except(quarantined).isEmpty)
  }
}
