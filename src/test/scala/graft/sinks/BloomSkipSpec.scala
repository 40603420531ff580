package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-filter file skipping on the versioned table. Range stats prune
  * range scans; they are structurally useless for a point probe on a key
  * that is hash-scattered across files (every file's [min,max] spans the
  * domain). The bloom layer answers "might this file contain this key?"
  * at planning time — and like every pruning layer here it must be a
  * SUPERSET guarantee: false positives cost a scan, false negatives are
  * forbidden. */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private val backend: TableIO = TableIO.local
  private lazy val ops = new VersionedTableOps(backend)

  private def scattered(dir: String, n: Long, files: Int): Int = {
    val df = spark.range(0, n)
      .select(col("id"), (col("id") * 3).as("payload"))
      .repartition(files, col("id"))
    val v = ops.commit(df, dir)
    ops.writeStats(spark, dir, v, Seq("id"))
    v
  }

  test("a point probe touches ~1 file of 16; range stats alone keep all") {
    val dir = tmpDir("bl-point")
    val v = scattered(dir, 20000, 16)
    // range stats CANNOT help on a hash-scattered key: every file kept
    val rangeOnly = ops.prunedFilesEq(spark, dir, v, "id", Seq(777L))
    assert(rangeOnly.size == 16, "no blooms yet: range stats span domain")

    ops.writeBlooms(spark, dir, v, Seq("id"), mBits = 1 << 16)
    val kept = ops.prunedFilesEq(spark, dir, v, "id", Seq(777L))
    assert(kept.size <= 2, s"bloom kept ${kept.size} of 16 files")
    // and the read through the pruned set is exact
    val got = ops.prunedReadIn(spark, dir, "id", Seq(777L), Some(v))
      .filter(col("id") === 777L).as[(Long, Long)].collect().toSeq
    assert(got == Seq((777L, 2331L)))
  }

  test("bitmaps are folded executor-side: the collected payload per file " +
    "is the fixed m/8-byte bitmap, not a position set") {
    // The old driver-built path collected collect_set(pos) — up to 32 bits
    // of transfer PER SET BIT per file — then trimmed trailing zero bytes
    // via BitSet.toByteArray. The executor-side Aggregator's state IS the
    // finished bitmap, so every sidecar line decodes to exactly m/8 bytes
    // regardless of fill: that fixed size is the observable pin that the
    // driver received bitmaps, not sets.
    val dir = tmpDir("bl-execside")
    val mBits = 1 << 14
    val v = scattered(dir, 5000, 4)
    ops.writeBlooms(spark, dir, v, Seq("id"), mBits = mBits)
    val lines = ops.sidecarLines(dir, v)
      .map(_.split('\t').toSeq)
      .collect { case Seq(_, "id", "bloom", cfg, b64) => (cfg, b64) }
    assert(lines.size == 4, s"expected 4 bloom lines, got ${lines.size}")
    lines.foreach { case (cfg, b64) =>
      assert(cfg == s"$mBits:5")
      val bytes = java.util.Base64.getDecoder.decode(b64)
      assert(bytes.length == mBits / 8,
        s"payload ${bytes.length}B != m/8 = ${mBits / 8}B — not the " +
          "fixed executor-built bitmap")
    }
  }

  test("superset guarantee: every probed key is found through the pruning") {
    val dir = tmpDir("bl-superset")
    val v = scattered(dir, 20000, 16)
    ops.writeBlooms(spark, dir, v, Seq("id"), mBits = 1 << 16)
    // 100 probes spread over the domain, singly and as one IN-list
    val probes = (0L until 20000L by 199L).toSeq
    probes.foreach { p =>
      val hit = ops.prunedReadIn(spark, dir, "id", Seq(p), Some(v))
        .filter(col("id") === p).count()
      assert(hit == 1L, s"bloom pruning LOST key $p")
    }
    val inList = ops.prunedReadIn(spark, dir, "id",
      probes.map(_.asInstanceOf[Any]), Some(v))
      .filter(col("id").isInCollection(probes)).count()
    assert(inList == probes.size.toLong)
    // an absent key prunes to (near) nothing and returns no rows
    val missKept = ops.prunedFilesEq(spark, dir, v, "id", Seq(999999L))
    assert(missKept.size <= 2)
    assert(ops.prunedReadIn(spark, dir, "id", Seq(999999L), Some(v))
      .filter(col("id") === 999999L).count() == 0L)
  }

  test("files without a bloom line are always kept; maintenance is " +
    "incremental over new files") {
    val dir = tmpDir("bl-incr")
    val v1 = scattered(dir, 1000, 4)
    ops.writeBlooms(spark, dir, v1, Seq("id"), mBits = 1 << 14)
    // append a new batch: its files have no blooms yet
    val v2 = ops.commit(
      spark.range(100000, 101000)
        .select(col("id"), (col("id") * 3).as("payload"))
        .repartition(2, col("id")), dir)
    // probe for a NEW-batch key: old files bloom-pruned, new files kept
    // (no bloom -> superset), so the row is found
    assert(ops.prunedReadIn(spark, dir, "id", Seq(100500L), Some(v2))
      .filter(col("id") === 100500L).count() == 1L)
    val keptBefore =
      ops.prunedFilesEq(spark, dir, v2, "id", Seq(100500L)).size
    assert(keptBefore >= 2, "unbloomed files must be kept")
    // incremental maintenance blooms ONLY the new files, then prunes them
    ops.writeBlooms(spark, dir, v2, Seq("id"), mBits = 1 << 14)
    val keptAfter =
      ops.prunedFilesEq(spark, dir, v2, "id", Seq(100500L)).size
    assert(keptAfter < keptBefore)
    assert(ops.prunedReadIn(spark, dir, "id", Seq(100500L), Some(v2))
      .filter(col("id") === 100500L).count() == 1L)
  }

  test("blooms compose with delete vectors and string keys") {
    val dir = tmpDir("bl-str")
    val df = spark.range(0, 5000)
      .select(concat(lit("doc-"), col("id")).as("doc"), col("id"))
      .repartition(8, col("doc"))
    val v1 = ops.commit(df, dir)
    ops.writeBlooms(spark, dir, v1, Seq("doc"), mBits = 1 << 16)
    val kept = ops.prunedFilesEq(spark, dir, v1, "doc", Seq("doc-4242"))
    assert(kept.size <= 2, s"string bloom kept ${kept.size} of 8")
    assert(ops.prunedReadIn(spark, dir, "doc", Seq("doc-4242"), Some(v1))
      .filter(col("doc") === "doc-4242").count() == 1L)
    // delete the row: the bloom still ADMITS the file (filters are
    // append-only evidence), but the read's vector hides the row
    ops.deleteWhere(spark, dir, col("doc") === "doc-4242")
    assert(ops.prunedReadIn(spark, dir, "doc", Seq("doc-4242"))
      .filter(col("doc") === "doc-4242").count() == 0L)
  }
}
