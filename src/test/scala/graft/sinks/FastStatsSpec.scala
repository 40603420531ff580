package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Metadata-only aggregates: COUNT(*) from parquet footers minus delete
  * vectors, MIN/MAX folded from the stats sidecar — each cross-checked
  * against the scan answer, with every refuse-and-fall-back edge pinned. */
class FastStatsSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  test("fastCount: footers minus vectors == scan count; eq-dels refuse") {
    val dir = tmpDir("fc")
    ops.commit((0 until 300).map(i => (i.toLong, s"s$i")).toDF("id", "s"),
      dir)
    ops.commit((300 until 500).map(i => (i.toLong, s"s$i")).toDF("id", "s"),
      dir)
    assert(ops.fastCount(spark, dir) == 500L)
    // positional deletes are exact metadata: one vector row = one dead row
    ops.deleteWhere(spark, dir, col("id") % 10 === 0)
    assert(ops.fastCount(spark, dir) == ops.read(spark, dir).count())
    // pinned versions count at their own vintage
    assert(ops.fastCount(spark, dir, Some(1)) == 300L)
    // unmaterialized equality deletes are data-dependent: refuse loudly
    ops.deleteByKeys(spark, dir, "id", Seq(7L, 7777L).toDF("id"))
    val e = intercept[IllegalArgumentException] { ops.fastCount(spark, dir) }
    assert(e.getMessage.contains("equality deletes"))
  }

  test("fastCount is a pure sidecar fold on a counted lineage: zero " +
    "footer opens across append, clustered, delete, compact, rollback") {
    // Every commit path records per-file `rows` sidecar lines at the
    // moment it writes the files, so COUNT(*) at read time must open
    // NOTHING — at 100 TB, per-call footer IO (10^5-10^6 serial remote
    // opens) is the difference between a metadata answer and minutes.
    val dir = tmpDir("fc-sidecar")
    ops.commit((0 until 300).map(i => (i.toLong, i * 2.0)).toDF("id", "v"),
      dir)
    ops.commitClustered(
      (300 until 600).map(i => (i.toLong, i * 2.0)).toDF("id", "v"),
      dir, zCols = Seq("id"), statCols = Seq("id"), numFiles = 2)
    ops.deleteWhere(spark, dir, col("id") % 7 === 0)
    ops.compact(spark, dir, targetBytes = 1L << 20)
    ops.commit((600 until 700).map(i => (i.toLong, i * 2.0)).toDF("id", "v"),
      dir)
    val rolled = ops.rollback(dir, ops.versions(dir).last)
    val expected = ops.read(spark, dir).count()
    val before = ops.footerReads.get()
    assert(ops.fastCount(spark, dir) == expected)
    assert(ops.fastCount(spark, dir, Some(rolled)) == expected)
    assert(ops.footerReads.get() == before,
      s"fastCount opened ${ops.footerReads.get() - before} footer(s) on " +
        "a fully counted lineage — the sidecar fold regressed to file IO")
    // pre-upgrade manifests (no rows lines) still answer correctly,
    // through the footer fallback — correctness never depends on the
    // sidecar, only the IO profile does
    TableIO.local.delete(s"$dir/manifests/s$rolled")
    assert(ops.fastCount(spark, dir, Some(rolled)) == expected)
    assert(ops.footerReads.get() > before, "fallback path not exercised")
  }

  test("fastMinMax: sidecar fold == scan extremes; edges fall back") {
    val dir = tmpDir("fmm")
    val df1 = (10 until 200).map(i => (i.toLong, s"w${i % 7}"))
      .toDF("id", "w")
    val df2 = (200 until 420).map(i => (i.toLong, s"w${i % 9}"))
      .toDF("id", "w")
    ops.commit(df1, dir)
    ops.writeStats(spark, dir, 1, Seq("id", "w"))
    // a file without a stats line → None (never guess)
    ops.commit(df2, dir)
    assert(ops.fastMinMax(dir, "id").isEmpty)
    ops.writeStats(spark, dir, 2, Seq("id", "w"))
    assert(ops.fastMinMax(dir, "id").contains(("num", "10", "419")))
    val Some(("str", lo, hi)) = ops.fastMinMax(dir, "w")
    assert(lo == "w0" && hi == "w8")
    // delete debt makes the bound an enclosure, not the answer → None
    ops.deleteWhere(spark, dir, col("id") === 419L)
    assert(ops.fastMinMax(dir, "id").isEmpty)
    // but the pinned pre-delete version still answers
    assert(ops.fastMinMax(dir, "id", Some(2))
      .contains(("num", "10", "419")))
  }

  test("fastMinMax ignores all-null files, refuses all-null columns") {
    val dir = tmpDir("fmm-null")
    ops.commit(Seq((1L, Option("a")), (2L, Option("b"))).toDF("id", "s"),
      dir)
    ops.commit(Seq((3L, Option.empty[String])).toDF("id", "s"), dir)
    ops.writeStats(spark, dir, 2, Seq("s"))
    // the all-null file contributes nothing; the answer is the other file
    assert(ops.fastMinMax(dir, "s").contains(("str", "a", "b")))
    val nulls = tmpDir("fmm-allnull")
    ops.commit(Seq((1L, Option.empty[String])).toDF("id", "s"), nulls)
    ops.writeStats(spark, nulls, 1, Seq("s"))
    assert(ops.fastMinMax(nulls, "s").isEmpty)
  }

  test("statsLines chunking: a many-file ANALYZE folds identically to " +
      "one pass, including across a schema-evolution boundary") {
    val ops = VersionedTable
    val dir = tmpDir("fs-chunk")
    // 10 single-file commits; files 0-4 lack column `v` entirely (the
    // pre-ADD shape an evolved table's history has)
    (0 until 5).foreach { b =>
      ops.commit((0 until 40).map(i => (b * 40L + i))
        .toDF("id").coalesce(1), dir)
    }
    (5 until 10).foreach { b =>
      ops.commit((0 until 40).map(i => (b * 40L + i, (b * 40 + i) * 1.5))
        .toDF("id", "v").coalesce(1), dir)
    }
    val head = ops.versions(dir).last
    def analyze(): (Map[String, (Option[Long], Option[Long])],
        Map[String, (Long, Long)]) = {
      ops.writeStats(spark, dir, head, Seq("id"))
      (ops.columnStatsOf(dir, head), ops.lenStatsOf(dir, head))
    }
    val one = analyze()
    val chunked = ops.withStatsChunkFiles(3) { // force 4 chunks over 10 files
      analyze()
    }
    assert(chunked == one,
      s"chunked ANALYZE must fold identically: $chunked vs $one")
    assert(one._1.get("id").exists(_._1.contains(0L)),
      s"exact null count must survive: ${one._1}")
    assert(one._1.get("id").exists(_._2.exists(n => math.abs(n - 400) <= 10)),
      s"NDV must cover all files: ${one._1}")
  }

  test("cboFold cache is LRU: a hot table's folds survive an " +
      "unrelated-table storm") {
    // The round-10 shape was clear-all past 512 entries: one storm of
    // queries over throwaway tables momentarily re-heapified EVERY hot
    // table's sketches. Access-ordered eviction must keep a fold that
    // stays in use while cold storm entries churn through.
    val hot = tmpDir("cbo-hot")
    ops.commit((0 until 50).map(i => (i.toLong, i * 1.5)).toDF("id", "v"),
      hot)
    ops.writeStats(spark, hot, 1, Seq("id", "v"))
    ops.columnStatsOf(hot, 1) // prime the hot fold
    assert(ops.cboFoldCacheKeysFor(Set(hot)) >= 1)
    // 600 distinct cold keys (> the 512 cap) from a throwaway table —
    // distinct numBins values key distinct folds, so the storm is 600
    // cheap driver-side sidecar folds, no 600-table churn. The hot fold
    // is touched every 50 — that is what "hot" means — and must never
    // evict.
    val storm = tmpDir("cbo-storm")
    ops.commit((0 until 20).map(i => (i.toLong, i * 2.0)).toDF("id", "v"),
      storm)
    ops.writeStats(spark, storm, 1, Seq("id"))
    (0 until 600).foreach { i =>
      ops.histogramsOf(storm, 1, numBins = i + 2)
      if (i % 50 == 0) ops.columnStatsOf(hot, 1)
    }
    assert(ops.cboFoldCacheKeysFor(Set(hot)) >= 1,
      "the hot table's fold was evicted by an unrelated-table storm — " +
        "eviction regressed from LRU to clear-all")
  }
}
