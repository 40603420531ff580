package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The `#rows=` sidecar header — exact snapshot totals maintained
  * incrementally by every commit path, so COUNT(*) and plan-time
  * statistics are O(1) raw-line reads instead of O(table-files) folds.
  * The invariant under test, across every mutation the protocol offers:
  * the header NEVER disagrees with a full scan, and when it cannot be
  * maintained exactly it is ABSENT (fold fallback), never stale. */
class RowTotalsSpec extends SparkSpec {
  import spark.implicits._

  private val backend: TableIO = TableIO.local
  private lazy val ops = new VersionedTableOps(backend)

  private class CountingIO extends LocalTableIO {
    val reads = scala.collection.mutable.ArrayBuffer[String]()
    override def readLines(path: String): Seq[String] = {
      reads.synchronized { reads += path }
      super.readLines(path)
    }
    def segReads: Seq[String] =
      reads.synchronized { reads.filter(_.contains("/segs/")).toSeq }
  }

  private def batch(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id"), (col("id") % 9).as("k"),
      (col("id") % 100).cast("double").as("v"))

  /** The one check that matters, after every step. */
  private def pin(dir: String, step: String): Unit = {
    val truth = ops.read(spark, dir).count()
    assert(ops.fastCount(spark, dir) == truth,
      s"[$step] fastCount != scan count")
    val head = ops.versions(dir).last
    val hdr = ops.rowsHeaderOf(dir, head)
    assert(hdr.isDefined, s"[$step] header missing at head v$head")
    assert(hdr.map { case (d, del) => d - del }.contains(truth),
      s"[$step] header ${hdr.get} disagrees with scan $truth")
  }

  test("the header survives (and stays exact through) every mutation " +
    "path: append, clustered, MOR delete/update, COW merge, compact, " +
    "zorder, CDC apply, rollback, overwrite") {
    val dir = tmpDir("rt-chain")
    ops.commit(batch(0, 500).repartition(2), dir); pin(dir, "commit v1")
    ops.commit(batch(500, 1000).repartition(3), dir); pin(dir, "commit v2")
    ops.commitClustered(batch(1000, 2000), dir, zCols = Seq("id"),
      statCols = Seq("id"), numFiles = 4); pin(dir, "clustered")
    ops.deleteWhere(spark, dir, col("id") % 10 === 3); pin(dir, "deleteWhere")
    ops.updateWhere(spark, dir, col("id") % 10 === 4,
      Map("v" -> lit(-1.0))); pin(dir, "updateWhere")
    ops.merge(spark, dir,
      batch(1990, 2100).withColumn("v", lit(7.0)), "id"); pin(dir, "merge")
    ops.compact(spark, dir, targetBytes = 1L << 30); pin(dir, "compact")
    ops.optimizeZorder(spark, dir, zCols = Seq("id", "k"), numFiles = 4)
    pin(dir, "zorder")
    val changes = batch(0, 30).withColumn("op",
      when(col("id") < 10, "d").otherwise("u"))
    ops.mergeChanges(spark, dir, changes, "id"); pin(dir, "mergeChanges")
    val head = ops.versions(dir).last
    ops.rollback(dir, head - 2); pin(dir, "rollback")
    ops.commit(batch(5000, 5050), dir, append = false); pin(dir, "overwrite")
    ops.commit(batch(5050, 5100), dir); pin(dir, "append after overwrite")
  }

  test("COUNT(*) is O(1) metadata: the header answers from raw reads " +
    "alone — zero segment opens, zero data-file IO") {
    val dir = tmpDir("rt-o1")
    (0 until 6).foreach(i => ops.commit(batch(i * 100, i * 100 + 100), dir))
    ops.deleteWhere(spark, dir, col("id") < 50)
    val cio = new CountingIO
    val cops = new VersionedTableOps(cio)
    assert(cops.fastCount(spark, dir) == 550L)
    assert(cio.segReads.isEmpty,
      s"header-served COUNT(*) must open no segments: ${cio.segReads}")
    assert(cops.statNumRows(dir, ops.versions(dir).last).contains(550L))
  }

  test("equality-delete debt: fastCount refuses while the count is " +
    "data-dependent; compact restores the header exactly") {
    val dir = tmpDir("rt-eqdel")
    ops.commit(batch(0, 300), dir)
    ops.deleteByKeys(spark, dir, "id", Seq(5L, 7L, 5000L).toDF("id"))
    intercept[IllegalArgumentException] { ops.fastCount(spark, dir) }
    // the carried header is still the PRE-debt totals (exact for the
    // data/vector layers the header tracks) — and statNumRows reports
    // unknown under debt rather than serving it
    assert(ops.statNumRows(dir, ops.versions(dir).last).isEmpty)
    ops.compact(spark, dir, targetBytes = 1L << 30)
    pinAfterCompact(dir)
  }
  private def pinAfterCompact(dir: String): Unit = {
    val truth = ops.read(spark, dir).count()
    assert(truth == 298L)
    assert(ops.fastCount(spark, dir) == truth)
    assert(ops.rowsHeaderOf(dir, ops.versions(dir).last)
      .map { case (d, del) => d - del }.contains(truth))
  }

  test("legacy tables: no header → exact fold fallback; the next append " +
    "or a writeStats pass restores O(1)") {
    val dir = tmpDir("rt-legacy")
    ops.commit(batch(0, 200).repartition(2), dir)
    // simulate a pre-header sidecar: strip the header line
    val head = ops.versions(dir).last
    val sp = s"$dir/manifests/s$head"
    backend.writeLines(sp,
      backend.readLines(sp).filterNot(_.startsWith("#rows=")))
    assert(ops.rowsHeaderOf(dir, head).isEmpty)
    assert(ops.fastCount(spark, dir) == 200L) // fold fallback, still exact
    // upgrade on append: the carry folds the legacy sidecar ONCE
    ops.commit(batch(200, 250), dir)
    pin2(dir, 250L)
    // and writeStats re-derives it in place
    val h2 = ops.versions(dir).last
    backend.writeLines(s"$dir/manifests/s$h2",
      ops.sidecarLines(dir, h2).filterNot(_.startsWith("#rows=")))
    ops.writeStats(spark, dir, h2, Seq("id"))
    pin2(dir, 250L)
  }
  private def pin2(dir: String, want: Long): Unit = {
    assert(ops.fastCount(spark, dir) == want)
    assert(ops.rowsHeaderOf(dir, ops.versions(dir).last)
      .map { case (d, del) => d - del }.contains(want))
  }

  test("branch lineages keep their own totals; fast-forward and WAP " +
    "promote carry them to the new owner") {
    val dir = tmpDir("rt-branch")
    ops.commit(batch(0, 100), dir)
    ops.createBranch(dir, "wip")
    val bd = s"$dir/branches/wip"
    ops.commit(batch(100, 160), bd)
    assert(ops.fastCount(spark, bd) == 160L)
    assert(ops.fastCount(spark, dir) == 100L) // parent untouched
    ops.fastForward(spark, dir, "wip")
    pin2(dir, 160L)
    // WAP: stage → promote (append) → totals derived on the destination
    val stage = tmpDir("rt-wap-stage")
    ops.commit(batch(1000, 1050), stage)
    ops.promote(spark, stage, dir)
    pin2(dir, 210L)
  }
}
