package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Write-audit-publish and orphan vacuum on the versioned table.
  * Promotion must be ZERO-COPY (manifest reference, not data movement)
  * and the shared-file lifecycle must be owned by exactly one table —
  * every hazard path (expire on promoted staging, vacuum on a retired
  * table) must refuse loudly rather than GC production data. */
class WapSpec extends SparkSpec {
  import spark.implicits._

  private val backend: TableIO = TableIO.local
  private lazy val ops = new VersionedTableOps(backend)

  /** A clocked ops so vacuum grace windows need no sleeping. */
  private class Clocked extends VersionedTableOps(backend) {
    var t: Long = 1000000L
    override protected def now(): Long = t
  }

  private def df(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id"), (col("id") * 2).as("payload"))

  test("promote publishes staging's snapshot by reference: zero copies") {
    val root = tmpDir("wap-zero")
    val staging = s"$root/staging"
    val prod = s"$root/prod"
    ops.commitClustered(df(0, 5000), staging, zCols = Seq("id"),
      statCols = Seq("id"), numFiles = 4)
    val v = ops.promote(spark, staging, prod, append = false)
    // nothing under prod's data area — the manifest references staging's
    // immutable files
    assert(backend.list(s"$prod/data").isEmpty)
    assert(ops.read(spark, prod, Some(v)).count() == 5000)
    // stats rode along: pruning works in prod immediately
    val all = ops.prunedFiles(prod, v, "id", Long.MinValue, Long.MaxValue)
    val band = ops.prunedFiles(prod, v, "id", 0L, 100L)
    assert(band.size < all.size, "stats not promoted")
  }

  test("append promotion adds staged files to prod's head; schema checked") {
    val root = tmpDir("wap-append")
    val staging = s"$root/staging"
    val prod = s"$root/prod"
    ops.commit(df(0, 100), prod)
    ops.commit(df(100, 200), staging)
    val v = ops.promote(spark, staging, prod) // append
    assert(ops.read(spark, prod, Some(v)).count() == 200)
    // a second staging with a different schema refuses
    val bad = s"$root/bad"
    ops.commit(spark.range(5).select(col("id"),
      col("id").as("other")), bad)
    val e = intercept[IllegalArgumentException] {
      ops.promote(spark, bad, prod)
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("audited deletes promote with the snapshot; staging lifecycle " +
    "ends with retire, never expire") {
    val root = tmpDir("wap-audit")
    val staging = s"$root/staging"
    val prod = s"$root/prod"
    ops.commit(df(0, 1000), staging)
    ops.deleteWhere(spark, staging, col("id") < 100) // the audit
    ops.promote(spark, staging, prod, append = false)
    assert(ops.read(spark, prod).count() == 900)
    // staging's head is stamped promoted: expire refuses
    val e = intercept[IllegalArgumentException] {
      ops.expire(staging, keepLast = 1)
    }
    assert(e.getMessage.contains("promoted"))
    // retire drops staging's manifests, keeps the shared data
    ops.retire(staging)
    assert(ops.versions(staging).isEmpty)
    assert(ops.read(spark, prod).count() == 900)
    // and vacuum on the retired staging refuses (no manifests != orphans)
    val e2 = intercept[IllegalArgumentException] {
      ops.vacuumOrphans(staging, graceMs = 0L)
    }
    assert(e2.getMessage.contains("retired"))
    // prod's own expire now governs the shared files: replacing prod's
    // content and expiring deletes the staged-then-promoted files
    ops.commit(df(5000, 5010), prod, append = false)
    ops.expire(prod, keepLast = 1)
    assert(backend.list(s"$staging/data").forall(d =>
      backend.list(s"$staging/data/$d").forall(!_.endsWith(".parquet"))),
      "prod's expire should have GC'd the promoted files it owned")
  }

  test("vacuum removes crash debris, honors grace, keeps referenced dirs") {
    val root = tmpDir("wap-vacuum")
    val dir = s"$root/t"
    val clocked = new Clocked
    clocked.commit(df(0, 100), dir)
    // crash debris: a batch written but never published (no manifest line)
    df(100, 200).write.parquet(s"$dir/data/orphan-batch")
    // a crashed delete-vector write too
    Seq(("x", 0L)).toDF("file_path", "pos")
      .write.parquet(s"$dir/deletes/orphan-vec")
    // young debris survives a grace window...
    clocked.t = System.currentTimeMillis() + 10000L
    assert(clocked.vacuumOrphans(dir, graceMs = 3600000L) == 0)
    assert(backend.exists(s"$dir/data/orphan-batch"))
    // ...and is reclaimed once old enough (clock far future, grace tiny)
    clocked.t = System.currentTimeMillis() + 7200000L
    val removed = clocked.vacuumOrphans(dir, graceMs = 3600000L)
    assert(removed == 2)
    assert(!backend.exists(s"$dir/data/orphan-batch"))
    assert(!backend.exists(s"$dir/deletes/orphan-vec"))
    // the committed batch is untouched
    assert(clocked.read(spark, dir).count() == 100)
  }
}
