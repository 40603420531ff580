package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Declared sort order (`sort.order` table property): every compaction
  * pass — explicit, scoped, and the landing-triggered auto-compact —
  * rewrites its slice range-clustered on the declared key and records
  * range stats for it, so a streaming table whose landings arrive in
  * event order decays back to a prunable layout on its ordinary
  * maintenance cadence. Plain landings stay untouched (no per-commit
  * range shuffle). Declarations are born-valid or refused. */
class SortOrderSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  test("sort.order declaration is born-valid or refused") {
    // nothing landed and no declared schema: nothing to validate against
    val fresh = tmpDir("so-fresh") + "/t"
    ops.setTableProperty(fresh, "sort.order", "anything")
    // empty column list refuses regardless
    intercept[IllegalArgumentException] {
      ops.setTableProperty(fresh, "sort.order", " , ")
    }
    // with landed data the columns must resolve (case-insensitively)
    val dir = tmpDir("so-validate") + "/t"
    ops.commit(Seq((1L, "a", 2.0)).toDF("id", "k", "v"), dir)
    val e = intercept[IllegalArgumentException] {
      ops.setTableProperty(dir, "sort.order", "nope")
    }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    ops.setTableProperty(dir, "sort.order", "V, id") // resolves, both
    assert(ops.sortOrderOf(dir) == Seq("V", "id").map(_.trim))
  }

  test("auto-compact of a streaming landing restores a range-prunable " +
      "layout in the declared order") {
    val dir = tmpDir("so-auto") + "/t"
    ops.setTableProperty(dir, "sort.order", "v")
    // arrival-ordered streaming landings: every file spans the WHOLE v
    // range, so before maintenance a band probe can skip nothing
    (0 until 4).foreach { b =>
      ops.commitOnce((0 until 2000).filter(_ % 4 == b)
        .map(i => (i.toLong, i.toDouble)).toDF("id", "v"), dir, s"so:$b")
    }
    val pre = ops.versions(dir).last
    val preFiles = ops.filesMeta(spark, dir, Some(pre))
      .select("file").collect().map(_.getString(0)).toSeq
    // commitOnce landings carry row counts only — no v stats, so the
    // superset guarantee admits every file
    assert(ops.prunedFiles(dir, pre, "v", 100.0, 120.0).size ==
      preFiles.size, "un-maintained landing should admit everything")
    // arm auto-compact so the NEXT landing pays the maintenance pass
    val sizes = preFiles.map(f => Files.size(Paths.get(f)))
    ops.setTableProperty(dir, "compact.target.bytes",
      (sizes.sum / 3 + 1).toString)
    ops.setTableProperty(dir, "compact.small.bytes",
      (sizes.max + 4096).toString)
    ops.setTableProperty(dir, "compact.auto.files", "1")
    ops.commitOnce(Seq((9999L, 999.5)).toDF("id", "v"), dir, "so:last")
    val head = ops.versions(dir).last
    assert(head == pre + 2,
      s"the landing must have auto-compacted: head $head vs pre $pre")
    val n = ops.filesMeta(spark, dir, Some(head)).count()
    assert(n >= 2, s"compaction must have produced several files, got $n")
    // disjoint ranges now: a 1% band admits a strict subset of files
    val pruned = ops.prunedFiles(dir, head, "v", 100.0, 120.0)
    assert(pruned.nonEmpty && pruned.size < n,
      s"declared sort order must make range pruning skip: " +
        s"${pruned.size} of $n files admit a 1% band")
    // the pruned read still serves the band exactly (superset guarantee)
    assert(ops.prunedRead(spark, dir, "v", 100.0, 120.0)
      .filter(col("v").between(100.0, 120.0)).count() == 21)
    // rows preserved, ledger intact
    assert(ops.read(spark, dir, Some(head)).count() == 2001)
    assert(ops.committedTxns(dir).contains("so:0"))
    // and files are INTERNALLY sorted too (row-group stats tighten):
    // read each file alone to keep parquet row order
    val headFiles = ops.filesMeta(spark, dir, Some(head))
      .select("file").collect().map(_.getString(0)).toSeq
    headFiles.foreach { f =>
      val vs = spark.read.parquet(f).select("v").collect().map(_.getDouble(0))
      assert(vs.sameElements(vs.sorted),
        s"file $f is not internally sorted on v")
    }
  }

  test("sort.order survives RENAME COLUMN (physical anchoring) and " +
      "anchors against DROP COLUMN") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    val dir = tmpDir("so-rename") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE)")
    (0 until 3).foreach { b =>
      ops.commitOnce((0 until 300).filter(_ % 3 == b)
        .map(i => (i.toLong, i.toDouble)).toDF("id", "v"), dir, s"sr:$b")
    }
    ops.setTableProperty(dir, "sort.order", "v")
    // rename the declared sort column: the declaration anchors the
    // PHYSICAL column, so maintenance keeps sorting the same data
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN v TO w")
    val ver = ops.compact(spark, dir, targetBytes = 1L << 30)
    val files = ops.filesMeta(spark, dir, Some(ver))
      .select("file").collect().map(_.getString(0)).toSeq
    assert(files.size == 1)
    // files store the ORIGINAL physical name; rows must be sorted on it
    val vs = spark.read.parquet(files.head).select("v")
      .collect().map(_.getDouble(0))
    assert(vs.sameElements(vs.sorted),
      "compact must keep sorting the renamed column's physical data")
    // and the renamed LOGICAL name cannot be dropped while anchored
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN w")
    }
    assert(e.getMessage.contains("sort.order"), e.getMessage)
  }

  test("plain landings stay untouched; explicit compact honors the order " +
      "and stats its own columns") {
    val dir = tmpDir("so-plain") + "/t"
    (0 until 3).foreach { b =>
      ops.commit((0 until 900).filter(_ % 3 == b)
        .map(i => (i.toLong, i.toDouble)).toDF("id", "v"), dir)
    }
    ops.setTableProperty(dir, "sort.order", "v")
    // declaring AFTER landings rewrote nothing (no new version)
    assert(ops.versions(dir).last == 3)
    val v = ops.compact(spark, dir, targetBytes = 1L << 30)
    // one output file at this target: internally sorted, stats recorded
    val files = ops.filesMeta(spark, dir, Some(v))
      .select("file").collect().map(_.getString(0)).toSeq
    assert(files.size == 1)
    val vs = spark.read.parquet(files.head).select("v")
      .collect().map(_.getDouble(0))
    assert(vs.sameElements(vs.sorted), "compact must sort within files")
    // sort column stats recorded even though the landing never had them:
    // an out-of-range probe can now prove emptiness (no stats would have
    // to admit the file under the superset guarantee)
    assert(ops.prunedFiles(dir, v, "v", 5000.0, 6000.0).isEmpty)
    assert(ops.prunedFiles(dir, v, "v", 10.0, 20.0).size == 1)
  }
}
