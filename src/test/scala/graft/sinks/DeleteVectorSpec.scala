package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-on-read row deletes on the versioned table: positional delete
  * vectors land as `#del=` manifest lines, readers anti-join them at scan
  * time, compaction materializes them, expiration GCs them. The invariant
  * under test throughout: DATA FILES ARE NEVER REWRITTEN BY A DELETE —
  * at 100 TB that is the whole point (erase three rows without copying a
  * gigabyte). */
class DeleteVectorSpec extends SparkSpec {
  import spark.implicits._

  private val backend: TableIO = TableIO.local
  private lazy val ops = new VersionedTableOps(backend)

  /** Data-file lines of a version's manifest — the spliced protocol view
    * (bulk lines may live in `#seg=` segments; headers stay inline). */
  private def manifestFiles(dir: String, v: Int): Seq[String] =
    ops.manifestLines(dir, v)
      .filter(l => l.nonEmpty && !l.startsWith("#"))

  private def delFiles(dir: String, v: Int): Seq[String] =
    backend.readLines(s"$dir/manifests/v$v")
      .collect { case l if l.startsWith("#del=") => l.drop(5) }

  test("deleteWhere erases rows without touching a single data file") {
    val dir = tmpDir("dv-basic")
    def ids(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id"), (col("id") % 10).as("k"))
    ops.commit(ids(0, 1000).repartition(2), dir) // v1: two files
    val v2 = ops.commit(ids(1000, 2000).repartition(2), dir) // v2: four
    val dataBefore = manifestFiles(dir, v2)
    val sizesBefore = dataBefore.map(f => f -> backend.size(f)).toMap

    val v3 = ops.deleteWhere(spark, dir, col("id") % 3 === 0)
    assert(v3 == v2 + 1)
    // ids 0,3,...,1998 -> 667 deleted
    assert(ops.read(spark, dir).count() == 2000 - 667)
    assert(ops.read(spark, dir).filter(col("id") % 3 === 0).count() == 0)
    // the data file set is IDENTICAL — same paths, same bytes
    assert(manifestFiles(dir, v3).toSet == dataBefore.toSet)
    assert(dataBefore.forall(f => backend.size(f) == sizesBefore(f)))
    assert(delFiles(dir, v3).size == 1)
    // time travel: the pre-delete snapshot is untouched
    assert(ops.read(spark, dir, Some(v2)).count() == 2000)

    // a second delete computes on the LIVE view: its vector never
    // re-lists positions the first vector already covers
    val v4 = ops.deleteWhere(spark, dir, col("id") < 100)
    val newVec = (delFiles(dir, v4).toSet -- delFiles(dir, v3).toSet).toSeq
    assert(newVec.size == 1)
    val a = spark.read.parquet(newVec: _*)
    val b = spark.read.parquet(delFiles(dir, v3): _*)
    assert(a.join(b, Seq("file_path", "pos"), "inner").count() == 0)
    // ids < 100 not already dead: the 66 non-multiples-of-3
    assert(a.count() == 66)
    assert(ops.read(spark, dir).count() == 2000 - 667 - 66)

    // history exposes the vector count per version
    val h = ops.history(spark, dir)
      .select("version", "n_delete_files").as[(Int, Long)]
      .collect().toMap
    assert(h == Map(1 -> 0L, 2 -> 0L, 3 -> 1L, 4 -> 2L))
  }

  test("a delete matching nothing publishes nothing") {
    val dir = tmpDir("dv-noop")
    val v1 = ops.commit(spark.range(0, 10).toDF("id"), dir)
    assert(ops.deleteWhere(spark, dir, col("id") > 100) == v1)
    assert(ops.versions(dir) == Seq(v1))
    // and no orphaned vector file remains on disk
    assert(backend.list(s"$dir/deletes").isEmpty)
  }

  test("appends after a delete carry the vector; rollback restores it") {
    val dir = tmpDir("dv-carry")
    ops.commit(spark.range(0, 100).toDF("id"), dir) // v1
    val v2 = ops.deleteWhere(spark, dir, col("id") < 50)
    val v3 = ops.commit(spark.range(100, 200).toDF("id"), dir)
    // the appended snapshot still hides the deleted rows
    assert(ops.read(spark, dir, Some(v3)).as[Long].collect().toSet ==
      ((50L until 100L) ++ (100L until 200L)).toSet)
    // a logical overwrite drops vectors with the files they reference
    val v4 = ops.commit(spark.range(500, 510).toDF("id"), dir,
      append = false)
    assert(delFiles(dir, v4).isEmpty)
    assert(ops.read(spark, dir).count() == 10)
    // rollback to the post-delete version restores files AND vectors
    val v5 = ops.rollback(dir, v2)
    assert(v5 == v4 + 1)
    assert(ops.read(spark, dir).as[Long].collect().toSet ==
      (50L until 100L).toSet)
  }

  test("pruned reads apply vectors; delete commits carry manifest stats") {
    val dir = tmpDir("dv-pruned")
    val df = spark.range(0, 10000)
      .select(col("id"), col("id").cast("double").as("x"))
    ops.commitClustered(df, dir, zCols = Seq("x"), statCols = Seq("x"),
      numFiles = 8) // v1
    val v2 = ops.deleteWhere(spark, dir, col("id") % 2 === 0)
    // stats carried through the delete commit: pruning still bites...
    val all = ops.prunedFiles(dir, v2, "x", -1e18, 1e18)
    val band = ops.prunedFiles(dir, v2, "x", 0.0, 100.0)
    assert(band.size < all.size, "stats lost across a delete commit")
    // ...and the pruned read honors the vector
    val got = ops.prunedRead(spark, dir, "x", 0.0, 100.0)
      .filter(col("x") <= 100).select("id").as[Long].collect().toSet
    assert(got == (1L to 99L by 2).toSet)
  }

  test("compact materializes vectors; expire GCs the superseded ones") {
    val dir = tmpDir("dv-compact")
    (0 until 3).foreach { b =>
      ops.commit(spark.range(b * 100L, (b + 1) * 100L).toDF("id")
        .coalesce(1), dir)
    }
    val vDel = ops.deleteWhere(spark, dir, col("id") % 10 === 7)
    val vec = delFiles(dir, vDel).head
    val live = ops.read(spark, dir).as[Long].collect().toSet
    assert(live.size == 270)

    val vC = ops.compact(spark, dir, targetBytes = 1L << 30)
    assert(vC == vDel + 1)
    // every file was rewritten -> the head carries NO vectors, yet reads
    // the same live rows: the deletes are baked into the rewrite
    assert(delFiles(dir, vC).isEmpty)
    assert(ops.read(spark, dir).as[Long].collect().toSet == live)
    // the pinned pre-compact version still reads through its vector
    assert(ops.read(spark, dir, Some(vDel)).as[Long].collect().toSet == live)

    ops.expire(dir, keepLast = 1)
    assert(!backend.exists(vec), "superseded vector not GC'd by expire")
    assert(ops.read(spark, dir).as[Long].collect().toSet == live)
  }

  test("compact materializes debt even when bin-packing alone would " +
    "no-op: a single-file table sheds its vector") {
    // minInputFiles is a bin-packing heuristic; it must never veto a
    // debt-clearing pass — deleteByKeys/the SQL catalog send MOR
    // snapshots to compact() as THE materialization path, and a table of
    // one large file would otherwise carry its vector forever
    val dir = tmpDir("dv-one")
    ops.commit(spark.range(0, 1000).toDF("id").coalesce(1), dir) // 1 file
    ops.deleteWhere(spark, dir, col("id") % 10 === 3)
    val vC = ops.compact(spark, dir, targetBytes = 1L << 30)
    assert(delFiles(dir, vC).isEmpty, "vector not materialized")
    assert(ops.read(spark, dir).as[Long].collect().toSet ==
      (0L until 1000L).filterNot(_ % 10 == 3).toSet)
    // with NO debt the heuristic still applies: one file stays one file
    assert(ops.compact(spark, dir, targetBytes = 1L << 30) == vC)
  }

  test("partial compact consolidates surviving vector rows for kept files") {
    val dir = tmpDir("dv-partial")
    // one big file (kept) + two small ones (rewritten)
    ops.commit(spark.range(0, 200000).toDF("id").coalesce(1), dir)
    ops.commit(spark.range(200000, 200100).toDF("id").coalesce(1), dir)
    ops.commit(spark.range(200100, 200200).toDF("id").coalesce(1), dir)
    val vDel = ops.deleteWhere(spark, dir, col("id") % 1000 === 0)
    val bigFile = manifestFiles(dir, 1).head
    val target = backend.size(bigFile) // small files are under, big is not
    val vC = ops.compact(spark, dir, targetBytes = target)
    assert(manifestFiles(dir, vC).contains(bigFile), "big file rewritten")
    // exactly one consolidated vector remains, referencing only kept files
    val vecs = delFiles(dir, vC)
    assert(vecs.size == 1)
    val refs = spark.read.parquet(vecs: _*)
      .select("file_path").distinct().as[String].collect().toSet
    assert(refs.subsetOf(manifestFiles(dir, vC).toSet))
    assert(refs.contains(bigFile))
    // and the live rows are unchanged by the maintenance pass
    assert(ops.read(spark, dir, Some(vC)).count() ==
      ops.read(spark, dir, Some(vDel)).count())
  }

  test("readChanges refuses a range in which rows were deleted") {
    val dir = tmpDir("dv-changes")
    val v1 = ops.commit(spark.range(0, 100).toDF("id"), dir)
    val v2 = ops.commit(spark.range(100, 200).toDF("id"), dir)
    assert(ops.readChanges(spark, dir, v1, v2).count() == 100)
    val v3 = ops.deleteWhere(spark, dir, col("id") < 10)
    val e = intercept[IllegalArgumentException] {
      ops.readChanges(spark, dir, v1, v3)
    }
    assert(e.getMessage.contains("delete vectors changed"))
    // appends AFTER the delete are incremental again
    val v4 = ops.commit(spark.range(200, 300).toDF("id"), dir)
    assert(ops.readChanges(spark, dir, v3, v4).count() == 100)
  }

  test("a vector stranded by a concurrent compact is re-derived by the " +
    "built-in retry: the delete lands against the new head, exactly once") {
    val dir = tmpDir("dv-race")
    ops.commit(spark.range(0, 100).toDF("id").coalesce(1), dir)
    ops.commit(spark.range(100, 200).toDF("id").coalesce(1), dir)
    // interpose: the instant the delete tries to publish, a compaction
    // lands first and rewrites the very files the vector references —
    // positions don't transfer, so applying the stale vector would
    // silently resurrect rows. The attempt aborts internally and the
    // bounded retry recomputes positions against the compacted head.
    @volatile var fired = false
    val racing = new ForwardingTableIO(backend) {
      override def createExclusive(path: String,
                                   lines: Seq[String]): Boolean = {
        if (!fired && lines.exists(_.startsWith("#del="))) {
          fired = true
          ops.compact(spark, dir, targetBytes = 1L << 30)
        }
        super.createExclusive(path, lines)
      }
    }
    val deleter = new VersionedTableOps(racing)
    deleter.deleteWhere(spark, dir, col("id") < 50)
    assert(fired)
    assert(ops.read(spark, dir).count() == 150)
    assert(ops.read(spark, dir).filter(col("id") < 50).count() == 0)
  }

  test("a delete landing mid-compact rides through the compactor's " +
    "retry; exhausted retries stay loud") {
    val dir = tmpDir("dv-race2")
    ops.commit(spark.range(0, 100).toDF("id").coalesce(1), dir)
    ops.commit(spark.range(100, 200).toDF("id").coalesce(1), dir)
    @volatile var fired = false
    val racing = new ForwardingTableIO(backend) {
      override def createExclusive(path: String,
                                   lines: Seq[String]): Boolean = {
        if (!fired && !lines.exists(_.startsWith("#del="))) {
          fired = true
          ops.deleteWhere(spark, dir, col("id") < 50)
        }
        super.createExclusive(path, lines)
      }
    }
    val compactor = new VersionedTableOps(racing)
    // the retry re-runs against the post-delete head and MATERIALIZES the
    // vector — no operator babysitting, and nothing half-applied
    val vC = compactor.compact(spark, dir, targetBytes = 1L << 30)
    assert(fired)
    assert(delFiles(dir, vC).isEmpty, "retry must materialize the vector")
    assert(ops.read(spark, dir).count() == 150)

    // a landing hot enough to conflict on EVERY attempt exhausts the
    // bound and aborts loudly — retries mask races, never livelock
    var n = 210
    val hostile = new ForwardingTableIO(backend) {
      override def createExclusive(path: String,
                                   lines: Seq[String]): Boolean = {
        if (!lines.exists(_.startsWith("#del="))) {
          ops.deleteWhere(spark, dir, col("id") === n)
          n += 1
        }
        super.createExclusive(path, lines)
      }
    }
    ops.commit(spark.range(200, 300).toDF("id").coalesce(1), dir)
    intercept[java.util.ConcurrentModificationException] {
      new VersionedTableOps(hostile).compact(spark, dir,
        targetBytes = 1L << 30)
    }
  }
}
