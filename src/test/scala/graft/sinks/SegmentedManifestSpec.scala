package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Segmented metadata: a manifest/sidecar references immutable `#seg=`
  * segment files instead of inlining every bulk line, so COMMIT METADATA
  * IS O(batch), NOT O(table) — at ~1M files (100 TB / 100 MB) an inline
  * manifest is a million-line rewrite per append, and the metadata path
  * collapses long before the data does. These specs pin the protocol:
  *  - appends / merge-on-read deletes carry the head as POINTERS and add
  *    one new segment (raw version file stays O(pointers + headers));
  *  - shape-changing rewrites write inline, and the NEXT append folds the
  *    inline bulk into a segment (`manifest.fold.inline`);
  *  - pointer growth is bounded by fold-all (`manifest.fold.segs`);
  *  - segments GC exactly like data files (expire refcount, vacuum sweep,
  *    branch pins) and ownership transfers expand at the boundary
  *    (fast-forward, promote → retire);
  *  - every reader sees the SPLICED view — results identical to inline.
  */
class SegmentedManifestSpec extends SparkSpec {
  import spark.implicits._

  private val backend: TableIO = TableIO.local
  private lazy val ops = new VersionedTableOps(backend)

  private def rawManifest(dir: String, v: Int): Seq[String] =
    backend.readLines(s"$dir/manifests/v$v")
  private def rawSidecar(dir: String, v: Int): Seq[String] =
    backend.readLines(s"$dir/manifests/s$v")
  private def inlineFiles(lines: Seq[String]): Seq[String] =
    lines.filter(l => l.nonEmpty && !l.startsWith("#"))
  private def segPtrs(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith("#seg=")).map(_.drop(5))
  private def batch(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id"), (col("id") % 7).as("k"))

  test("appends publish O(batch) metadata: pointer carry + one new segment") {
    val dir = tmpDir("seg-append")
    val n = 5
    val vs = (0 until n).map(i =>
      ops.commit(batch(i * 100, i * 100 + 100).repartition(2), dir))
    // the raw head manifest holds NO inline data-file lines and exactly
    // one pointer per append — metadata growth is O(commits), never
    // O(table files)
    val raw = rawManifest(dir, vs.last)
    assert(inlineFiles(raw).isEmpty,
      s"head manifest inlines data files: $raw")
    assert(segPtrs(raw).size == n)
    // earlier versions' pointers carried VERBATIM (shared segments, no
    // re-segmentation of already-landed bulk)
    assert(segPtrs(rawManifest(dir, vs(n - 2))).forall(
      segPtrs(raw).contains))
    // the sidecar mirrors the shape, and the spliced view serves reads,
    // counts, and per-file rows identically to an inline table
    assert(segPtrs(rawSidecar(dir, vs.last)).size == n)
    assert(ops.read(spark, dir).count() == n * 100L)
    assert(ops.fastCount(spark, dir) == n * 100L)
    assert(ops.manifestLines(dir, vs.last)
      .count(l => l.nonEmpty && !l.startsWith("#")) == n * 2)
  }

  test("merge-on-read deletes carry pointers too; reads and fastCount " +
    "stay exact through the spliced view") {
    val dir = tmpDir("seg-mor")
    ops.commit(batch(0, 1000).repartition(2), dir)
    ops.commit(batch(1000, 2000).repartition(2), dir)
    val vDel = ops.deleteWhere(spark, dir, col("id") < 100)
    assert(inlineFiles(rawManifest(dir, vDel)).isEmpty,
      "a positional delete must not inline the carried file list")
    assert(ops.read(spark, dir).count() == 1900L)
    assert(ops.fastCount(spark, dir) == 1900L)
    val vUpd = ops.updateWhere(spark, dir, col("id") === 150L,
      Map("k" -> lit(99L)))
    assert(inlineFiles(rawManifest(dir, vUpd)).isEmpty,
      "an MOR update must not inline the carried file list")
    assert(ops.read(spark, dir).filter(col("k") === 99L).count() == 1L)
    val vEq = ops.deleteByKeys(spark, dir, "id", Seq(200L, 201L).toDF("id"))
    assert(inlineFiles(rawManifest(dir, vEq)).isEmpty,
      "an equality delete must not inline the carried file list")
    assert(ops.read(spark, dir).count() == 1898L)
  }

  test("inline bulk (an overwrite) folds into ONE segment on the next " +
    "append per manifest.fold.inline") {
    val dir = tmpDir("seg-fold-inline")
    ops.setTableProperty(dir, "manifest.fold.inline", "1")
    val vO = ops.commit(batch(0, 500).repartition(4), dir, append = false)
    // an overwrite publishes its file list inline
    assert(inlineFiles(rawManifest(dir, vO)).nonEmpty)
    val vA = ops.commit(batch(1000, 1100), dir)
    val raw = rawManifest(dir, vA)
    // 2 pointers: the folded inline carry + the new batch
    assert(inlineFiles(raw).isEmpty && segPtrs(raw).size == 2,
      s"expected folded carry + new segment, got $raw")
    assert(ops.read(spark, dir).count() == 600L)
    assert(ops.fastCount(spark, dir) == 600L)
  }

  test("a rewrite preserves untouched segments: compact re-points only " +
    "what it rewrote") {
    val dir = tmpDir("seg-rewrite-carry")
    ops.commit(batch(0, 500).repartition(4), dir)
    ops.commit(batch(500, 1000).repartition(4), dir)
    val before = segPtrs(rawManifest(dir, 2))
    assert(before.size == 2)
    // a high threshold rewrites everything → all-new segment; a rewrite
    // that touches NOTHING (all files over target) keeps pointers as-is
    val vNoop = ops.compact(spark, dir, targetBytes = 1L)
    assert(vNoop == 2, "nothing under target: head unchanged")
    val vC = ops.compact(spark, dir, targetBytes = 1L << 30)
    val after = rawManifest(dir, vC)
    assert(inlineFiles(after).isEmpty,
      s"compact must publish segmented metadata, not inline bulk: $after")
    assert(segPtrs(after).intersect(before).isEmpty,
      "a full rewrite replaces every pointer")
    assert(ops.read(spark, dir).count() == 1000L)
    assert(ops.fastCount(spark, dir) == 1000L)
    // partial rewrite: one small straggler lands, compact touches ONLY it
    // and the carried pointer survives verbatim
    ops.commit(batch(1000, 1010), dir)
    val keepPtr = segPtrs(rawManifest(dir, vC + 1)).head
    val smallOnly = ops.compact(spark, dir,
      targetBytes = backend.size(ops.manifestLines(dir, vC).filter(
        l => l.nonEmpty && !l.startsWith("#")).head) - 1)
    if (smallOnly > vC + 1) {
      val rawP = rawManifest(dir, smallOnly)
      assert(segPtrs(rawP).contains(keepPtr),
        s"untouched segment must carry verbatim: $rawP")
    }
    assert(ops.read(spark, dir).count() == 1010L)
    assert(ops.fastCount(spark, dir) == 1010L)
  }

  test("pointer growth is bounded: fold-all at manifest.fold.segs") {
    val dir = tmpDir("seg-fold-all")
    ops.setTableProperty(dir, "manifest.fold.segs", "4")
    (0 until 10).foreach(i => ops.commit(batch(i * 10, i * 10 + 10), dir))
    val raw = rawManifest(dir, ops.versions(dir).last)
    assert(segPtrs(raw).size <= 4,
      s"pointer list must fold at the cap: ${segPtrs(raw)}")
    assert(ops.read(spark, dir).count() == 100L)
    assert(ops.fastCount(spark, dir) == 100L)
  }

  test("expire GCs segments referenced by no retained version and keeps " +
    "shared ones") {
    val dir = tmpDir("seg-expire")
    val v1 = ops.commit(batch(0, 100), dir)
    val v2 = ops.commit(batch(100, 200), dir)
    ops.commit(batch(200, 300), dir)
    val sharedSegs = segPtrs(rawManifest(dir, v1))
    val v2Segs = segPtrs(rawManifest(dir, v2)).toSet -- sharedSegs
    ops.expire(dir, keepLast = 1)
    // v1/v2's segments survive: the head still points at them
    (sharedSegs ++ v2Segs).foreach(p => assert(backend.exists(p),
      s"head-referenced segment GC'd: $p"))
    assert(ops.read(spark, dir).count() == 300L)
    // an overwrite orphans ALL prior segments; expire then drops them
    val before = backend.list(s"$dir/manifests/segs").size
    ops.commit(batch(0, 10), dir, append = false)
    ops.commit(batch(10, 20), dir) // head: overwrite carry + 1 new segment
    ops.expire(dir, keepLast = 2)
    val after = backend.list(s"$dir/manifests/segs").size
    assert(after < before,
      s"expire must GC the pre-overwrite segments ($before -> $after)")
    assert(ops.read(spark, dir).count() == 20L)
  }

  test("vacuumOrphans sweeps never-published segments, spares referenced " +
    "ones") {
    val dir = tmpDir("seg-vacuum")
    ops.commit(batch(0, 100), dir)
    val orphan = s"$dir/manifests/segs/deadbeef-orphan"
    backend.writeLines(orphan, Seq("/nowhere/file.parquet"))
    val live = segPtrs(rawManifest(dir, 1))
    val removed = ops.vacuumOrphans(dir, graceMs = -1000L)
    assert(removed >= 1 && !backend.exists(orphan))
    live.foreach(p => assert(backend.exists(p),
      s"vacuum swept a referenced segment: $p"))
    assert(ops.read(spark, dir).count() == 100L)
  }

  test("branch fork is O(pointers); parent GC pins branch-referenced " +
    "segments; retireBranch frees only branch-local ones") {
    val dir = tmpDir("seg-branch")
    ops.commit(batch(0, 100).repartition(2), dir)
    ops.commit(batch(100, 200).repartition(2), dir)
    ops.createBranch(dir, "audit")
    val bd = s"$dir/branches/audit"
    // the fork copied POINTERS, not bulk: branch v1 inlines nothing
    assert(inlineFiles(rawManifest(bd, 1)).isEmpty)
    val parentSegs = segPtrs(rawManifest(bd, 1))
    // branch-local append lands a branch-local segment
    ops.commit(batch(200, 250), bd)
    val branchLocal = segPtrs(rawManifest(bd, 2)).toSet -- parentSegs
    assert(branchLocal.nonEmpty &&
      branchLocal.forall(_.startsWith(s"$bd/")))
    // parent moves on and expires history — branch still pins the shared
    // parent segments
    ops.commit(batch(300, 400), dir)
    ops.expire(dir, keepLast = 1)
    parentSegs.foreach(p => assert(backend.exists(p),
      s"parent expire GC'd a branch-pinned segment: $p"))
    assert(ops.readBranch(spark, dir, "audit").count() == 250L)
    // retiring the branch frees branch-local segments only
    ops.retireBranch(dir, "audit")
    branchLocal.foreach(p => assert(!backend.exists(p)))
    assert(ops.read(spark, dir).count() == 300L)
  }

  test("fast-forward re-owns branch metadata parent-side before " +
    "retireBranch deletes the branch's segments") {
    val dir = tmpDir("seg-ff")
    ops.commit(batch(0, 100), dir)
    ops.setTableProperty(dir, "manifest.fold.inline", "1")
    ops.createBranch(dir, "wip")
    val bd = s"$dir/branches/wip"
    ops.commit(batch(100, 200), bd)
    val v = ops.fastForward(spark, dir, "wip")
    // the promoted head must reference NO branch-directory segment — the
    // branch dies next, and a dangling pointer would poison the lineage
    assert(segPtrs(rawManifest(dir, v)).forall(!_.startsWith(s"$bd/")))
    assert(segPtrs(rawSidecar(dir, v)).forall(!_.startsWith(s"$bd/")))
    ops.retireBranch(dir, "wip")
    assert(ops.read(spark, dir).count() == 200L)
    assert(ops.fastCount(spark, dir) == 200L)
    // and the lineage keeps working as a segmented table afterwards
    ops.commit(batch(200, 300), dir)
    assert(ops.read(spark, dir).count() == 300L)
  }

  test("pre-upgrade inline tables keep working and upgrade on first " +
    "append") {
    val dir = tmpDir("seg-upgrade")
    ops.setTableProperty(dir, "manifest.fold.inline", "2")
    ops.commit(batch(0, 100).repartition(3), dir)
    // strip v1 back to the pre-segment format: inline bulk, no pointers
    val inlineV = ops.manifestLines(dir, 1)
      .filterNot(_.startsWith("#seg="))
    val inlineS = ops.sidecarLines(dir, 1)
    backend.writeLines(s"$dir/manifests/v1", inlineV)
    backend.writeLines(s"$dir/manifests/s1", inlineS)
    assert(ops.read(spark, dir).count() == 100L) // legacy read path
    val v2 = ops.commit(batch(100, 200), dir)
    val raw = rawManifest(dir, v2)
    assert(inlineFiles(raw).isEmpty && segPtrs(raw).size == 2,
      s"first append must fold the legacy inline bulk: $raw")
    assert(ops.read(spark, dir).count() == 200L)
    assert(ops.fastCount(spark, dir) == 200L)
  }

  test("rollback and time travel resolve through pointers; stats carry " +
    "keeps pruning alive") {
    val dir = tmpDir("seg-rollback")
    val v1 = ops.commitClustered(batch(0, 1000), dir, zCols = Seq("id"),
      statCols = Seq("id"), numFiles = 4)
    ops.commitClustered(batch(1000, 2000), dir, zCols = Seq("id"),
      statCols = Seq("id"), numFiles = 4)
    val vR = ops.rollback(dir, v1)
    assert(inlineFiles(rawManifest(dir, vR)).isEmpty,
      "rollback must carry pointers, not republish the file list inline")
    assert(ops.read(spark, dir).count() == 1000L)
    // pruning metadata survived the pointer carry: a ranged read over the
    // rolled-back head skips files
    val all = ops.manifestLines(dir, vR)
      .count(l => l.nonEmpty && !l.startsWith("#"))
    val pruned = ops.prunedRead(spark, dir, "id", 0L, 10L)
      .select(input_file_name()).distinct().count()
    assert(pruned < all, s"pruning dead after rollback: $pruned/$all")
  }
}
