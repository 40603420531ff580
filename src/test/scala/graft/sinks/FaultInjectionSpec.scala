package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crash-point fault-injection sweep over the commit protocol.
  *
  * The protocol's central claims — the manifest `createExclusive` is THE
  * atomic commit point, everything before it is reclaimable debris,
  * everything after it is best-effort metadata that degrades but never
  * lies — are asserted here SYSTEMATICALLY rather than at hand-picked
  * races: for every operation family, the writer is killed before the
  * 0th, 1st, … Nth metadata mutation (a latched [[CrashingTableIO]]:
  * once tripped, every later IO call fails too, so catch-block cleanup
  * cannot run — exactly like a dead process), and after each kill a
  * CLEAN reader asserts the three recovery invariants:
  *
  *  1. the readable head serves EXACTLY the pre-state or the post-state
  *     rows — never a torn in-between;
  *  2. [[VersionedTableOps.vacuumOrphans]] reclaims the crash debris
  *     without changing served rows, and a second vacuum finds nothing;
  *  3. the documented recovery action (retry the op; for non-idempotent
  *     promote/fast-forward, retry iff the head shows pre-state) lands
  *     the intended final state.
  *
  * Reference anchor: the reference's load task swallows mid-write
  * errors (weather_etl.py:190–191) — the failure-window contract is the
  * one thing it got wrong that this engine claims to fix, so the claim
  * is the thing to attack hardest.
  */
class SimulatedCrash(op: String, n: Int) extends RuntimeException(
  s"simulated writer crash at metadata mutation #$n (op: $op)")

/** Counts metadata MUTATIONS (mkdirs / writeLines / createExclusive /
  * delete) of a clean run — the sweep's kill-point domain. */
class MutationCountingIO(inner: TableIO) extends TableIO {
  var count = 0
  private def m(): Unit = synchronized { count += 1 }
  override def mkdirs(dir: String): Unit = { m(); inner.mkdirs(dir) }
  override def exists(path: String): Boolean = inner.exists(path)
  override def list(dir: String): Seq[String] = inner.list(dir)
  override def readLines(path: String): Seq[String] = inner.readLines(path)
  override def writeLines(path: String, lines: Seq[String]): Unit = {
    m(); inner.writeLines(path, lines)
  }
  override def createExclusive(path: String, lines: Seq[String]): Boolean = {
    m(); inner.createExclusive(path, lines)
  }
  override def delete(path: String): Unit = { m(); inner.delete(path) }
  override def size(path: String): Long = inner.size(path)
  override def isDir(path: String): Boolean = inner.isDir(path)
  override def mtime(path: String): Long = inner.mtime(path)
}

/** Kills the writer at the `failAt`-th metadata mutation and LATCHES:
  * the tripped instance fails every subsequent call of any kind, so no
  * cleanup code observable only to a live process can run. Data-file
  * writes ride Spark, not this seam — a crash here models "the process
  * died between metadata steps", and any parquet it had already written
  * is exactly the debris the orphan sweep must reclaim. */
class CrashingTableIO(inner: TableIO, failAt: Int) extends TableIO {
  private var mutations = 0
  @volatile var tripped = false
  private def gate(op: String): Unit = synchronized {
    if (tripped) throw new SimulatedCrash(op, failAt)
    if (mutations == failAt) {
      tripped = true; throw new SimulatedCrash(op, failAt)
    }
    mutations += 1
  }
  private def dead(op: String): Unit =
    if (tripped) throw new SimulatedCrash(op, failAt)
  override def mkdirs(dir: String): Unit = {
    gate("mkdirs"); inner.mkdirs(dir) }
  override def exists(path: String): Boolean = {
    dead("exists"); inner.exists(path) }
  override def list(dir: String): Seq[String] = {
    dead("list"); inner.list(dir) }
  override def readLines(path: String): Seq[String] = {
    dead("readLines"); inner.readLines(path) }
  override def writeLines(path: String, lines: Seq[String]): Unit = {
    gate("writeLines"); inner.writeLines(path, lines) }
  override def createExclusive(path: String, lines: Seq[String]): Boolean = {
    gate("createExclusive"); inner.createExclusive(path, lines) }
  override def delete(path: String): Unit = {
    gate("delete"); inner.delete(path) }
  override def size(path: String): Long = { dead("size"); inner.size(path) }
  override def isDir(path: String): Boolean = {
    dead("isDir"); inner.isDir(path) }
  override def mtime(path: String): Long = {
    dead("mtime"); inner.mtime(path) }
}

class FaultInjectionSpec extends SparkSpec {
  import spark.implicits._

  /** How a family recovers after a crash. */
  private sealed trait Recovery
  /** Retrying unconditionally is safe and lands the post-state
    * (idempotent ops: exactly-once commits, predicate deletes, merges,
    * replaces, rollbacks). */
  private case object RetryAlways extends Recovery
  /** Retry ONLY when the head still shows the pre-state — the op is an
    * append-shaped transfer (promote, fast-forward) a blind re-run
    * would double-land; the head itself tells the operator which side
    * of the commit point the crash fell on. */
  private case object RetryIfPre extends Recovery
  /** The op never changes served rows (compact, expire): every crash
    * point AND the retry must serve exactly the pre-state. */
  private case object LogicalNoop extends Recovery

  private case class Family(
      name: String,
      fixture: (VersionedTableOps, String) => Unit,
      op: (VersionedTableOps, String) => Unit,
      tableDir: String => String,
      recovery: Recovery,
      extraVacuumDirs: String => Seq[String] = _ => Seq.empty)

  private def cleanOps = new VersionedTableOps(TableIO.local)

  private def rowsOf(ops: VersionedTableOps, dir: String): Seq[String] =
    ops.read(spark, dir).collect().map(_.toString).sorted.toSeq

  private def copyTree(src: String, dst: String): Unit = {
    val s = Paths.get(src); val d = Paths.get(dst)
    val it = Files.walk(s)
    try it.forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally it.close()
  }

  private def deleteTree(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val it = Files.walk(p)
      try it.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
      finally it.close()
    }
  }

  private def df2(rows: (Long, Double)*) =
    rows.toSeq.toDF("id", "v")

  private def runFamily(f: Family): Unit = {
    val work = tmpDir(s"fi-${f.name}")
    val backup = tmpDir(s"fi-bk-${f.name}")
    f.fixture(cleanOps, work)
    val dir = f.tableDir(work)
    val pre = rowsOf(cleanOps, dir)
    copyTree(work, backup)
    // one clean run: captures the post-state AND the kill-point domain
    val counter = new MutationCountingIO(TableIO.local)
    f.op(new VersionedTableOps(counter), work)
    val post = rowsOf(cleanOps, dir)
    val total = counter.count
    assert(total > 0, s"${f.name}: op performed no metadata mutations")
    info(s"${f.name}: sweeping $total kill points")
    if (f.recovery == LogicalNoop)
      assert(post == pre, s"${f.name}: expected a logical no-op")
    for (n <- 0 until total) {
      val at = s"${f.name} killed before mutation $n/$total"
      deleteTree(work); copyTree(backup, work)
      val cio = new CrashingTableIO(TableIO.local, n)
      val completed =
        try { f.op(new VersionedTableOps(cio), work); true }
        catch { case _: Throwable => false }
      val clean = cleanOps
      // (1) the head is readable and serves pre or post, never torn
      val now = rowsOf(clean, dir)
      assert(now == pre || now == post,
        s"$at: served rows are neither pre nor post:\n  now=$now\n  " +
          s"pre=$pre\n  post=$post")
      if (completed && cio.tripped)
        // the op survived its own crash (the trip landed in a
        // best-effort post-publish phase) — then the publish MUST have
        // happened; "success" with pre-state rows would be a lie
        assert(now == post,
          s"$at: op reported success but the head serves the pre-state")
      // (2) vacuum reclaims debris without touching served data
      val vdirs = dir +: f.extraVacuumDirs(work)
      vdirs.foreach(d => clean.vacuumOrphans(d, graceMs = -60000L))
      assert(rowsOf(clean, dir) == now,
        s"$at: vacuumOrphans changed served rows")
      // (3) the documented recovery action lands the final state
      val rops = cleanOps
      f.recovery match {
        case RetryAlways =>
          f.op(rops, work)
          assert(rowsOf(rops, dir) == post,
            s"$at: retry did not land the post-state")
        case RetryIfPre =>
          if (now == pre) f.op(rops, work)
          assert(rowsOf(rops, dir) == post,
            s"$at: recovery did not land the post-state")
        case LogicalNoop =>
          f.op(rops, work)
          assert(rowsOf(rops, dir) == pre,
            s"$at: a logical no-op changed served rows across crash+retry")
      }
      // (4) after recovery, a second sweep finds zero NEW debris
      vdirs.foreach { d =>
        val again = rops.vacuumOrphans(d, graceMs = -60000L)
        assert(again == 0,
          s"$at: $again orphan(s) survived the first vacuum at $d")
      }
    }
  }

  test("crash sweep: exactly-once append (commitOnce)") {
    runFamily(Family(
      name = "append",
      fixture = (o, w) => { o.commit(df2(1L -> 1.0, 2L -> 2.0), s"$w/t"); () },
      op = (o, w) => { o.commitOnce(df2(3L -> 3.0, 4L -> 4.0), s"$w/t",
        txnId = "fi-txn-1"); () },
      tableDir = w => s"$w/t",
      recovery = RetryAlways))
  }

  test("crash sweep: logical overwrite (commit append=false)") {
    runFamily(Family(
      name = "replace",
      fixture = (o, w) => { o.commit(df2(1L -> 1.0, 2L -> 2.0), s"$w/t"); () },
      op = (o, w) => { o.commit(df2(10L -> 10.0), s"$w/t",
        append = false); () },
      tableDir = w => s"$w/t",
      recovery = RetryAlways))
  }

  test("crash sweep: delete-vector landing (deleteWhere)") {
    runFamily(Family(
      name = "delete",
      fixture = (o, w) => {
        o.commit(df2(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0), s"$w/t")
        ()
      },
      op = (o, w) => { o.deleteWhere(spark, s"$w/t", col("id") <= 2L); () },
      tableDir = w => s"$w/t",
      recovery = RetryAlways))
  }

  test("crash sweep: compaction (rows must NEVER change)") {
    runFamily(Family(
      name = "compact",
      fixture = (o, w) => {
        o.commit(df2(1L -> 1.0), s"$w/t")
        o.commit(df2(2L -> 2.0), s"$w/t")
        o.commit(df2(3L -> 3.0), s"$w/t")
        ()
      },
      op = (o, w) => { o.compact(spark, s"$w/t",
        targetBytes = 128L * 1024 * 1024); () },
      tableDir = w => s"$w/t",
      recovery = LogicalNoop))
  }

  test("crash sweep: full MERGE INTO (update + insert)") {
    runFamily(Family(
      name = "merge",
      fixture = (o, w) => { o.commit(df2(1L -> 1.0, 2L -> 2.0), s"$w/t"); () },
      op = (o, w) => {
        o.mergeInto(spark, s"$w/t", df2(2L -> 20.0, 3L -> 30.0),
          "id", "id",
          matched = Seq(MergeClause(None,
            MergeUpdate(Map("v" -> col("__s_v"))))),
          notMatched = Seq(MergeClause(None,
            MergeInsert(Map("id" -> col("__s_id"), "v" -> col("__s_v"))))))
        ()
      },
      tableDir = w => s"$w/t",
      recovery = RetryAlways))
  }

  test("crash sweep: WAP promote (staging → production)") {
    runFamily(Family(
      name = "promote",
      fixture = (o, w) => {
        o.commit(df2(1L -> 1.0, 2L -> 2.0), s"$w/t")
        o.commit(df2(3L -> 3.0, 4L -> 4.0), s"$w/stage")
        ()
      },
      op = (o, w) => { o.promote(spark, s"$w/stage", s"$w/t"); () },
      tableDir = w => s"$w/t",
      recovery = RetryIfPre,
      extraVacuumDirs = w => Seq(s"$w/stage")))
  }

  test("crash sweep: branch fast-forward") {
    runFamily(Family(
      name = "branch-ff",
      fixture = (o, w) => {
        o.commit(df2(1L -> 1.0, 2L -> 2.0), s"$w/t")
        val bd = o.createBranch(s"$w/t", "exp")
        o.commit(df2(3L -> 3.0), bd)
        ()
      },
      op = (o, w) => { o.fastForward(spark, s"$w/t", "exp"); () },
      tableDir = w => s"$w/t",
      recovery = RetryIfPre))
  }

  test("crash sweep: history expiration (head must survive any kill)") {
    runFamily(Family(
      name = "expire",
      fixture = (o, w) => {
        // replaces make the old versions' files genuinely dead, so a
        // mid-expire crash leaves real debris for the sweep to judge
        o.commit(df2(1L -> 1.0), s"$w/t")
        o.commit(df2(2L -> 2.0), s"$w/t", append = false)
        o.commit(df2(3L -> 3.0), s"$w/t", append = false)
        o.commit(df2(4L -> 4.0), s"$w/t", append = false)
        ()
      },
      op = (o, w) => { o.expire(s"$w/t", keepLast = 1); () },
      tableDir = w => s"$w/t",
      recovery = LogicalNoop))
  }

  test("crash sweep: rollback") {
    runFamily(Family(
      name = "rollback",
      fixture = (o, w) => {
        o.commit(df2(1L -> 1.0), s"$w/t")
        o.commit(df2(2L -> 2.0), s"$w/t")
        ()
      },
      op = (o, w) => { o.rollback(s"$w/t", toVersion = 1); () },
      tableDir = w => s"$w/t",
      recovery = RetryAlways))
  }

  test("crash sweep: equality-delete landing (deleteByKeys)") {
    runFamily(Family(
      name = "eqdelete",
      fixture = (o, w) => {
        o.commit(df2(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0), s"$w/t")
        ()
      },
      op = (o, w) => { o.deleteByKeys(spark, s"$w/t", "id",
        Seq(1L, 2L).toDF("id")); () },
      tableDir = w => s"$w/t",
      recovery = RetryAlways))
  }

  test("crash sweep: append onto a SEGMENTED-manifest table — kills " +
      "between segment writes and the manifest publish") {
    runFamily(Family(
      name = "seg-append",
      fixture = (o, w) => {
        o.commit(df2(1L -> 1.0, 2L -> 2.0), s"$w/t")
        // fold EVERY bulk line into segment files: the commit path now
        // writes segments before the manifest createExclusive, opening
        // the exact window this family attacks
        o.setTableProperty(s"$w/t", "manifest.fold.inline", "1")
        o.commit(df2(3L -> 3.0), s"$w/t")
        ()
      },
      op = (o, w) => { o.commitOnce(df2(4L -> 4.0, 5L -> 5.0), s"$w/t",
        txnId = "fi-txn-seg"); () },
      tableDir = w => s"$w/t",
      recovery = RetryAlways))
  }

  test("crash sweep: z-ordered clustered commit (no txn id: recovery " +
      "must inspect the head before retrying)") {
    runFamily(Family(
      name = "clustered",
      fixture = (o, w) => { o.commit(df2(1L -> 1.0, 2L -> 2.0), s"$w/t"); () },
      op = (o, w) => { o.commitClustered(df2(3L -> 3.0, 4L -> 4.0),
        s"$w/t", zCols = Seq("id"), statCols = Seq("id", "v"),
        numFiles = 2); () },
      tableDir = w => s"$w/t",
      recovery = RetryIfPre))
  }

  test("crash sweep: constraint-gated append — the born-valid scan and " +
      "the publish must not tear") {
    runFamily(Family(
      name = "constrained",
      fixture = (o, w) => {
        o.commit(df2(1L -> 1.0, 2L -> 2.0), s"$w/t")
        o.addConstraint(spark, s"$w/t", "v_pos", "v > 0")
        ()
      },
      op = (o, w) => { o.commitOnce(df2(3L -> 3.0), s"$w/t",
        txnId = "fi-txn-c"); () },
      tableDir = w => s"$w/t",
      recovery = RetryAlways))
  }

  test("a latched crash IO refuses every post-trip call — the model " +
      "actually models a dead process") {
    val io = new CrashingTableIO(TableIO.local, 0)
    intercept[SimulatedCrash] { io.mkdirs("/tmp/fi-dead-probe") }
    assert(io.tripped)
    intercept[SimulatedCrash] { io.exists("/tmp") }
    intercept[SimulatedCrash] { io.readLines("/tmp/x") }
    intercept[SimulatedCrash] { io.writeLines("/tmp/x", Seq("a")) }
  }
}
