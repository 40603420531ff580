package graft.sinks

import java.util.concurrent.Semaphore

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Deterministic vacuum-vs-LIVE-writer interplay probes — the axis the
  * crash sweep (one dead writer) and the schedule fuzzer (live writers,
  * no sweeper) both leave open. The protocol's claim is layered:
  *
  *  1. grace window: a sweep only reclaims batch directories whose
  *     whole tree is older than `graceMs`, so an in-flight commit's
  *     files are never candidates while the writer is merely slow;
  *  2. publisher guard: a writer stalled PAST the grace window (GC
  *     pause, network partition — the misconfiguration every
  *     object-store table format documents as fatal) re-verifies its
  *     batch directories right after winning the manifest race and
  *     un-publishes + throws if the sweep got there first — a loud
  *     retryable refusal instead of a manifest referencing deleted
  *     files (silent data loss at the next read);
  *  3. vacuum re-scan: before each delete the sweep re-reads versions
  *     published SINCE its reference snapshot (O(new commits), not a
  *     full rescan), so a publish that lands mid-sweep keeps its
  *     files even when they aged past the grace window.
  *
  * Both directions of the race are pinned here with gated IO (park a
  * thread at an exact protocol step, run the adversary, resume).
  */
class VacuumInterplaySpec extends SparkSpec {
  import spark.implicits._

  private def rows2(rs: (Long, Double)*): DataFrame = rs.toSeq.toDF("id", "v")
  private def cleanOps = new VersionedTableOps(TableIO.local)
  private def served(dir: String): Set[(Long, Double)] =
    cleanOps.read(spark, dir).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet

  /** Delegating IO that parks ONCE at the first call matching `trip`:
    * releases `arrived`, blocks until `resume`. */
  private final class GateIO(inner: TableIO, arrived: Semaphore,
      resume: Semaphore)(trip: (String, String) => Boolean)
      extends TableIO {
    private val tripped = new java.util.concurrent.atomic.AtomicBoolean(false)
    private def gate(call: String, path: String): Unit =
      if (trip(call, path) && tripped.compareAndSet(false, true)) {
        arrived.release(); resume.acquire()
      }
    override def mkdirs(dir: String): Unit = {
      gate("mkdirs", dir); inner.mkdirs(dir)
    }
    override def exists(path: String): Boolean = {
      gate("exists", path); inner.exists(path)
    }
    override def list(dir: String): Seq[String] = {
      gate("list", dir); inner.list(dir)
    }
    override def readLines(path: String): Seq[String] = {
      gate("readLines", path); inner.readLines(path)
    }
    override def writeLines(path: String, lines: Seq[String]): Unit = {
      gate("writeLines", path); inner.writeLines(path, lines)
    }
    override def createExclusive(path: String, lines: Seq[String]): Boolean = {
      gate("createExclusive", path); inner.createExclusive(path, lines)
    }
    override def delete(path: String): Unit = {
      gate("delete", path); inner.delete(path)
    }
    override def size(path: String): Long = { gate("size", path); inner.size(path) }
    override def isDir(path: String): Boolean = {
      gate("isDir", path); inner.isDir(path)
    }
    override def mtime(path: String): Long = {
      gate("mtime", path); inner.mtime(path)
    }
  }

  private val atManifestPublish: (String, String) => Boolean =
    (call, path) => call == "createExclusive" &&
      path.matches(".*/manifests/v\\d+")

  test("a writer stalled past the grace window refuses loudly instead " +
      "of publishing a manifest over vacuumed files") {
    val work = tmpDir("vac-stall")
    val dir = s"$work/t"
    cleanOps.commit(rows2(1L -> 1.0, 2L -> 2.0), dir)
    val atPublish = new Semaphore(0); val resume = new Semaphore(0)
    val gio = new GateIO(TableIO.local, atPublish, resume)(atManifestPublish)
    @volatile var thrown: Option[Throwable] = None
    val w = new Thread(() => {
      try { new VersionedTableOps(gio).commit(rows2(9L -> 9.0), dir); () }
      catch { case t: Throwable => thrown = Some(t) }
    }, "stalled-writer")
    w.start()
    atPublish.acquire() // batch on disk, manifest not yet attempted
    // the "stall": the unpublished batch ages past the (negative) grace
    // and an operator's sweep reclaims it as debris
    val removed = cleanOps.vacuumOrphans(dir, graceMs = -60000L)
    assert(removed >= 1, "the sweep should reclaim the stalled batch")
    resume.release()
    w.join(30000)
    assert(thrown.exists(_.getMessage.contains("vanished before publish")),
      s"the stalled writer must refuse loudly; got $thrown")
    assert(served(dir) == Set(1L -> 1.0, 2L -> 2.0),
      "pre-state must survive the refused commit untouched")
    assert(cleanOps.versions(dir).size == 1,
      "the guard must un-publish its own manifest")
    // nothing torn left behind: a fresh sweep still converges
    cleanOps.vacuumOrphans(dir, graceMs = -60000L)
    assert(served(dir) == Set(1L -> 1.0, 2L -> 2.0))
  }

  test("a publish landing mid-sweep is spared by vacuum's pre-delete " +
      "re-scan") {
    val work = tmpDir("vac-respect")
    val dir = s"$work/t"
    cleanOps.commit(rows2(1L -> 1.0), dir)
    // the writer parks just before publish, batch already on disk
    val atPublish = new Semaphore(0); val resumePub = new Semaphore(0)
    val wio = new GateIO(TableIO.local, atPublish, resumePub)(atManifestPublish)
    @volatile var werr: Option[Throwable] = None
    val w = new Thread(() => {
      try { new VersionedTableOps(wio).commit(rows2(7L -> 7.0), dir); () }
      catch { case t: Throwable => werr = Some(t) }
    }, "mid-sweep-writer")
    w.start(); atPublish.acquire()
    // the sweep parks right after selecting its candidates (first mtime
    // probe of a data path) — the stale-candidate window
    val atScan = new Semaphore(0); val resumeVac = new Semaphore(0)
    val vio = new GateIO(TableIO.local, atScan, resumeVac)(
      (call, path) => call == "mtime" && path.contains("/data/"))
    @volatile var removed = -1
    @volatile var verr: Option[Throwable] = None
    val vac = new Thread(() => {
      try removed =
        new VersionedTableOps(vio).vacuumOrphans(dir, graceMs = -60000L)
      catch { case t: Throwable => verr = Some(t) }
    }, "mid-sweep-vacuum")
    vac.start(); atScan.acquire()
    // the publish lands while the sweep holds its stale candidate list
    resumePub.release(); w.join(30000)
    assert(werr.isEmpty, s"writer must land cleanly: $werr")
    resumeVac.release(); vac.join(30000)
    assert(verr.isEmpty, s"vacuum must complete cleanly: $verr")
    assert(removed == 0,
      s"the re-scan must spare the just-published batch (removed=$removed)")
    assert(served(dir) == Set(1L -> 1.0, 7L -> 7.0),
      "the mid-sweep commit's rows must survive the sweep")
    assert(cleanOps.read(spark, dir).count() == 2)
  }
}
