package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.{CrashingTableIO, MutationCountingIO, TableIO,
  VersionedTable}

/** Crash-injection sweep over the STREAMING exactly-once seam — the
  * [[graft.sinks.FaultInjectionSpec]] discipline applied to the sink
  * modes a micro-batch pipeline actually runs. The claim under attack:
  * `commitOnce` keyed by `queryName:batchId` makes a foreachBatch
  * redelivery a no-op, so a crash ANYWHERE between data-file landing,
  * manifest publish, and Spark's checkpoint offset write can neither
  * lose nor duplicate a batch.
  *
  * The harness models Structured Streaming's replay contract directly
  * (foreachBatch: a batch whose offset write did not commit is
  * REDELIVERED with the same batchId). Per sink mode, per kill index:
  *
  *   1. deliver batch 0 cleanly;
  *   2. deliver batch 1 with the backend latched to die at the Nth
  *      metadata mutation (a dead process: later IO fails too);
  *   3. RESTART: redeliver batch 1 on a clean backend (the offset never
  *      committed);
  *   4. redeliver batch 1 AGAIN (the other window: sink commit
  *      succeeded, then the OFFSET write died — Spark replays a batch
  *      the table already owns);
  *   5. deliver batch 2; assert every batch's rows serve EXACTLY once,
  *      then the vacuum invariants (debris reclaims, rows unchanged,
  *      second sweep empty).
  *
  * Three sink modes sweep: the snapshot append ([[VersionedStream]]),
  * the CDC merge ([[MergeStream]] — a COW rewrite, so mid-operation
  * kills leave rewritten-file debris), and the dual-table quality gate
  * ([[ProfileGate]] — TWO commitOnce landings under ONE txn, so a kill
  * between them tears ACROSS tables and replay must heal the pair).
  * Reference anchor: the reference's 2-minute cadence with Airflow's
  * at-least-once retries (weather_etl.py:20–29) is exactly this replay
  * window; its MySQL check-then-insert leaves it open.
  */
class StreamSinkFaultSpec extends SparkSpec {
  import spark.implicits._

  private def rows2(rs: (Long, Double)*): DataFrame =
    rs.toSeq.toDF("id", "v")

  /** One sink mode: fixture builds referenced artifacts + the batch-0
    * target state under `work`; deliver lands batch `b`; served reads
    * the output table(s) as a canonical multiset. */
  private case class Mode(
      name: String,
      fixture: String => Unit,
      deliver: (String, Long) => Unit,
      served: String => Seq[String],
      expectedAfter012: String => Seq[String],
      vacuumDirs: String => Seq[String])

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

  private def sortedRows(dir: String): Seq[String] =
    VersionedTable.read(spark, dir).collect().map(_.toString).sorted.toSeq

  // ---- mode 1: snapshot append (VersionedStream) --------------------

  private def batchRows(b: Long): Seq[(Long, Double)] =
    Seq((b * 10 + 1, b + 0.5), (b * 10 + 2, b + 1.5))

  private val appendMode = Mode(
    name = "versioned-stream append",
    fixture = _ => (),
    deliver = (w, b) => {
      VersionedStream.landBatch(rows2(batchRows(b): _*), s"$w/out",
        "fs-q", b); ()
    },
    served = w => sortedRows(s"$w/out"),
    expectedAfter012 = { w =>
      val df = rows2((0L to 2L).flatMap(batchRows): _*)
      df.collect().map(_.toString).sorted.toSeq
    },
    vacuumDirs = w => Seq(s"$w/out"))

  // ---- mode 2: CDC merge (MergeStream) -------------------------------

  private def cdcBatch(b: Long): DataFrame =
    Seq((1L, 100.0 + b, "u", b), ((100 + b), 0.5 + b, "u", b))
      .map { case (id, v, op, ord) => (id.toLong, v, op, ord) }
      .toDF("id", "v", "op", "ord")

  private val mergeMode = Mode(
    name = "merge-stream CDC",
    fixture = w =>
      { VersionedTable.commit(rows2(1L -> 1.0, 2L -> 2.0), s"$w/out"); () },
    deliver = (w, b) => {
      MergeStream.applyBatch(
        MergeStream.foldChanges(cdcBatch(b), "id", "ord"),
        s"$w/out", "id", "fs-m", b); ()
    },
    served = w => sortedRows(s"$w/out"),
    expectedAfter012 = { w =>
      // upserts: key 1 ends at 102.0 (batch 2 last); inserts 100..102
      rows2(1L -> 102.0, 2L -> 2.0, 100L -> 0.5, 101L -> 1.5,
        102L -> 2.5).collect().map(_.toString).sorted.toSeq
    },
    vacuumDirs = w => Seq(s"$w/out"))

  // ---- mode 3: dual-table quality gate (ProfileGate) -----------------

  private val gateMode = Mode(
    name = "profile-gate dual landing",
    fixture = w => ProfileGate.writeReference(
      rows2((1L to 50L).map(i => i -> (i % 10).toDouble): _*),
      Seq("v"), s"$w/ref"),
    deliver = (w, b) => {
      ProfileGate.gateBatch(rows2(batchRows(b): _*), b, Seq("v"),
        s"$w/ref", s"$w/out", s"$w/quarantine", s"$w/hist",
        maxNullRise = 1.0, maxMeanShift = 1e9, queryName = "fs-g")
      ()
    },
    served = { w =>
      val out = sortedRows(s"$w/out")
      // the history table must carry each batch's stamp exactly once
      val hist = VersionedTable.read(spark, s"$w/hist")
        .groupBy("batch_id").count().collect()
        .map(r => s"hist:${r.getLong(0)}x${r.getLong(1)}").sorted.toSeq
      out ++ hist
    },
    expectedAfter012 = { w =>
      val out = rows2((0L to 2L).flatMap(batchRows): _*)
        .collect().map(_.toString).sorted.toSeq
      out ++ Seq("hist:0x1", "hist:1x1", "hist:2x1")
    },
    vacuumDirs = w => Seq(s"$w/out", s"$w/hist"))

  // ---- the sweep ------------------------------------------------------

  private def sweep(m: Mode): Unit = {
    val prev = VersionedTable.backend
    val base = tmpDir(s"fsk-${m.name.takeWhile(_ != ' ')}")
    try {
      // fixture snapshot to replay per kill point
      val fix = s"$base/fixture"
      Files.createDirectories(Paths.get(fix))
      m.fixture(fix)
      // clean run: batch 0, then COUNT batch 1's metadata mutations
      val probe = s"$base/probe"
      copyTree(fix, probe)
      m.deliver(probe, 0L)
      val counter = new MutationCountingIO(TableIO.local)
      VersionedTable.setBackend(counter)
      try m.deliver(probe, 1L)
      finally VersionedTable.setBackend(TableIO.local)
      val total = counter.count
      assert(total > 0, s"${m.name}: batch delivery mutated no metadata")
      info(s"${m.name}: sweeping $total kill points")
      for (n <- 0 until total) {
        val at = s"${m.name} killed before mutation $n/$total"
        val work = s"$base/k$n"
        copyTree(fix, work)
        m.deliver(work, 0L)
        val cio = new CrashingTableIO(TableIO.local, n)
        VersionedTable.setBackend(cio)
        val crashed =
          try { m.deliver(work, 1L); false }
          catch { case _: Throwable => true }
          finally VersionedTable.setBackend(TableIO.local)
        assert(crashed || cio.tripped || n >= total,
          s"$at: the kill never fired")
        // restart: the offset never committed -> batch 1 redelivers
        m.deliver(work, 1L)
        // the OTHER window: sink committed, offset write died -> the
        // same batch redelivers once more over a fully-landed state
        m.deliver(work, 1L)
        m.deliver(work, 2L)
        val now = m.served(work)
        assert(now == m.expectedAfter012(work),
          s"$at: replay did not converge to exactly-once\n  " +
            s"served=$now\n  expected=${m.expectedAfter012(work)}")
        m.vacuumDirs(work).foreach(d =>
          VersionedTable.vacuumOrphans(d, graceMs = -60000L))
        assert(m.served(work) == now, s"$at: vacuum changed served rows")
        m.vacuumDirs(work).foreach { d =>
          val again = VersionedTable.vacuumOrphans(d, graceMs = -60000L)
          assert(again == 0,
            s"$at: $again orphan(s) survived the first vacuum at $d")
        }
        deleteTree(work)
      }
    } finally {
      VersionedTable.setBackend(prev)
      deleteTree(base)
    }
  }

  test("streaming crash sweep: snapshot append lands each batch exactly " +
      "once across every kill index + the offset-write window") {
    sweep(appendMode)
  }

  test("streaming crash sweep: CDC merge replays to exactly-once across " +
      "every kill index (rewritten-file debris reclaims clean)") {
    sweep(mergeMode)
  }

  test("streaming crash sweep: the dual-table gate heals a kill BETWEEN " +
      "its two landings — one txn, two tables, no torn pair survives") {
    sweep(gateMode)
  }
}
