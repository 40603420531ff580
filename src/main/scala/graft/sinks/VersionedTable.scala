package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.Parity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Versioned landed table — snapshot isolation, time travel, and rollback
  * via a manifest log: the core protocol of every lake table format
  * (Iceberg's snapshot list, Delta's transaction log), reduced to its
  * engine-native essentials, because a 100 TB landing that only ever
  * appends files in place has no consistent answer to "what did the table
  * contain when yesterday's training job started?".
  *
  * Protocol:
  * - data files are IMMUTABLE parquet, written once under `data/`, never
  *   modified, never deleted by commits;
  * - a snapshot is a manifest (`manifests/v{N}`) listing its data files,
  *   one path per line;
  * - a commit writes data files first, then publishes the manifest with
  *   ONE atomic create ([[TableIO.createExclusive]]) — optimistic
  *   concurrency: if v{N} already exists (a concurrent writer won), an
  *   APPEND commit re-resolves the head and republishes the NEW head's
  *   file list plus its own files ([[publishOnHead]]), so the loser's
  *   retry carries the winner's rows forward — retrying with the stale
  *   base would silently drop the winner's files from the head lineage
  *   (and expiration would then delete them); nothing is ever overwritten;
  * - a reader resolves a manifest ONCE (latest, or a pinned version) and
  *   reads exactly its files — a commit racing the read cannot tear it,
  *   because the files a manifest references are immutable;
  * - rollback is just a NEW manifest pointing at an old file set — history
  *   is append-only, so the bad version stays inspectable.
  *
  * File deletion is a separate, orthogonal GC ("expire snapshots older
  * than N") that removes files referenced by no retained manifest — the
  * same separation the real formats make.
  *
  * All metadata IO goes through a [[TableIO]]: `java.nio` + hard links
  * locally, Hadoop `FileSystem` where a real landing lives. The default
  * [[VersionedTable]] object binds the local backend; bind
  * `new VersionedTableOps(new HadoopTableIO(conf))` for the rest.
  */
class VersionedTableOps(protected val io: TableIO) {

  protected def manifestDir(dir: String): String = s"$dir/manifests"
  private def manifestPath(dir: String, v: Int) = s"${manifestDir(dir)}/v$v"
  private def statsPath(dir: String, v: Int) = s"${manifestDir(dir)}/s$v"

  /** Committed versions, ascending (empty if the table doesn't exist). */
  def versions(dir: String): Seq[Int] =
    io.list(manifestDir(dir))
      .collect { case s if s.startsWith("v") => s.drop(1).toInt }
      .sorted

  // `#`-prefixed manifest lines are metadata headers (e.g. the transaction
  // id a streaming commit carries), never file paths
  private def filesOf(dir: String, version: Int): Seq[String] =
    io.readLines(manifestPath(dir, version))
      .filter(_.nonEmpty).filterNot(_.startsWith("#"))

  /** Transaction ids carried by committed manifests — the replay ledger
    * for [[commitOnce]]. */
  def committedTxns(dir: String): Set[String] =
    versions(dir).flatMap { v =>
      io.readLines(manifestPath(dir, v))
        .collect { case l if l.startsWith("#txn=") => l.drop(5) }
    }.toSet

  /** Publish exactly `lines` as the next version ≥ `want`; retries upward
    * on collision with the SAME content — correct for the fixed-file-set
    * publishes (rollback, logical overwrite), where the intended head
    * state does not depend on what it replaces. Append commits must NOT
    * use this: see [[publishOnHead]]. Returns the committed version. */
  private[sinks] def publish(dir: String, want: Int,
                             lines: Seq[String]): Int = {
    io.mkdirs(manifestDir(dir))
    var v = want
    while (!io.createExclusive(manifestPath(dir, v), lines)) v += 1
    v
  }

  /** OCC publish for commits whose manifest DERIVES from the head: every
    * attempt re-resolves the current head and rebuilds its manifest lines
    * via `build(headVersion, headFiles)`, so a losing concurrent writer
    * merges the winner's file list instead of republishing a stale one.
    * Returns the committed version. */
  private def publishOnHead(dir: String)(
      build: (Option[Int], Seq[String]) => Seq[String]): Int = {
    io.mkdirs(manifestDir(dir))
    var committed = -1
    while (committed < 0) {
      val head = versions(dir).lastOption
      val base = head.map(filesOf(dir, _)).getOrElse(Seq.empty)
      val v = head.getOrElse(0) + 1
      if (io.createExclusive(manifestPath(dir, v), build(head, base)))
        committed = v
    }
    committed
  }

  /** Write `df` as one immutable batch under `data/`; returns file paths. */
  private def writeBatch(df: DataFrame, dir: String): Seq[String] = {
    val batchDir = s"$dir/data/${java.util.UUID.randomUUID}"
    df.write.parquet(batchDir)
    io.list(batchDir).filter(_.endsWith(".parquet")).sorted
      .map(n => s"$batchDir/$n")
  }

  /** Land `df` as a new snapshot. `append = true` carries the current
    * head's files forward plus the new ones (re-resolved on every OCC
    * retry); `false` makes the new files the whole snapshot (logical
    * overwrite — old files stay on disk, still reachable through old
    * manifests). Returns the new version. */
  def commit(df: DataFrame, dir: String, append: Boolean = true,
             txnId: Option[String] = None): Int = {
    val newFiles = writeBatch(df, dir)
    val meta = txnId.map(t => s"#txn=$t").toSeq
    if (append) publishOnHead(dir)((_, base) => meta ++ base ++ newFiles)
    else publish(dir, versions(dir).lastOption.getOrElse(0) + 1,
      meta ++ newFiles)
  }

  /** Exactly-once commit for replayable sources (Structured Streaming's
    * foreachBatch): the transaction id rides IN the manifest, so the
    * manifest publish is itself the atomic "this batch landed" marker —
    * there is no crash window between data commit and marker write in
    * which a replay could double-land (the Delta `txn` action, in manifest
    * form). A redelivered (txnId already committed) batch is a no-op that
    * returns the original version. Assumes one writer per txn namespace —
    * exactly what foreachBatch guarantees per query. */
  def commitOnce(df: DataFrame, dir: String, txnId: String,
                 append: Boolean = true): Int =
    if (committedTxns(dir).contains(txnId)) {
      versions(dir).reverse.find { v =>
        io.readLines(manifestPath(dir, v)).contains(s"#txn=$txnId")
      }.get
    } else commit(df, dir, append, txnId = Some(txnId))

  /** Read a snapshot: the pinned `version`, or the head. The file list is
    * resolved HERE, once — the returned DataFrame keeps reading this exact
    * snapshot no matter what commits after. */
  def read(spark: SparkSession, dir: String,
           version: Option[Int] = None): DataFrame = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"no committed version at $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    spark.read.parquet(filesOf(dir, v): _*)
  }

  /** Roll the head back to `toVersion`'s file set — as a NEW version, so
    * the rolled-back state stays inspectable. */
  def rollback(dir: String, toVersion: Int): Int =
    publish(dir, versions(dir).last + 1, filesOf(dir, toVersion))

  // ---- manifest-level file skipping (Iceberg-style scan planning) ----

  /** Per-file (min, max) stats for `statCols`, landed NEXT TO a version's
    * manifest as `s{N}` — the metadata that lets a reader prune FILES
    * before Spark even lists them, which at 100 TB is the difference
    * between planning over a manifest and listing a bucket. Stats are an
    * OPTIMIZATION layer: the manifest stays the single source of truth,
    * a version without a stats file (crash between publish and stats
    * write, or a commit that didn't collect them) degrades to no pruning,
    * never to wrong results. Format: tab-separated `path col min max`
    * per line, doubles. */
  def writeStats(spark: SparkSession, dir: String, version: Int,
                 statCols: Seq[String]): Unit =
    io.writeLines(statsPath(dir, version),
      statsLines(spark, filesOf(dir, version), statCols))

  /** One stats line per (file, col) over exactly `files` — one grouped
    * aggregate, one scan of those files. */
  private def statsLines(spark: SparkSession, files: Seq[String],
                         statCols: Seq[String]): Seq[String] = {
    if (files.isEmpty) return Seq.empty
    val df = spark.read.parquet(files: _*)
      .withColumn("__file", input_file_name())
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max"))
    }
    df.groupBy(col("__file")).agg(aggs.head, aggs.tail: _*)
      .collect().toSeq
      .flatMap { r =>
        // input_file_name is URI-formatted (file://...); normalize back to
        // the manifest's plain-path form so lookups match
        val path = r.getString(0).stripPrefix("file://").stripPrefix("file:")
        statCols.map { c =>
          s"$path\t$c\t${r.getAs[Double](s"${c}__min")}" +
            s"\t${r.getAs[Double](s"${c}__max")}"
        }
      }
  }

  /** Stats lines of `headVersion` restricted to the files in `base` —
    * the carry-forward read, re-derived per OCC attempt because the head
    * (and thus the stats file to inherit) can move under a retry. */
  private def carriedStats(dir: String, headVersion: Option[Int],
                           base: Seq[String]): Seq[String] =
    headVersion.toSeq.flatMap { h =>
      val p = statsPath(dir, h)
      if (!io.exists(p)) Seq.empty
      else {
        val baseSet = base.toSet
        io.readLines(p).filter(l => baseSet.contains(l.takeWhile(_ != '\t')))
      }
    }

  /** Commit a batch in the FULL landing shape: the batch is z-ordered on
    * `zCols` ([[Layout.writeZordered]] — quantile rank buckets → Morton
    * code → one range shuffle, so each file covers a tight hyper-box),
    * then published with per-file stats CARRIED FORWARD incrementally:
    * stats lines for files inherited from the previous head are copied
    * from its stats file, and only the NEW batch's files are scanned —
    * per-commit stats cost is O(batch), never O(table), which is what
    * makes stats maintenance viable on a 100 TB landing. Clustered files
    * + manifest stats is the combination that makes [[prunedRead]]
    * actually skip: z-order gives files disjoint ranges, stats make the
    * ranges visible at planning time. */
  def commitClustered(df: DataFrame, dir: String, zCols: Seq[String],
                      statCols: Seq[String], numFiles: Int = 16,
                      bitsPerDim: Int = 6, append: Boolean = true): Int = {
    val spark = df.sparkSession
    val batchDir = s"$dir/data/${java.util.UUID.randomUUID}"
    Layout.writeZordered(df, zCols, batchDir, numFiles, bitsPerDim)
    val newFiles = io.list(batchDir).filter(_.endsWith(".parquet")).sorted
      .map(n => s"$batchDir/$n")
    // the new files' stats need a scan — do it ONCE, outside the OCC loop
    val newStats = statsLines(spark, newFiles, statCols)
    if (!append) {
      val v = publish(dir, versions(dir).lastOption.getOrElse(0) + 1,
        newFiles)
      io.writeLines(statsPath(dir, v), newStats)
      v
    } else {
      var carried: Seq[String] = Seq.empty
      val v = publishOnHead(dir) { (head, base) =>
        carried = carriedStats(dir, head, base)
        base ++ newFiles
      }
      io.writeLines(statsPath(dir, v), carried ++ newStats)
      v
    }
  }

  /** (file → (min, max)) for `col` at `version`; empty if no stats. */
  private def statsOf(dir: String, version: Int,
                      column: String): Map[String, (Double, Double)] = {
    val p = statsPath(dir, version)
    if (!io.exists(p)) Map.empty
    else io.readLines(p)
      .map(_.split('\t'))
      .collect { case Array(f, c, lo, hi) if c == column =>
        f -> (lo.toDouble, hi.toDouble) }
      .toMap
  }

  /** Read a snapshot with manifest-level file skipping: files whose
    * [min, max] for `column` cannot intersect [lo, hi] are dropped from
    * the scan BEFORE Spark sees them; files without stats are kept
    * (pruning must never lose rows). The caller still applies its exact
    * predicate — stats pruning is a superset guarantee, same contract as
    * parquet row-group skipping one level up. */
  def prunedRead(spark: SparkSession, dir: String, column: String,
                 lo: Double, hi: Double,
                 version: Option[Int] = None): DataFrame = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"no committed version at $dir")
    val v = version.getOrElse(vs.last)
    val stats = statsOf(dir, v, column)
    val keep = filesOf(dir, v).filter { f =>
      stats.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi }
    }
    if (keep.isEmpty) read(spark, dir, Some(v)).limit(0)
    else spark.read.parquet(keep: _*)
  }

  /** Files `prunedRead` would scan — exposed so specs (and operators) can
    * assert the skipping itself, not just result correctness. */
  private[graft] def prunedFiles(dir: String, version: Int, column: String,
                                 lo: Double, hi: Double): Seq[String] = {
    val stats = statsOf(dir, version, column)
    filesOf(dir, version).filter { f =>
      stats.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi }
    }
  }

  /** Expire history: drop all but the newest `keepLast` manifests and
    * delete data files no RETAINED manifest references — the orthogonal
    * GC pass every manifest-log format pairs with commits (commits never
    * delete; only expiration does). Readers pinned to an expired version
    * fail loudly on their next resolve, which is the contract: retention
    * is an operational policy, not a correctness knob. Note for
    * [[commitOnce]] users: expiring a manifest also forgets its txn id,
    * so retention must exceed the source's replay horizon (the same
    * contract as Delta's txn retention). Returns the number of data files
    * deleted. */
  def expire(dir: String, keepLast: Int): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val vs = versions(dir)
    val (dead, kept) = vs.splitAt(math.max(0, vs.length - keepLast))
    val liveFiles = kept.flatMap(filesOf(dir, _)).toSet
    val deadFiles = dead.flatMap(filesOf(dir, _)).toSet -- liveFiles
    // manifests first: a crash mid-expire must never leave a manifest
    // pointing at deleted files
    dead.foreach { v =>
      io.delete(manifestPath(dir, v))
      io.delete(statsPath(dir, v))
    }
    deadFiles.foreach(io.delete)
    deadFiles.size
  }
}

/** The default (local-filesystem) binding, plus the oracle-checked query. */
object VersionedTable extends VersionedTableOps(TableIO.local) {

  /** q_time_travel — the protocol end to end: v1 lands the even half of
    * events, v2 appends the odd half, and the query reads BOTH versions
    * through their pinned manifests, joining per-type counts. The oracle
    * recomputes both snapshots' aggregates from the raw table with the
    * vintage rule inlined — a hash match proves the manifests capture
    * exactly the right file sets and that v1 still reads correctly after
    * v2 committed. */
  def qTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_versioned_")
    val dir = tmp.toString
    val v1 = commit(ev.filter(col("event_id") % 2 === 0), dir)
    val v2 = commit(ev.filter(col("event_id") % 2 === 1), dir)
    java.nio.file.Files.walk(tmp).forEach(p => p.toFile.deleteOnExit())
    val a = read(spark, dir, Some(v1))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_v1"),
        round(Parity.decSum2(col("value")), 2).as("sum_v1"))
    val b = read(spark, dir, Some(v2))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_v2"),
        round(Parity.decSum2(col("value")), 2).as("sum_v2"))
    a.join(b, "event_type").orderBy(col("event_type"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_travel" -> (qTimeTravel _))

  val oracles: Map[String, String] = Map(
    "q_time_travel" ->
      """SELECT event_type,
        |  COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS n_v1,
        |  ROUND(CAST(SUM(CASE WHEN event_id % 2 = 0
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS sum_v1,
        |  COUNT(*) AS n_v2,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_v2
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
}
