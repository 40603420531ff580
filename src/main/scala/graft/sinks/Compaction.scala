package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet directories — the janitorial operator
  * every long-running ingestion table needs.
  *
  * A micro-batch pipeline (the reference lands ~1 row per 2 minutes; any
  * streaming sink has the same shape) accretes one file per trigger per
  * partition. At 100 TB that means millions of KB-sized files, and the
  * table's scan cost becomes dominated by file-open/footer-read overhead
  * and listing, not bytes — compaction rewrites a directory into
  * target-sized files, amortizing that overhead away.
  *
  * Commit protocol (single compactor per directory; appenders may keep
  * landing files concurrently):
  *
  *  1. snapshot the file list; rewrite EXACTLY those files into a staging
  *     directory (one data pass, `bytes / targetFileBytes` output files);
  *  2. write a manifest of the compacted source names into staging — the
  *     manifest IS the commit marker;
  *  3. swap: rename live dir aside, rename staging in, move any file that
  *     landed after the snapshot (present aside, absent from the manifest)
  *     into the new dir, drop the old dir.
  *
  * Directory renames are atomic on a POSIX filesystem and every crash
  * window is recoverable: [[recover]] rolls forward iff the manifest
  * exists (completing the swap and the late-file rescue) and rolls back
  * otherwise, leaving the live directory byte-identical. [[compact]] runs
  * it first, so a crashed compaction heals on the next call. Readers see
  * the old listing or the new one; the only reader-visible window is the
  * instant between the two renames (an object store / lake table would
  * commit through table metadata instead — same protocol, no window).
  * For date-partitioned layouts, compact one partition directory at a
  * time — that bounds the unit of work AND of rollback.
  */
object Compaction {

  private val ManifestName = "_graft_compacted_sources"

  private def staging(dir: String): Path =
    Paths.get(dir.stripSuffix("/") + "._compacted")
  private def retired(dir: String): Path =
    Paths.get(dir.stripSuffix("/") + "._old")

  /** Parquet data files under `dir` (non-recursive; ignores _SUCCESS and
    * the manifest). The listing stream is closed eagerly. */
  private def parquetFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toList
    finally s.close()
  }

  /** Recursive delete: a crashed Spark write leaves nested `_temporary/`
    * directories, which a flat children-only delete would trip over —
    * wedging every later recover() on DirectoryNotEmptyException. */
  private def deleteTree(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.toList.foreach(Files.delete(_))
    finally s.close()
  }

  /** Files that landed in `old` after the manifest snapshot move to
    * `live`; everything else in `old` was compacted and drops with it. */
  private def rescueAndDrop(old: Path, live: Path): Unit = {
    val manifest = live.resolve(ManifestName)
    val compacted = Files.readAllLines(manifest).asScala.toSet
    parquetFiles(old)
      .filterNot(p => compacted.contains(p.getFileName.toString))
      .foreach(p => Files.move(p, live.resolve(p.getFileName)))
    deleteTree(old)
    Files.delete(manifest) // swap fully committed — marker no longer needed
  }

  /** Finish or undo an interrupted [[compact]]: roll forward iff the
    * staged manifest committed (including the window BEFORE the first
    * rename — a committed stage is never thrown away), roll back with the
    * live directory untouched otherwise. No-op on a clean directory.
    * Recovery itself assumes appenders are paused (it is the rare path);
    * the normal compact() path tolerates concurrent appends. */
  def recover(dir: String): Unit = {
    val (stg, old, live) = (staging(dir), retired(dir), Paths.get(dir))
    val committed = Files.exists(stg.resolve(ManifestName))
    if (Files.exists(old)) {
      if (Files.exists(live)) {
        if (Files.exists(live.resolve(ManifestName)))
          rescueAndDrop(old, live) // died between swap and rescue/cleanup
        else if (committed) {
          // an appender recreated live between the two renames (the swap's
          // second move then failed): its files are late arrivals — fold
          // them into old, finish the swap, and the rescue recovers them
          parquetFiles(live).foreach(p =>
            Files.move(p, old.resolve(p.getFileName)))
          deleteTree(live)
          Files.move(stg, live)
          rescueAndDrop(old, live)
        } else
          // old + live + no commit marker anywhere: not a state this
          // protocol produces — refuse to guess which files are data
          throw new IllegalStateException(
            s"Compaction.recover: $dir and $old both exist with no " +
              "manifest; manual inspection required")
      } else {
        if (committed) { Files.move(stg, live); rescueAndDrop(old, live) }
        else {
          Files.move(old, live) // not committed: restore the original
          if (Files.exists(stg)) deleteTree(stg)
        }
      }
    } else if (committed) {
      // crashed after the commit point but before the first rename:
      // resume the swap rather than discarding the committed data pass
      Files.move(live, old)
      Files.move(stg, live)
      rescueAndDrop(old, live)
    } else if (Files.exists(stg)) {
      deleteTree(stg) // uncommitted stage, live never touched: discard
    }
  }

  /** Compact the parquet directory `dir` into ~`targetFileBytes` files.
    * Returns (filesBefore, filesAfter). No-op (and no data pass) when the
    * directory already has no more files than the target count. */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    recover(dir)
    val live = Paths.get(dir)
    val before = parquetFiles(live)
    val bytes = before.map(Files.size(_)).sum
    val targetFiles = math.max(1, math.ceil(
      bytes.toDouble / targetFileBytes).toInt)
    if (before.size <= targetFiles) return (before.size, before.size)

    // one data pass over EXACTLY the snapshotted files — a file landing
    // after the snapshot is neither read, deleted, nor double-counted
    val stg = staging(dir)
    spark.read.parquet(before.map(_.toString): _*)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(stg.toString)
    // the manifest IS the commit point, so its appearance must be atomic:
    // a plain create+write could crash half-written and recover() would
    // roll forward on a truncated source list, duplicating unlisted files
    val tmp = stg.resolve(ManifestName + ".tmp")
    Files.write(tmp, before.map(_.getFileName.toString).mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, stg.resolve(ManifestName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE) // commit point

    Files.move(live, retired(dir))
    Files.move(stg, live)
    rescueAndDrop(retired(dir), live)
    (before.size, parquetFiles(live).size)
  }
}
