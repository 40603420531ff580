package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
  * Scale design: the rewrite sizes its output from the data actually
  * present (`bytes / targetFileBytes` output files, via one cheap file
  * listing — no data pass), repartitions ONCE, and writes to a staging
  * directory first, swapping in only after the write commits — a failed
  * compaction leaves the live directory untouched (the same
  * stage-then-commit discipline as the reference's swallow-vs-fail load
  * boundary). For date-partitioned layouts, compact one partition
  * directory at a time — that bounds the unit of work AND of rollback.
  */
object Compaction {

  /** Parquet data files under `dir` (non-recursive; ignores _SUCCESS etc.). */
  private def parquetFiles(dir: String): Seq[java.nio.file.Path] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq

  /** Compact the parquet directory `dir` into ~`targetFileBytes` files.
    * Returns (filesBefore, filesAfter). No-op (and no data pass) when the
    * directory already has no more files than the target count. */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val before = parquetFiles(dir)
    val bytes = before.map(Files.size(_)).sum
    val targetFiles = math.max(1, math.ceil(
      bytes.toDouble / targetFileBytes).toInt)
    if (before.size <= targetFiles) return (before.size, before.size)

    val staging = dir.stripSuffix("/") + "._compacting"
    // one data pass: read -> repartition to the byte-derived file count ->
    // write to staging. repartition (not coalesce): coalesce would chain
    // upstream parallelism to the output file count.
    spark.read.parquet(dir)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    // commit: swap staged files in, then drop the originals. Staging wrote
    // fresh part-file names (UUID-suffixed), so moves can't collide with
    // the originals being replaced.
    val staged = parquetFiles(staging)
    staged.foreach { p =>
      Files.move(p, Paths.get(dir).resolve(p.getFileName),
        StandardCopyOption.ATOMIC_MOVE)
    }
    before.foreach(Files.delete(_))
    Files.list(Paths.get(staging)).iterator().asScala.toSeq
      .foreach(Files.delete(_))
    Files.delete(Paths.get(staging))
    (before.size, parquetFiles(dir).size)
  }
}
