package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ext.DedupIndex

/** Streaming near-dedup against the landed MinHash index
  * ([[graft.ext.DedupIndex]]) — the continuous form of the daily-crawl
  * loop: every micro-batch is deduped against everything landed so far,
  * survivors are appended to the corpus, and the index is brought current
  * so the NEXT batch dedups against this one too.
  *
  * Replay safety is the designed-in property, not an afterthought. A
  * micro-batch can re-run after any crash, so both effects must be
  * idempotent AND mutually consistent:
  *
  *  - the OUTPUT append is guarded by a doc_id anti-join against the
  *    landed corpus (the [[CorpusStream.landBatch]] discipline);
  *  - the INDEX append is derived by RECONCILIATION, not fire-and-forget:
  *    after the output lands, the batch's docs that are landed-but-missing
  *    from the index get their signatures appended. Appending the index
  *    first would open the fatal window — crash between index-append and
  *    output-append, and the replayed batch self-condemns against its own
  *    signatures and the docs are lost forever. Reconciling FROM the
  *    landed output closes both windows: output-landed + index-missing →
  *    repaired on replay; both landed → no-op.
  *
  * In-batch near-duplicates are intentionally out of scope here (as in the
  * batch loop): the pair graph WITHIN a batch is [[graft.ext.DedupOps]]'
  * job; compose it in the same foreachBatch when wanted.
  */
object DedupStream {

  /** Dedup one micro-batch against the index, land survivors, reconcile
    * the index. Public so the spec (and batch backfills) can run the exact
    * per-batch transform. */
  def landBatch(batch: DataFrame, indexDir: String, outPath: String,
                threshold: Double = 0.5): Unit = {
    val spark = batch.sparkSession
    val outExists =
      java.nio.file.Files.exists(java.nio.file.Paths.get(outPath))
    val landedIds =
      if (outExists) spark.read.parquet(outPath).select(col("doc_id"))
      else spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
    val condemned = DedupIndex.condemnedIds(batch, indexDir, threshold)
    val fresh = batch
      .join(condemned, Seq("doc_id"), "left_anti")
      .join(landedIds, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fresh.count()
    fresh.write.mode("append").parquet(outPath)
    // reconcile the index from the landed truth: batch docs that are now
    // landed but have no signature yet (this batch's fresh docs, plus any
    // replay-repair leftovers) — membership probes read doc_id columns
    // only, so both scans are column-pruned
    val sigIds = spark.read.parquet(s"$indexDir/sigs").select(col("doc_id"))
    val needIndex = batch
      .join(condemned, Seq("doc_id"), "left_anti")
      .join(sigIds, Seq("doc_id"), "left_anti")
    DedupIndex.appendToIndex(needIndex, indexDir)
    fresh.unpersist(blocking = false)
    condemned.unpersist(blocking = false)
  }

  /** Parquet-append writer: caller `.start()`s. The index at `indexDir`
    * must exist ([[DedupIndex.writeIndex]] over the history, possibly
    * empty). */
  def writer(docStream: DataFrame, indexDir: String, outPath: String,
             checkpoint: String,
             threshold: Double = 0.5): DataStreamWriter[Row] =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        landBatch(batch, indexDir, outPath, threshold)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
