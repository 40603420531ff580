package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sinks.VersionedTable

/** Structured-Streaming ingestion into a [[VersionedTable]] — every
  * micro-batch becomes one atomic SNAPSHOT commit, which upgrades the
  * plain parquet-append streaming sinks in two ways a 100 TB landing
  * cares about:
  * - **atomic visibility**: a reader never observes half a micro-batch
  *   (parquet append exposes files as they land; a manifest flips the
  *   whole batch visible at once);
  * - **exactly-once by transaction id**: the batch id rides IN the
  *   manifest ([[VersionedTable.commitOnce]]), so the publish is itself
  *   the replay marker — a batch redelivered after a crash between sink
  *   write and offset commit no-ops instead of double-landing. No
  *   doc-id anti-join against the landed output needed (the
  *   [[CorpusStream]]/[[DedupStream]] guard), and no key column required.
  *
  * The per-query txn namespace (`queryName:batchId`) matches foreachBatch's
  * single-writer guarantee; snapshot retention must exceed the source's
  * replay horizon (see [[VersionedTable.expire]]).
  */
object VersionedStream {

  /** Land one micro-batch exactly once; returns the snapshot version. */
  def landBatch(batch: DataFrame, dir: String, queryName: String,
                batchId: Long): Int =
    VersionedTable.commitOnce(batch, dir, s"$queryName:$batchId")

  /** foreachBatch writer: caller `.start()`s. */
  def writer(stream: DataFrame, dir: String, queryName: String,
             checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, dir, queryName, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
