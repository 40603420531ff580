package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of `localCheckpoint()` storage.
  *
  * A local checkpoint materializes into executor block storage and the
  * public `Dataset.unpersist()` does NOT free it (it only talks to the
  * CacheManager, and checkpoints aren't cache entries) — the blocks
  * otherwise linger until the driver GCs the RDD reference and the
  * ContextCleaner gets around to it. Iterative loops that checkpoint per
  * round ([[graft.ext.DedupCluster]]) would pin one superseded label
  * snapshot per round for the session. This helper reaches the
  * checkpointed RDD through the plan's [[LogicalRDD]] leaves (the reason
  * it lives under `org.apache.spark.sql`) and unpersists it directly.
  */
object CheckpointUtils {

  /** Free the block-storage of a localCheckpoint'd Dataset. Safe on any
    * Dataset: only RDD leaves that are actually locally checkpointed are
    * unpersisted — a caller-persisted RDD behind `createDataFrame(rdd)`
    * (which also plans as a [[LogicalRDD]]) is left alone. */
  def freeLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collectLeaves().foreach {
      // isLocallyCheckpointed is private[rdd]; its implementation is this
      // checkpointData test, and private[spark] members are reachable from
      // the host package
      case l: LogicalRDD if l.rdd.checkpointData.exists(
          _.isInstanceOf[org.apache.spark.rdd.LocalRDDCheckpointData[_]]) =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}

/** Checkpoint strategy for iterative operators ([[graft.analytics.GraphOps]],
  * [[graft.ext.DedupCluster]]): `localCheckpoint` truncates lineage into
  * executor block storage — cheap, but a lost executor kills the query at
  * hour 10 of a 100 TB run because the truncated lineage cannot recompute
  * the lost blocks. When a durable `reliableDir` is configured the same
  * call sites write RELIABLE checkpoints instead (HDFS/object-store files
  * that survive executor loss); local stays the default for short
  * interactive runs. Both forms are eager, so call sites keep the
  * "materialize then free the superseded snapshot" discipline unchanged. */
final case class Checkpointer(reliableDir: Option[String] = None) {

  def checkpoint[T](ds: Dataset[T]): Dataset[T] = reliableDir match {
    case Some(dir) =>
      val sc = ds.sparkSession.sparkContext
      // setCheckpointDir mints a fresh UUID subdir per call — set once per
      // context (the first configured dir wins; Spark has one global dir).
      // A second Checkpointer asking for a DIFFERENT dir still checkpoints
      // durably, just under the first dir — surface that loudly instead of
      // silently ignoring the request.
      sc.getCheckpointDir match {
        case None => sc.setCheckpointDir(dir)
        case Some(existing) if !existing.contains(dir) =>
          System.err.println(
            s"[graft] reliable checkpoint dir already set to $existing; " +
              s"requested $dir is ignored (Spark has one global checkpoint dir)")
        case _ => ()
      }
      // Reliable Dataset.checkpoint() is eager: it runs a count job AND a
      // separate checkpoint-write job — an unpersisted plan computes twice.
      // Persist around the call so the second job reads cached blocks, then
      // drop the cache (the durable files are now the source of truth).
      val persisted =
        ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try persisted.checkpoint()
      finally persisted.unpersist(blocking = false)
    case None => ds.localCheckpoint()
  }

  /** Release a superseded snapshot. Local checkpoints free executor
    * blocks immediately; reliable checkpoint files are left for the
    * ContextCleaner (`spark.cleaner.referenceTracking.cleanCheckpoints`)
    * or checkpoint-dir retention — they are durable job state, not cache. */
  def free(ds: Dataset[_]): Unit =
    if (reliableDir.isEmpty) CheckpointUtils.freeLocalCheckpoint(ds)
}
