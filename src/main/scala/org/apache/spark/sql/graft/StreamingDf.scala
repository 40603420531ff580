package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** The one `private[sql]` seam a V1 streaming `Source` built on batch
  * reads needs: `getBatch` must return a DataFrame whose plan is marked
  * streaming (MicroBatchExecution asserts `isStreaming`), but the natural
  * way to read "exactly these committed files" is a plain batch parquet
  * scan. Spark's own file stream and the lake-format sources mark the
  * leaf relation streaming and hand the batch plan over; this does the
  * same for any batch DataFrame. */
object StreamingDf {

  /** `df` with every leaf relation marked `isStreaming = true` — plan
    * content (files, filters, projections) untouched. Right for a batch
    * plan that is scans-plus-stateless-transforms; a plan containing
    * JOINS must use [[asStreamingLeaf]] instead, or the incremental
    * planner re-plans them as stateful stream-stream joins. */
  def asStreaming(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
      case r: DataSourceV2Relation => r // v2 leaves handled by the engine
    }
    Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)
  }

  /** `df` as ONE streaming leaf: the whole batch plan collapses behind a
    * lazy `LogicalRDD` (nothing runs until the micro-batch executes;
    * task retries recompute deterministically as long as the plan reads
    * pinned snapshots). This is how a source whose batch is a genuine
    * QUERY — the change-feed's keyed snapshot diff, with joins inside —
    * rides a streaming plan: the incremental planner sees a leaf, so it
    * cannot mistake the diff's joins for stream-stream joins and bolt
    * checkpointed state stores onto them. */
  def asStreamingLeaf(df: DataFrame): DataFrame = {
    val d = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      d.queryExecution.toRdd, d, isStreaming = true)
    Dataset.ofRows(d.sparkSession, node)
  }
}

/** A resolved logical plan back as a DataFrame — the seam a planner
  * strategy that hands a statement's SOURCE subtree to engine code (the
  * native MERGE INTO interception) needs. Same `Dataset.ofRows` the
  * session's own sql() uses. Also re-exports the classic Column factory,
  * which is `private[sql]` and thus invisible to the graft.sql catalog
  * package. */
object PlanDf {
  def ofPlan(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def toColumn(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** A streaming micro-batch frame as a BATCH frame — ForeachBatchSink's
    * own discipline (`LogicalRDD.fromDataset(qe.toRdd, ds, isStreaming =
    * false)`): the incremental execution runs once into an RDD and the
    * wrapper plans as ordinary batch data, so a V1 Sink can hand it to
    * engine code that re-plans (e.g. a parquet write). */
  def asBatch(df: DataFrame): DataFrame = {
    val d = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      d.queryExecution.toRdd, d, isStreaming = false)
    Dataset.ofRows(d.sparkSession, node)
  }
}
