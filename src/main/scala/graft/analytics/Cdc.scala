package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** CDC apply — folding a change-data-capture batch (inserts / updates /
  * deletes with a change sequence) into a landed snapshot. The missing
  * half of [[Advanced]]'s merge-upsert: real CDC logs carry TOMBSTONES and
  * REPLAYS, so apply must be last-change-wins per key and a delete must
  * actually remove the row.
  *
  * Scale shape, in order:
  * 1. last-wins dedup runs over the CHANGES ONLY — `max_by(payload, seq)`
  *    is a bounded-state declarative aggregate (one payload struct per
  *    key, partial-aggregated map-side), sized by the CDC batch, never by
  *    the snapshot;
  * 2. the snapshot is touched by exactly ONE key join (anti join for
  *    pass-through + union of the set rows) — at 100 TB with the snapshot
  *    bucketed/partitioned by key this is the standard daily-merge shuffle,
  *    and a small change batch broadcasts;
  * 3. deletes fall out for free: a tombstone key is removed by the same
  *    anti join and simply contributes no set row.
  *
  * Ordering contract: `seq` must be unique per key (a CDC log's LSN /
  * binlog position is); ties would make last-wins nondeterministic, which
  * is a property of the log, not of the operator.
  */
object Cdc {

  /** Apply `changes` to `snapshot`. `changes` carries `key`, `seq`, `op`
    * ('I'/'U' set the row, 'D' deletes it) plus the snapshot's payload
    * columns. Returns the post-apply snapshot (same schema as input). */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, key: String,
                   seq: String, op: String): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == key).toSeq
    val carried = op +: payload
    val last = changes
      .groupBy(col(key))
      .agg(max_by(struct(carried.map(col): _*), col(seq)).as("__c"))
      .select(col(key) +: carried.map(c => col(s"__c.$c").as(c)): _*)
    val passThrough =
      snapshot.join(last.select(col(key)), Seq(key), "left_anti")
    val setRows = last.filter(col(op) =!= "D").drop(op)
    passThrough.unionByName(setRows)
  }

  /** q_cdc_apply — the apply loop with every semantic exercised: each odd
    * order key gets TWO log entries (an early 'U' superseded by a final
    * 'U' or, on every fifth key, a 'D' tombstone), so last-wins dedup,
    * update-in-place, pass-through, and deletion all shape the result.
    * The oracle inlines the net effect analytically (final update = ×3,
    * tombstoned keys absent), so a hash match pins the whole fold. */
  def qCdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val odd = o.filter(col("o_orderkey") % 2 === 1)
    val early = odd.select(col("o_orderkey"), lit(1L).as("seq"),
      lit("U").as("op"), col("o_orderstatus"),
      (col("o_totalprice") * 2).as("o_totalprice"))
    val finalOp = odd.select(col("o_orderkey"), lit(2L).as("seq"),
      when(col("o_orderkey") % 5 === 0, "D").otherwise("U").as("op"),
      col("o_orderstatus"),
      (col("o_totalprice") * 3).as("o_totalprice"))
    applyChanges(o, early.unionByName(finalOp),
        "o_orderkey", "seq", "op")
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice").cast("decimal(18,2)").cast("double"), 2)
          .as("price"))
      .orderBy(col("o_orderkey"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_apply" -> (qCdcApply _))

  val oracles: Map[String, String] = Map(
    "q_cdc_apply" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ROUND(CAST(CAST(CASE WHEN o_orderkey % 2 = 1
        |      THEN o_totalprice * 3 ELSE o_totalprice END
        |    AS DECIMAL(18,2)) AS DOUBLE), 2) AS price
        |FROM orders
        |WHERE NOT (o_orderkey % 2 = 1 AND o_orderkey % 5 = 0)
        |ORDER BY o_orderkey""".stripMargin)
}
