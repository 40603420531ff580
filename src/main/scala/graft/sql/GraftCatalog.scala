package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.VersionedTable

/** The lake's SQL front door — a Spark catalog plugin
  * (`spark.sql.catalog.graft = graft.sql.GraftCatalog`) that puts every
  * [[graft.sinks.VersionedTable]] operation on the SQL surface the
  * reference exposes its whole pipeline through (weather_etl.py:65–79,
  * 158–184 — its load path IS SQL strings):
  *
  *  - '''reads + time travel''', via Spark's own resolution — no parser
  *    work at all:
  *    {{{
  *    SELECT * FROM graft.`/lake/events`                      -- head
  *    SELECT * FROM graft.`/lake/events` VERSION AS OF 3      -- pinned
  *    SELECT * FROM graft.`/lake/events` TIMESTAMP AS OF '...'-- by clock
  *    }}}
  *    `loadTable` resolves the manifest ONCE and hands Catalyst a
  *    parquet table over exactly that snapshot's files — predicate
  *    pushdown, column pruning and vectorized scanning are the stock
  *    DSv2 parquet path, so the SQL read plans identically to
  *    `read()`'s scan at any scale.
  *  - '''mutations + maintenance''', as Spark 4 SQL procedures
  *    (`CALL graft.merge_into('/lake/events', 'src_view', 'event_id')`,
  *    `CALL graft.delete_where('/lake/events', 'value > 9000')`, …) —
  *    each returns the committed version as a one-row result.
  *
  * Snapshots carrying merge-on-read delete debt (positional vectors or
  * equality deletes) refuse a catalog read loudly: serving them would
  * need the anti-join the Scala reader applies, and silently returning
  * dead rows through SQL is worse than a clear instruction to `compact`
  * first — the same normalization contract MERGE and promotion enforce. */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catName = "graft"
  private def ops = VersionedTable

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
  }
  override def name(): String = catName

  /** `graft.`/lake/events`` parses to a single backquoted name part; a
    * qualified spelling (`graft.a.b`) re-joins on '/'. */
  private def dirOf(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString("/")

  private def snapshot(ident: Identifier, version: Option[Int]): Table = {
    val dir = dirOf(ident)
    val spark = SparkSession.active
    val (v, files, debt) =
      try ops.snapshotInfo(dir, version)
      catch { case _: IllegalArgumentException =>
        throw new NoSuchTableException(ident)
      }
    if (files.isEmpty) throw new NoSuchTableException(ident)
    require(!debt,
      s"$dir@v$v carries merge-on-read delete debt (positional vectors " +
        s"or equality deletes); a catalog read cannot apply them — run " +
        s"CALL $catName.compact('$dir', <target_bytes>) to materialize, " +
        s"or read through the Scala API")
    ParquetTable(s"$catName.$dir@v$v", spark,
      CaseInsensitiveStringMap.empty(), files, None,
      classOf[ParquetFileFormat])
  }

  override def loadTable(ident: Identifier): Table = snapshot(ident, None)

  /** `VERSION AS OF n`. */
  override def loadTable(ident: Identifier, version: String): Table =
    snapshot(ident, Some(version.toInt))

  /** `TIMESTAMP AS OF ts` — Spark hands micros; the manifest stamps are
    * millis. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    snapshot(ident,
      Some(ops.versionAt(dirOf(ident), timestampMicros / 1000L)))

  override def tableExists(ident: Identifier): Boolean =
    ops.versions(dirOf(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // paths are the namespace; there is nothing to enumerate

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are created by their first commit (Scala API or " +
        "CALL graft.* procedures), not by DDL")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "DROP TABLE not supported: history removal is expire()/vacuum")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE not supported")

  // ---- procedures: the mutation/maintenance surface ----

  /** One-row result: the version the call committed (or resolved). */
  private def versionRow(v: Int): util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(InternalRow(v))
      override def readSchema(): StructType =
        StructType(Seq(StructField("version", IntegerType, nullable = false)))
    }
    util.Collections.singletonList(scan).iterator()
  }

  /** A fixed-signature procedure: `body` gets the argument row in
    * parameter order and returns the committed version. */
  private case class Proc(procName: String, argNames: Seq[String],
      procDescription: String)(body: (SparkSession, Seq[String]) => Int)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      argNames.map(n => ProcedureParameter.in(n, StringType).build()).toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val args = argNames.indices.map { i =>
        val s = input.getUTF8String(i)
        require(s != null, s"procedure $procName: argument " +
          s"'${argNames(i)}' must not be NULL")
        s.toString
      }
      versionRow(body(SparkSession.active, args))
    }
  }

  /** Every argument is a STRING (paths, view names, predicates, numbers
    * as literals) — the uniform signature keeps `CALL` sites obvious and
    * sidesteps implicit-cast surprises in positional binding. */
  private val procs: Map[String, Proc] = Seq(
    Proc("merge_into", Seq("dir", "source_view", "key"),
      "Copy-on-write MERGE of a registered view into the table by key")(
      (s, a) => ops.merge(s, a(0), s.table(a(1)), a(2))),
    Proc("apply_changes", Seq("dir", "changes_view", "key", "op_col"),
      "CDC changelog apply: op column 'u' upserts / 'd' deletes, one commit")(
      (s, a) => ops.mergeChanges(s, a(0), s.table(a(1)), a(2), a(3))),
    Proc("delete_where", Seq("dir", "predicate"),
      "Land positional delete vectors for rows matching a SQL predicate")(
      (s, a) => ops.deleteWhere(s, a(0), expr(a(1)))),
    Proc("delete_by_keys", Seq("dir", "key_col", "keys_view"),
      "O(keys) equality-delete commit; compact() materializes it")(
      (s, a) => ops.deleteByKeys(s, a(0), a(1), s.table(a(2)))),
    Proc("compact", Seq("dir", "target_bytes"),
      "Bin-pack small files; materializes all deletes for rewritten files")(
      (s, a) => ops.compact(s, a(0), a(1).toLong)),
    Proc("optimize_zorder", Seq("dir", "cols"),
      "Rewrite live rows z-ordered on comma-separated cols; delete-free")(
      (s, a) => ops.optimizeZorder(s, a(0),
        a(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq)),
    Proc("rollback", Seq("dir", "to_version"),
      "Restore an old file set as a new inspectable version")(
      (_, a) => ops.rollback(a(0), a(1).toInt)),
    Proc("expire", Seq("dir", "keep_last"),
      "GC manifests beyond keep_last and files nothing retained references")(
      (_, a) => { ops.expire(a(0), a(1).toInt); ops.versions(a(0)).last }),
    Proc("write_stats", Seq("dir", "cols"),
      "(Re)collect per-file min/max stats for comma-separated cols")(
      (s, a) => { val d = a(0); val v = ops.versions(d).last
        ops.writeStats(s, d, v,
          a(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq); v })
  ).map(p => p.procName -> p).toMap

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    procs.getOrElse(ident.name,
      throw new RuntimeException(
        s"unknown procedure $catName.${ident.name}; known: " +
          procs.keys.toSeq.sorted.mkString(", ")))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    procs.keys.toSeq.sorted
      .map(n => Identifier.of(Array.empty, n)).toArray
}

/** Oracle-gated queries proving the SQL surface returns byte-identical
  * results to the Scala API on the same tables. */
object GraftCatalog {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  import graft.analytics.Parity
  import graft.sources.Tables

  private def register(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def eventsTmp(spark: SparkSession, sfDir: String,
                        prefix: String): (DataFrame, String) = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    java.nio.file.Files.walk(tmp).forEach(p => p.toFile.deleteOnExit())
    (ev, tmp.toString)
  }

  /** q_sql_time_travel — the q_time_travel protocol driven entirely from
    * SQL: `VERSION AS OF` reads the pinned v1 manifest, the bare
    * identifier reads the head, and a `TIMESTAMP AS OF` probe (pinned
    * in-query) resolves by commit wall clock — hash-matched against the
    * same oracle as the Scala-API twin, so the catalog path provably
    * serves identical snapshots. */
  def qSqlTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    register(spark)
    val (ev, dir) = eventsTmp(spark, sfDir, "graft_sqltt_")
    val v1 = VersionedTable.commit(ev.filter(col("event_id") % 2 === 0), dir)
    VersionedTable.commit(ev.filter(col("event_id") % 2 === 1), dir)
    val head = spark.sql(s"SELECT * FROM graft.`$dir`")
    // wall-clock travel: any instant at/after the head commit reads the
    // head — pinned here so the micros→millis seam stays exercised
    val ts = System.currentTimeMillis() + 60000L
    val byTime = spark.sql(
      s"SELECT * FROM graft.`$dir` TIMESTAMP AS OF timestamp_millis($ts)")
    require(byTime.count() == head.count(),
      "TIMESTAMP AS OF did not resolve to the head snapshot")
    val a = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF $v1")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_v1"),
        round(Parity.decSum2(col("value")), 2).as("sum_v1"))
    val b = head
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_v2"),
        round(Parity.decSum2(col("value")), 2).as("sum_v2"))
    a.join(b, "event_type").orderBy(col("event_type"))
  }

  /** q_sql_merge — q_merge_lake driven through `CALL graft.merge_into`
    * with the source as a registered view and the merged head read back
    * via the catalog: same oracle as the Scala twin, plus the returned
    * version row pinned in-query. */
  def qSqlMerge(spark: SparkSession, sfDir: String): DataFrame = {
    register(spark)
    val (ev, dir) = eventsTmp(spark, sfDir, "graft_sqlmerge_")
    VersionedTable.commitClustered(ev, dir, zCols = Seq("event_id"),
      statCols = Seq("event_id"), numFiles = 8)
    val updates = ev.filter(col("event_id") % 10 === 0)
      .withColumn("value", col("value") + 1000.0)
    val inserts = ev.filter(col("event_id") % 10 === 1)
      .withColumn("event_id", col("event_id") + 10000000L)
    updates.unionByName(inserts).createOrReplaceTempView("q_sql_merge_src")
    val res = spark.sql(
      s"CALL graft.merge_into('$dir', 'q_sql_merge_src', 'event_id')")
    require(res.collect().map(_.getInt(0)).toSeq == Seq(2),
      "merge_into must return the committed version")
    spark.sql(s"SELECT * FROM graft.`$dir`")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(Parity.decSum2(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** q_sql_delete — `CALL graft.delete_where` lands vectors, the catalog
    * read REFUSES the merge-on-read snapshot (pinned in-query — silently
    * serving dead rows through SQL would be corruption), `CALL
    * graft.compact` materializes, and the clean head reads back through
    * SQL: hash-matched against a WHERE NOT oracle. */
  def qSqlDelete(spark: SparkSession, sfDir: String): DataFrame = {
    register(spark)
    val (ev, dir) = eventsTmp(spark, sfDir, "graft_sqldel_")
    VersionedTable.commit(ev, dir)
    spark.sql(s"CALL graft.delete_where('$dir', 'value > 90.0')")
    val refused = scala.util.Try(
      spark.sql(s"SELECT * FROM graft.`$dir`").collect())
    require(refused.isFailure &&
      refused.failed.get.getMessage.contains("delete debt"),
      "a merge-on-read snapshot must refuse a catalog read loudly")
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')")
    spark.sql(s"SELECT * FROM graft.`$dir`")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(Parity.decSum2(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_time_travel" -> (qSqlTimeTravel _),
    "q_sql_merge" -> (qSqlMerge _),
    "q_sql_delete" -> (qSqlDelete _))

  val oracles: Map[String, String] = Map(
    "q_sql_time_travel" ->
      """SELECT event_type,
        |  COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS n_v1,
        |  ROUND(CAST(SUM(CASE WHEN event_id % 2 = 0
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS sum_v1,
        |  COUNT(*) AS n_v2,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_v2
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_sql_merge" ->
      """WITH src AS (
        |  SELECT event_id, event_type, value + 1000.0 AS value
        |  FROM events WHERE event_id % 10 = 0
        |  UNION ALL
        |  SELECT event_id + 10000000 AS event_id, event_type, value
        |  FROM events WHERE event_id % 10 = 1
        |), merged AS (
        |  SELECT * FROM src
        |  UNION ALL
        |  SELECT e.event_id, e.event_type, e.value FROM events e
        |  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.event_id = e.event_id)
        |)
        |SELECT event_type, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_value
        |FROM merged
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_sql_delete" ->
      """SELECT event_type, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_value
        |FROM events
        |WHERE NOT (value > 90.0)
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
}
