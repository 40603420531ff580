package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.{TableIO, VersionedTable, VersionedTableOps}

/** Streaming CDC apply into the versioned table: changelog batches merge
  * copy-on-write, exactly-once, with last-change-per-key folding. */
class MergeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val backend: TableIO = TableIO.local
  private lazy val ops = new VersionedTableOps(backend)

  test("foldChanges keeps the last change per key; deletes lose ties") {
    val changes = Seq(
      (1L, 10L, "u", 100L), // superseded
      (1L, 11L, "u", 200L), // last for key 1
      (2L, 20L, "u", 100L),
      (2L, 0L, "d", 300L),  // key 2 ends deleted
      (3L, 30L, "u", 100L),
      (3L, 31L, "u", 100L)  // equal order: op asc -> 'd' would lose; here
                            // both 'u', row_number picks deterministically
    ).toDF("id", "payload", "op", "seq")
    val folded = MergeStream.foldChanges(changes, "id", "seq")
      .select("id", "op").as[(Long, String)].collect().toMap
    assert(folded == Map(1L -> "u", 2L -> "d", 3L -> "u"))
    // the folded frame is one row per key and drops the order column
    assert(!MergeStream.foldChanges(changes, "id", "seq")
      .columns.contains("seq"))
  }

  test("mergeChanges applies upserts and deletes in ONE commit, scoped " +
    "to the touched files") {
    val dir = tmpDir("ms-one") + "/t"
    ops.commitClustered(
      spark.range(0, 8000).select(col("id"), (col("id") * 2).as("payload")),
      dir, zCols = Seq("id"), statCols = Seq("id"), numFiles = 8)
    val before = ops.manifestLines(dir, 1)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
    // changes confined to the low-id band: update 0..20, delete 30..50
    val changes = spark.range(0, 20)
      .select(col("id"), lit(-1L).as("payload"), lit("u").as("op"))
      .unionByName(spark.range(30, 50)
        .select(col("id"), lit(0L).as("payload"), lit("d").as("op")))
    val v = ops.mergeChanges(spark, dir, changes, "id")
    assert(ops.versions(dir) == Seq(1, v), "must be exactly one commit")
    val after = ops.manifestLines(dir, v)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
    assert(before.filter(after.contains).size == before.size - 1,
      "changes in one file's range must rewrite one file")
    val got = ops.read(spark, dir).as[(Long, Long)].collect().toMap
    assert(got.size == 8000 - 20)
    assert((0L until 20L).forall(got(_) == -1L))
    assert((30L until 50L).forall(!got.contains(_)))
    assert((50L until 8000L).forall(i => got(i) == i * 2))
  }

  test("a key both upserted and deleted in one batch fails loudly") {
    val dir = tmpDir("ms-both") + "/t"
    ops.commit(spark.range(0, 10).select(col("id"),
      col("id").as("payload")), dir)
    val e = intercept[IllegalArgumentException] {
      ops.mergeChanges(spark, dir, Seq(
        (1L, 5L, "u"), (1L, 0L, "d")).toDF("id", "payload", "op"), "id")
    }
    assert(e.getMessage.contains("both upserted and deleted"))
    val e2 = intercept[IllegalArgumentException] {
      ops.mergeChanges(spark, dir, Seq(
        (1L, 5L, "x")).toDF("id", "payload", "op"), "id")
    }
    assert(e2.getMessage.contains("'u' or 'd'"))
  }

  test("a redelivered batch id returns the committed version, unchanged") {
    val dir = tmpDir("ms-replay") + "/t"
    VersionedTable.commit(spark.range(0, 100)
      .select(col("id"), col("id").as("payload")), dir)
    val batch = Seq((5L, -5L, "u"), (7L, 0L, "d"))
      .toDF("id", "payload", "op")
    val v1 = MergeStream.applyBatch(batch, dir, "id", "cdcq", 0L)
    val rowsAfter = VersionedTable.read(spark, dir).count()
    // crash-window replay: same query, same batch id
    val v2 = MergeStream.applyBatch(batch, dir, "id", "cdcq", 0L)
    assert(v2 == v1)
    assert(VersionedTable.versions(dir).last == v1)
    assert(VersionedTable.read(spark, dir).count() == rowsAfter)
    // a genuinely new batch still merges
    val v3 = MergeStream.applyBatch(
      Seq((5L, -55L, "u")).toDF("id", "payload", "op"),
      dir, "id", "cdcq", 1L)
    assert(v3 > v1)
    assert(VersionedTable.read(spark, dir)
      .filter(col("id") === 5L).select("payload").as[Long].head() == -55L)
  }

  test("end to end: a changelog stream converges the table to its " +
    "batch-fold twin") {
    val inDir = tmpDir("ms-in")
    val dir = tmpDir("ms-table") + "/t"
    val ckpt = tmpDir("ms-ckpt")
    VersionedTable.commit(spark.range(0, 50)
      .select(col("id"), (col("id") * 2).as("payload")), dir)
    val schema = Seq((0L, 0L, "u", 0L)).toDF("id", "payload", "op", "seq")
      .schema
    // batch 1: update ids 0..5, delete 10..12; includes a superseded
    // change for id 0 the fold must discard
    (Seq((0L, 999L, "u", 1L), (0L, -1L, "u", 2L)) ++
      (1L to 5L).map(i => (i, -i, "u", 1L)) ++
      (10L to 12L).map(i => (i, 0L, "d", 1L)))
      .toDF("id", "payload", "op", "seq")
      .write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema(schema).parquet(inDir)
    val q = MergeStream.writer(stream, dir, "id", "seq", "ms-e2e", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // batch 2: revive a deleted key, delete an updated one
      Seq((10L, 1000L, "u", 3L), (3L, 0L, "d", 3L))
        .toDF("id", "payload", "op", "seq")
        .write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val got = VersionedTable.read(spark, dir).as[(Long, Long)]
      .collect().toMap
    val expect = (0L until 50L).map(i => i -> i * 2).toMap ++
      Map(0L -> -1L, 1L -> -1L, 2L -> -2L, 4L -> -4L, 5L -> -5L,
        10L -> 1000L) -- Seq(11L, 12L, 3L)
    assert(got == expect)
    // both batch txns are in the ledger
    assert(VersionedTable.committedTxns(dir) ==
      Set("ms-e2e:0", "ms-e2e:1"))
  }
}
