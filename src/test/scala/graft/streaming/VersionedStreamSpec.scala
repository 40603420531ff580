package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VersionedTable

class VersionedStreamSpec extends SparkSpec {
  import spark.implicits._

  test("each micro-batch lands as one atomic snapshot version") {
    val inDir = tmpDir("vs-in")
    val tableDir = tmpDir("vs-table") + "/t"
    val ckpt = tmpDir("vs-ckpt")
    val b1 = (1L to 10L).map(i => (i, s"r$i")).toDF("id", "payload")
    b1.write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema(b1.schema).parquet(inDir)
    val q = VersionedStream.writer(stream, tableDir, "vs-test", ckpt).start()
    try {
      q.processAllAvailable()
      assert(VersionedTable.read(spark, tableDir).count() == 10)
      val v1 = VersionedTable.versions(tableDir).last
      (11L to 15L).map(i => (i, s"r$i")).toDF("id", "payload")
        .write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(VersionedTable.read(spark, tableDir).count() == 15)
      // time travel still sees exactly the first batch
      assert(VersionedTable.read(spark, tableDir, Some(v1)).count() == 10)
    } finally q.stop()
  }

  test("a redelivered batch id no-ops instead of double-landing") {
    val tableDir = tmpDir("vs-replay") + "/t"
    val batch = (1L to 5L).map(i => (i, s"r$i")).toDF("id", "payload")
    val v1 = VersionedStream.landBatch(batch, tableDir, "q1", batchId = 0L)
    // crash-window replay: same query, same batch id, delivered again
    val v2 = VersionedStream.landBatch(batch, tableDir, "q1", batchId = 0L)
    assert(v2 == v1)
    assert(VersionedTable.versions(tableDir) == Seq(v1))
    assert(VersionedTable.read(spark, tableDir).count() == 5)
    // a genuinely new batch still lands
    val v3 = VersionedStream.landBatch(batch, tableDir, "q1", batchId = 1L)
    assert(v3 > v1)
    assert(VersionedTable.read(spark, tableDir).count() == 10)
  }

  test("txn namespaces are per query: same batch id, different query lands") {
    val tableDir = tmpDir("vs-ns") + "/t"
    val batch = Seq((1L, "x")).toDF("id", "payload")
    VersionedStream.landBatch(batch, tableDir, "qa", 0L)
    VersionedStream.landBatch(batch, tableDir, "qb", 0L)
    assert(VersionedTable.read(spark, tableDir).count() == 2)
    assert(VersionedTable.committedTxns(tableDir) == Set("qa:0", "qb:0"))
  }

  test("stream-land, compact, expire: the full landing lifecycle") {
    val inDir = tmpDir("vs-life-in")
    val tableDir = tmpDir("vs-life") + "/t"
    val ckpt = tmpDir("vs-life-ckpt")
    val schema = Seq((1L, "r")).toDF("id", "payload").schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    val q = VersionedStream.writer(stream, tableDir, "vs-life", ckpt).start()
    try {
      // five tiny micro-batches, each its own snapshot + small file group
      (0 until 5).foreach { b =>
        (1L to 10L).map(i => (b * 10L + i, s"r$b-$i")).toDF("id", "payload")
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
      assert(VersionedTable.read(spark, tableDir).count() == 50)
      // maintenance: bin-pack the small files as a NEW snapshot, then GC
      // history — but never below the source's replay horizon
      val before = VersionedTable.versions(tableDir).size
      VersionedTable.compact(spark, tableDir, targetBytes = 1L << 20)
      assert(VersionedTable.versions(tableDir).size == before + 1)
      assert(VersionedTable.read(spark, tableDir).count() == 50)
      intercept[IllegalArgumentException] {
        VersionedTable.expire(tableDir, keepLast = 1, txnReplayHorizon = 3)
      }
      // the NEWEST landed txn id, not a hardcoded batch number: under
      // parallel-suite load the file source may split a landing into
      // extra micro-batches, shifting every id — the invariant is that
      // the replay horizon keeps the latest ledger entries, whatever
      // they are numbered
      val newestTxn = VersionedTable.committedTxns(tableDir)
        .maxBy(_.split(':').last.toInt)
      VersionedTable.expire(tableDir, keepLast = 3, txnReplayHorizon = 3)
      // the compacted head still reads everything after GC, and a replayed
      // txn id within the horizon still no-ops
      assert(VersionedTable.read(spark, tableDir).count() == 50)
      assert(VersionedTable.committedTxns(tableDir).contains(newestTxn))
    } finally q.stop()
  }

  test("txn headers never leak into the file list") {
    val tableDir = tmpDir("vs-hdr") + "/t"
    VersionedStream.landBatch(Seq((1L, "x")).toDF("id", "payload"),
      tableDir, "q", 0L)
    // a second read resolves the manifest fresh — if the #txn line were
    // treated as a path, the parquet read would throw
    assert(VersionedTable.read(spark, tableDir)
      .select(col("id")).as[Long].collect().toSeq == Seq(1L))
  }
}
