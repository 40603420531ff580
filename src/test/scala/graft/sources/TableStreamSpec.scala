package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec
import graft.sinks.VersionedTable
import graft.streaming.VersionedStream

/** The versioned table as a streaming source: catch-up snapshot + tail
  * semantics, checkpointed restart delivering exactly the appended delta,
  * per-trigger version capping, loud failure on non-append history, and
  * the exactly-once table→table hop (graft-table source →
  * VersionedStream sink). */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def rows(ids: Range) =
    ids.map(i => (i.toLong, s"k${i % 5}")).toDF("id", "k")

  /** Drain the table stream through foreachBatch (checkpoint-recoverable);
    * returns (sorted ids seen this run, non-empty micro-batch count). */
  private def drain(dir: String, checkpoint: String,
                    options: Map[String, String] = Map.empty)
      : (Seq[Long], Int) = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    var reader = spark.readStream.format("graft-table")
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val ids = b.select("id")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
        if (ids.nonEmpty) batches.incrementAndGet()
        ids.foreach(i => got.add(i))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (got.iterator().asScala.toSeq.sorted, batches.get())
  }

  test("catch-up snapshot, then checkpointed tail of exactly the delta") {
    val tmp = tmpDir("tstream-basic")
    val dir = s"$tmp/table"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 40), dir)
    ops.commit(rows(40 until 70), dir)
    // fresh query: one catch-up batch = the whole landed history
    assert(drain(dir, ck)._1 == (0L until 70L))
    // two more commits land; the SAME checkpoint delivers only the delta
    ops.commit(rows(70 until 90), dir)
    ops.commit(rows(90 until 100), dir)
    assert(drain(dir, ck)._1 == (70L until 100L))
    // nothing new: a re-run delivers nothing
    assert(drain(dir, ck)._1.isEmpty)
  }

  test("option(branch, ...) tails the branch lineage, not the parent; " +
    "a dead name fails loudly") {
    val tmp = tmpDir("tstream-branch")
    val dir = s"$tmp/table"
    ops.commit(rows(0 until 30), dir)
    val bd = ops.createBranch(dir, "exp")
    ops.commit(rows(30 until 50), bd)   // branch-only append
    ops.commit(rows(100 until 110), dir) // parent moves independently
    val (ids, _) = drain(dir, s"$tmp/ck",
      Map("branch" -> "exp"))
    assert(ids == (0L until 50L), s"branch stream saw $ids")
    // parent stream is untouched by the branch
    assert(drain(dir, s"$tmp/ck2")._1 == ((0L until 30L) ++ (100L until 110L)))
    val e = intercept[Exception] {
      drain(dir, s"$tmp/ck3", Map("branch" -> "nope"))
    }
    assert(e.getMessage.contains("no live branch") ||
      Option(e.getCause).exists(_.getMessage.contains("no live branch")))
  }

  test("startingVersion skips the snapshot for tail-only consumers") {
    val tmp = tmpDir("tstream-sv")
    val dir = s"$tmp/table"
    ops.commit(rows(0 until 30), dir)
    ops.commit(rows(30 until 50), dir)
    assert(drain(dir, s"$tmp/ck",
      Map("startingVersion" -> "2"))._1 == (30L until 50L))
  }

  test("maxVersionsPerTrigger caps tail batches per trigger") {
    val tmp = tmpDir("tstream-cap")
    val dir = s"$tmp/table"; val ck = s"$tmp/ck"
    val cap = Map("maxVersionsPerTrigger" -> "1")
    ops.commit(rows(0 until 10), dir)
    assert(drain(dir, ck, cap)._1 == (0L until 10L))
    // three appended versions, capped to one version per micro-batch
    ops.commit(rows(10 until 20), dir)
    ops.commit(rows(20 until 30), dir)
    ops.commit(rows(30 until 40), dir)
    val (ids, batches) = drain(dir, ck, cap)
    assert(ids == (10L until 40L))
    assert(batches == 3, s"expected 3 capped batches, saw $batches")
  }

  test("non-append history in a consumed range fails loudly") {
    val tmp = tmpDir("tstream-nonapp")
    val dir = s"$tmp/table"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 30), dir)
    assert(drain(dir, ck)._1 == (0L until 30L))
    ops.commit(rows(30 until 40), dir)
    ops.deleteWhere(spark, dir, col("id") < 5)
    val e = intercept[StreamingQueryException] {
      drain(dir, ck)
    }
    assert(e.getCause.getMessage.contains("pure appends"),
      s"wrong failure: ${e.getCause.getMessage}")
  }

  test("schema evolution mid-stream: add/drop tolerated, re-type fails") {
    val tmp = tmpDir("tstream-schema")
    val dir = s"$tmp/table"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 20), dir)
    assert(drain(dir, ck)._1 == (0L until 20L))
    // a WIDER vintage lands: served at the pinned schema (projected down
    // or, for a replayed old batch under a newer pinned schema, the
    // added column reads as nulls) — the stream keeps flowing either way
    ops.commit(rows(20 until 30).withColumn("extra", lit(7)), dir)
    assert(drain(dir, ck)._1 == (20L until 30L))
    // a NARROWER vintage (drops k): k reads as typed nulls, ids flow
    ops.commit(spark.range(30, 35).select(col("id")), dir)
    assert(drain(dir, ck)._1 == (30L until 35L))
    // a RE-TYPED column fails loudly: silent casts corrupt downstream
    ops.commit(spark.range(35, 40)
      .select(col("id").cast("string").as("id")), dir)
    val e = intercept[StreamingQueryException] { drain(dir, ck) }
    assert(e.getCause.getMessage.contains("changed schema mid-stream"),
      s"wrong failure: ${e.getCause.getMessage}")
  }

  test("restart renegotiation: re-type → loud fail → fresh checkpoint + " +
      "startingVersion + new txn namespace resumes exactly-once") {
    val tmp = tmpDir("tstream-restart")
    val src = s"$tmp/src"; val dst = s"$tmp/dst"
    def hop(ck: String, name: String,
            conform: DataFrame => DataFrame = identity,
            options: Map[String, String] = Map.empty): Unit = {
      var reader = spark.readStream.format("graft-table")
      options.foreach { case (k, v) => reader = reader.option(k, v) }
      val q = VersionedStream.writer(conform(reader.load(src)),
        dst, name, ck).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def dstIds: Seq[Long] = ops.read(spark, dst)
      .select("id").as[Long].collect().toSeq.sorted
    ops.commit(rows(0 until 20), src)                         // src v1
    hop(s"$tmp/ck1", "hop")
    ops.commit(rows(20 until 30), src)                        // src v2
    hop(s"$tmp/ck1", "hop")
    assert(dstIds == (0L until 30L))
    // upstream re-types the pinned id column: the query dies LOUDLY and
    // lands NOTHING from the failed run
    ops.commit(rows(30 until 40)
      .withColumn("id", col("id").cast("string")), src)       // src v3
    val e = intercept[StreamingQueryException] { hop(s"$tmp/ck1", "hop") }
    assert(e.getCause.getMessage.contains("changed schema mid-stream"))
    assert(dstIds == (0L until 30L), "failed run must land nothing")
    // recover the restart anchor from the dead checkpoint
    val last = TableStreamSource.lastCommittedVersion(spark, s"$tmp/ck1")
    assert(last.contains(2L), s"expected last consumed version 2, got $last")
    // FOOTGUN the recipe exists to avoid: fresh checkpoint + OLD txn
    // namespace — batch ids reset to 0, collide with the ledger's landed
    // hop:0, and the new data silently no-ops instead of landing
    hop(s"$tmp/ck-footgun", "hop",
      df => df.withColumn("id", col("id").cast("long")),
      Map("startingVersion" -> "3"))
    assert(dstIds == (0L until 30L),
      "ledger collision must no-op (this is WHY the recipe renames)")
    // the RECIPE: fresh checkpoint, startingVersion past the consumed
    // prefix, NEW txn namespace, explicit cast renegotiating the schema
    hop(s"$tmp/ck2", "hop_v2",
      df => df.withColumn("id", col("id").cast("long")),
      Map("startingVersion" -> (last.get + 1).toString))
    assert(dstIds == (0L until 40L),
      "restart must deliver exactly the unconsumed suffix")
    assert(ops.read(spark, dst).count() == 40)
  }

  test("table→table hop: tail into a VersionedStream sink, exactly once") {
    val tmp = tmpDir("tstream-hop")
    val src = s"$tmp/src"; val dst = s"$tmp/dst"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 25), src)
    def hop(): Unit = {
      val q = VersionedStream.writer(
        spark.readStream.format("graft-table").load(src),
        dst, "ts_hop", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    hop()
    assert(ops.read(spark, dst).select("id").as[Long].collect().toSeq
      .sorted == (0L until 25L))
    ops.commit(rows(25 until 60), src)
    hop()
    // the second hop landed ONLY the delta — no duplicate landings
    assert(ops.read(spark, dst).select("id").as[Long].collect().toSeq
      .sorted == (0L until 60L))
    assert(ops.read(spark, dst).count() == 60)
  }

  test("native sink: stream→table→stream round trip through " +
    "writeStream.format(graft-table), exactly-once without foreachBatch") {
    val tmp = tmpDir("tsink-rt")
    val src = s"$tmp/src"; val dst = s"$tmp/dst"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 25), src)
    def hop(): Unit = {
      val q = spark.readStream.format("graft-table").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    hop()
    assert(ops.read(spark, dst).select("id").as[Long].collect().toSeq
      .sorted == (0L until 25L))
    // landed through the ledger: one txn per micro-batch, namespaced by
    // the checkpoint location (fresh checkpoint => fresh namespace)
    assert(ops.committedTxns(dst).exists(_.startsWith(ck)))
    ops.commit(rows(25 until 60), src)
    hop()
    assert(ops.read(spark, dst).select("id").as[Long].collect().toSeq
      .sorted == (0L until 60L))
    // ...and the destination tails onward as a source (round trip)
    val (ids, _) = drain(dst, s"$tmp/ck2")
    assert(ids == (0L until 60L))
  }

  test("native sink: a redelivered batch id no-ops (the manifest ledger " +
    "is the replay marker)") {
    val tmp = tmpDir("tsink-replay")
    val dst = s"$tmp/dst"
    val sink = new TableStreamSource().createSink(spark.sqlContext,
      Map("path" -> dst, "txn" -> "replay-spec"), Seq.empty,
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(0, rows(0 until 10))
    sink.addBatch(0, rows(0 until 10)) // crash-replay of the same batch
    sink.addBatch(1, rows(10 until 15))
    assert(ops.versions(dst) == Seq(1, 2),
      "a redelivered batch must not land a second commit")
    assert(ops.read(spark, dst).count() == 15)
  }

  test("native sink: Complete mode replaces the head per batch; Update " +
    "and partitionBy refuse; missing txn namespace refuses") {
    val tmp = tmpDir("tsink-modes")
    val dst = s"$tmp/dst"
    val provider = new TableStreamSource()
    val complete = provider.createSink(spark.sqlContext,
      Map("path" -> dst, "txn" -> "complete-spec"), Seq.empty,
      org.apache.spark.sql.streaming.OutputMode.Complete())
    complete.addBatch(0, rows(0 until 10))
    complete.addBatch(1, rows(0 until 4)) // the new whole-result table
    assert(ops.read(spark, dst).count() == 4,
      "Complete mode must serve only the latest batch's rows")
    assert(ops.versions(dst) == Seq(1, 2),
      "history stays inspectable: each Complete batch is a snapshot")
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext,
        Map("path" -> dst, "txn" -> "x"), Seq.empty,
        org.apache.spark.sql.streaming.OutputMode.Update())
    }
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext,
        Map("path" -> dst, "txn" -> "x"), Seq("k"),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext, Map("path" -> dst),
        Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    }
  }

  test("native sink Update mode: mergeKey turns each batch into a keyed " +
    "CDC merge — bootstrap, fold, upsert+delete, exactly-once replay") {
    val tmp = tmpDir("tsink-merge")
    val dst = s"$tmp/dst"
    val provider = new TableStreamSource()
    def changes(rows: Seq[(Long, String, String, Long)]) =
      rows.toDF("id", "k", "op", "seq")
    val sink = provider.createSink(spark.sqlContext,
      Map("path" -> dst, "txn" -> "cdc-spec", "mergeKey" -> "id",
        "opColumn" -> "op", "orderColumn" -> "seq"),
      Seq.empty, org.apache.spark.sql.streaming.OutputMode.Update())
    // batch 0 bootstraps the table: multi-change keys fold to the LAST
    // change (id=1 upserted then deleted -> absent; id=2 twice -> "b2")
    sink.addBatch(0, changes(Seq(
      (1L, "a1", "u", 1L), (1L, "x", "d", 2L),
      (2L, "b1", "u", 1L), (2L, "b2", "u", 2L),
      (3L, "c", "u", 1L))))
    assert(ops.read(spark, dst).select("id", "k").as[(Long, String)]
      .collect().toSet == Set((2L, "b2"), (3L, "c")),
      "bootstrap must land the folded survivors only")
    // batch 1 merges: update id=2, delete id=3, insert id=4 — file-scoped
    sink.addBatch(1, changes(Seq(
      (2L, "B", "u", 3L), (3L, "x", "d", 3L), (4L, "d", "u", 3L))))
    assert(ops.read(spark, dst).select("id", "k").as[(Long, String)]
      .collect().toSet == Set((2L, "B"), (4L, "d")))
    val vAfter = ops.versions(dst)
    // crash-replay of batch 1: the manifest ledger no-ops it
    sink.addBatch(1, changes(Seq(
      (2L, "B", "u", 3L), (3L, "x", "d", 3L), (4L, "d", "u", 3L))))
    assert(ops.versions(dst) == vAfter,
      "a redelivered merge batch must not land a second commit")
    // mergeKey outside Update mode is a contract confusion — refuse
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext,
        Map("path" -> dst, "txn" -> "x", "mergeKey" -> "id"), Seq.empty,
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
  }

  test("maxRowsPerTrigger admits by the O(1) rows headers: versions " +
    "group under the cap, a giant landing admits alone") {
    val tmp = tmpDir("ts-maxrows")
    val src = s"$tmp/src"
    ops.commit(rows(0 until 10), src)   // v1: 10 rows
    ops.commit(rows(10 until 15), src)  // v2: 5
    ops.commit(rows(15 until 18), src)  // v3: 3
    ops.commit(rows(18 until 60), src)  // v4: 42 (over any small cap)
    ops.commit(rows(60 until 62), src)  // v5: 2
    // cap 10: v1 (catch-up, 10 rows) alone; then v2+v3 (8); then v4
    // alone (42 > 10 but progress demands one); then v5
    val (ids, batches) = drain(src, s"$tmp/ck",
      Map("maxRowsPerTrigger" -> "10"))
    assert(ids == (0L until 62L), s"capped drain lost rows: $ids")
    assert(batches == 4,
      s"expected 4 admission groups under the row cap, got $batches")
  }

  test("startingTimestamp resolves to the first commit at/after the " +
    "instant; past-everything starts tail-only (empty, not an error)") {
    val tmp = tmpDir("ts-startts")
    val src = s"$tmp/src"
    ops.commit(rows(0 until 10), src)
    Thread.sleep(15)
    val mid = System.currentTimeMillis()
    Thread.sleep(15)
    ops.commit(rows(10 until 25), src)
    // from `mid`: only the second commit's rows
    val (ids, _) = drain(src, s"$tmp/ck1",
      Map("startingTimestamp" -> mid.toString))
    assert(ids == (10L until 25L), s"expected the post-instant delta: $ids")
    // an instant past every commit: empty now, live for what lands next
    val late = System.currentTimeMillis() + 5
    Thread.sleep(15)
    val (none, _) = drain(src, s"$tmp/ck2",
      Map("startingTimestamp" -> late.toString))
    assert(none.isEmpty, s"tail-only start must serve nothing yet: $none")
    ops.commit(rows(25 until 30), src)
    val (tail, _) = drain(src, s"$tmp/ck2",
      Map("startingTimestamp" -> late.toString))
    assert(tail == (25L until 30L),
      s"the tail-only consumer must pick up the next landing: $tail")
    // both anchors together refuse
    intercept[Exception] {
      drain(src, s"$tmp/ck3", Map("startingTimestamp" -> mid.toString,
        "startingVersion" -> "2"))
    }
  }

  test("native sink Update mode end-to-end: a rate-less changelog stream " +
    "upserts into the table through writeStream, exactly-once") {
    val tmp = tmpDir("tsink-merge-e2e")
    val src = s"$tmp/src"; val dst = s"$tmp/dst"; val ck = s"$tmp/ck"
    // the changelog arrives as a graft-table stream itself: each source
    // version is one micro-batch of keyed changes
    ops.commit(Seq((1L, "a", "u", 1L), (2L, "b", "u", 1L))
      .toDF("id", "k", "op", "seq"), src)
    def hop(): Unit = {
      val q = spark.readStream.format("graft-table").load(src)
        .writeStream.format("graft-table")
        .outputMode("update")
        .option("mergeKey", "id").option("opColumn", "op")
        .option("orderColumn", "seq")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    hop()
    assert(ops.read(spark, dst).select("id", "k").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
    // the next source version updates 1, deletes 2, inserts 3
    ops.commit(Seq((1L, "A", "u", 2L), (2L, "x", "d", 2L),
      (3L, "c", "u", 2L)).toDF("id", "k", "op", "seq"), src)
    hop()
    assert(ops.read(spark, dst).select("id", "k").as[(Long, String)]
      .collect().toSet == Set((1L, "A"), (3L, "c")),
      "the second hop must merge the delta, not append it")
  }
}
