package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sinks.VersionedTable

/** The streaming change-data-feed source
  * (`readStream.format("graft-table").option("readChangeFeed", "true")`):
  * keyed i/u/d rows per version transition, non-append lineage served
  * instead of refused, per-transition (not net) history, exactly-once
  * checkpointed tailing, and the table→CDC-stream→table round trip
  * through the Update-mode sink. */
class CdfStreamSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def rows(ids: Range, tag: String = "a") =
    ids.map(i => (i.toLong, tag)).toDF("id", "k")

  /** Drain the CDF stream; returns (id, op, commitVersion) triples seen
    * this run, sorted, plus the non-empty micro-batch count. */
  private def drain(dir: String, checkpoint: String,
                    options: Map[String, String] = Map.empty)
      : (Seq[(Long, String, Long)], Int) = {
    val got =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    var reader = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("changeKey", "id")
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val triples = b.select("id", "op", "_commit_version")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        if (triples.nonEmpty) batches.incrementAndGet()
        triples.foreach(got.add)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (got.iterator().asScala.toSeq.sorted, batches.get())
  }

  test("appends stream as inserts; MERGE/DELETE lineage streams as u/d " +
      "instead of refusing") {
    val tmp = tmpDir("cdf-basic")
    val dir = s"$tmp/table"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 20), dir) // v1
    val (first, _) = drain(dir, ck)
    assert(first == (0L until 20L).map(i => (i, "i", 1L)),
      s"fresh catch-up should be v1 inserts, got ${first.take(5)}...")
    // v2: plain append; v3: a MERGE that updates 5..10 and deletes 0..3
    // — non-append lineage, which the plain stream refuses loudly but
    // the change feed serves as keyed u/d rows
    ops.commit(rows(20 until 25), dir) // v2
    val changes = rows(5 until 10, "upd").withColumn("op", lit("u"))
      .unionByName(rows(0 until 3).withColumn("op", lit("d")))
    ops.mergeChanges(spark, dir, changes, "id") // v3
    val (delta, _) = drain(dir, ck)
    val expected =
      ((0L until 3L).map(i => (i, "d", 3L)) ++
        (5L until 10L).map(i => (i, "u", 3L)) ++
        (20L until 25L).map(i => (i, "i", 2L))).sorted
    assert(delta == expected, s"got $delta")
  }

  test("per-transition history: insert-then-delete of the same key in " +
      "one admitted range emits BOTH rows") {
    val tmp = tmpDir("cdf-per-transition")
    val dir = s"$tmp/table"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 5), dir)             // v1
    ops.commit(rows(100 until 103), dir)         // v2: insert 100..102
    ops.deleteWhere(spark, dir, col("id") >= 100) // v3: delete them again
    val (all, _) = drain(dir, ck)
    // the net diff v0→v3 would hide keys 100..102 entirely; the feed
    // must serve their insert AND their delete
    val hot = all.filter(_._1 >= 100L)
    assert(hot == ((100L until 103L).map(i => (i, "i", 2L)) ++
      (100L until 103L).map(i => (i, "d", 3L))).sorted, s"got $hot")
  }

  test("checkpointed restart serves only new transitions; capped drain " +
      "splits per version") {
    val tmp = tmpDir("cdf-restart")
    val dir = s"$tmp/table"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 10), dir)
    assert(drain(dir, ck)._1.forall(_._2 == "i"))
    ops.commit(rows(10 until 20), dir)                  // v2
    ops.merge(spark, dir, rows(0 until 2, "up2"), "id") // v3: updates
    val (delta, batches) =
      drain(dir, ck, Map("maxVersionsPerTrigger" -> "1"))
    assert(batches == 2, s"expected one batch per transition, got $batches")
    assert(delta == ((0L until 2L).map(i => (i, "u", 3L)) ++
      (10L until 20L).map(i => (i, "i", 2L))).sorted)
    // nothing new: an idle drain serves nothing (and replays nothing)
    assert(drain(dir, ck)._1.isEmpty)
  }

  test("startingVersion tails changes from that version only") {
    val tmp = tmpDir("cdf-startv")
    val dir = s"$tmp/table"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 50), dir)            // v1
    ops.commit(rows(50 until 60), dir)           // v2
    ops.deleteWhere(spark, dir, col("id") < 5)   // v3
    val (got, _) = drain(dir, ck, Map("startingVersion" -> "3"))
    assert(got == (0L until 5L).map(i => (i, "d", 3L)),
      s"expected only the v3 deletes, got $got")
  }

  test("table→CDC-stream→table round trip: the destination replicates " +
      "the source head through mergeChanges") {
    val tmp = tmpDir("cdf-roundtrip")
    val src = s"$tmp/src"; val dst = s"$tmp/dst"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 30), src)                   // v1
    ops.commit(rows(30 until 40), src)                  // v2
    val changes = rows(10 until 15, "upd").withColumn("op", lit("u"))
      .unionByName(rows(0 until 4).withColumn("op", lit("d")))
    ops.mergeChanges(spark, src, changes, "id")         // v3
    def replicate(): Unit = {
      val feed = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").option("changeKey", "id")
        .load(src)
        // the feed's `i` is an upsert to a replica (same-key semantics
        // as `u`); `_commit_version` is the fold order for batches that
        // span several transitions of one key
        .withColumn("op",
          when(col("op") === "i", "u").otherwise(col("op")))
      val q = feed.writeStream.format("graft-table")
        .outputMode("update")
        .option("mergeKey", "id").option("opColumn", "op")
        .option("orderColumn", "_commit_version")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    replicate()
    def snap(dir: String) = ops.read(spark, dir).select("id", "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(snap(dst) == snap(src), "replica diverged after catch-up")
    // more source mutations; the SAME checkpoint carries the replica
    ops.commit(rows(40 until 45), src)
    ops.deleteWhere(spark, src, col("id") >= 38 && col("id") < 42)
    replicate()
    assert(snap(dst) == snap(src), "replica diverged after the tail")
  }

  test("contract refusals: changeKey required, must be a column, and is " +
      "CDF-only") {
    val tmp = tmpDir("cdf-refuse")
    val dir = s"$tmp/t"
    ops.commit(rows(0 until 3), dir)
    def start(opts: Map[String, String]) = {
      var r = spark.readStream.format("graft-table")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(dir).writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ck-${opts.hashCode}")
        .trigger(Trigger.AvailableNow()).start()
    }
    val e1 = intercept[Exception] {
      start(Map("readChangeFeed" -> "true")).awaitTermination()
    }
    assert(e1.getMessage.contains("changeKey") ||
      e1.getCause != null && e1.getCause.getMessage.contains("changeKey"))
    val e2 = intercept[Exception] {
      start(Map("readChangeFeed" -> "true", "changeKey" -> "nope"))
        .awaitTermination()
    }
    assert(e2.getMessage.contains("not a column") ||
      e2.getCause != null && e2.getCause.getMessage.contains("not a column"))
    val e3 = intercept[Exception] {
      start(Map("changeKey" -> "id")).awaitTermination()
    }
    assert(e3.getMessage.contains("readChangeFeed") ||
      e3.getCause != null &&
        e3.getCause.getMessage.contains("readChangeFeed"))
  }

  test("changeKey naming a reserved change-metadata column refuses " +
      "up front, not deep inside the diff") {
    val tmp = tmpDir("cdf-reserved-key")
    val dir = s"$tmp/t"
    ops.commit(rows(0 until 3), dir)
    for (k <- Seq("op", "_commit_version")) {
      val e = intercept[Exception] {
        spark.readStream.format("graft-table")
          .option("readChangeFeed", "true").option("changeKey", k)
          .load(dir).writeStream.format("noop")
          .option("checkpointLocation", s"$tmp/ck-$k")
          .trigger(Trigger.AvailableNow()).start().awaitTermination()
      }
      val msg = e.getMessage +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("reserved change-feed metadata"),
        s"changeKey '$k' should refuse as reserved, got: $msg")
    }
  }

  test("a catch-up batch spanning an ADD COLUMN boundary drains: " +
      "vintage schemas union, conform pins the query schema") {
    // the round-10 shape: cdfBatch unioned per-transition frames with a
    // STRICT unionByName, so two transitions on either side of a schema
    // evolution (read/readChanges infer from the files) threw an
    // AnalysisException and the stream could not drain at the default cap
    val tmp = tmpDir("cdf-evolve")
    val dir = s"$tmp/t"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 4), dir) // v1: (id, k)
    ops.commit((4 until 8).map(i => (i.toLong, "a", i * 10))
      .toDF("id", "k", "extra"), dir) // v2: (id, k, extra) — wider vintage
    // one admitted range spans both transitions (cap is 64); the pinned
    // schema is v1's vintage, so the union must not refuse and `extra`
    // projects away
    val (got, _) = drain(dir, ck)
    assert(got == (0L until 4L).map(i => (i, "i", 1L)) ++
      (4L until 8L).map(i => (i, "i", 2L)),
      s"the evolution-spanning catch-up must serve every row: $got")
  }

  test("a checkpointed consumer whose offset version was expired refuses " +
      "loudly instead of re-serving the snapshot as inserts") {
    val tmp = tmpDir("cdf-expired")
    val dir = s"$tmp/t"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 10), dir) // v1
    val (first, _) = drain(dir, ck)   // consumer checkpointed at v1
    assert(first.size == 10)
    // the gap the consumer must not lose: a delete at v2, appends after
    ops.deleteWhere(spark, dir, col("id") < 3L) // v2
    ops.commit(rows(10 until 12), dir)          // v3
    ops.commit(rows(12 until 14), dir)          // v4
    ops.compact(spark, dir, targetBytes = 1L << 30) // v5
    ops.expire(dir, keepLast = 2) // retains v4, v5 — v1 (the offset) gone
    assert(ops.versions(dir).head > 1, "expire must have dropped v1")
    val e = intercept[Exception] { drain(dir, ck) }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("expired"),
      s"expected the expired-offset refusal, got: $msg")
  }

  test("a table already carrying a reserved change-metadata column " +
      "refuses the feed instead of silently overwriting it") {
    val tmp = tmpDir("cdf-reserved")
    val dir = s"$tmp/t"
    ops.commit((0 until 3).map(i => (i.toLong, "u")).toDF("id", "op"), dir)
    val e = intercept[Exception] {
      spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").option("changeKey", "id")
        .load(dir).writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ck")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("reserves column"),
      s"expected the reserved-column refusal, got: $msg")
  }

  test("the '#cdf=A..B' SQL fragment serves the STREAM's exact feed " +
      "(shared core), distributed, with the same refusal semantics") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    val tmp = tmpDir("cdf-sql")
    val dir = s"$tmp/t"; val ck = s"$tmp/ck"
    ops.commit(rows(0 until 10), dir)                   // v1
    ops.commit(rows(10 until 15), dir)                  // v2
    ops.merge(spark, dir, rows(0 until 3, "up"), "id")  // v3
    ops.deleteWhere(spark, dir, col("id") === 14L)      // v4
    val (streamed, _) = drain(dir, ck)
    ops.setTableProperty(dir, "cdf.key", "id")
    val viaSql = spark.sql(s"SELECT id, op, _commit_version " +
      s"FROM graft.`$dir#cdf=0..4`")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    assert(viaSql == streamed,
      s"SQL fragment diverged from the stream: ${viaSql.take(5)}... vs " +
        s"${streamed.take(5)}...")
    // the feed must execute distributed — never a driver collect
    val plan = spark.sql(s"SELECT * FROM graft.`$dir#cdf=0..4`")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"driver-collected feed:\n$plan")
    // a sub-range serves only its transitions
    assert(spark.sql(s"SELECT DISTINCT _commit_version " +
      s"FROM graft.`$dir#cdf=2..4`")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // refusals: missing key property, reserved key, bad range, expired start
    ops.removeTableProperty(dir, "cdf.key")
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir#cdf=0..4`").collect()
    }
    assert(e1.getMessage.contains("cdf.key"))
    ops.setTableProperty(dir, "cdf.key", "op")
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir#cdf=0..4`").collect()
    }
    assert(e2.getMessage.contains("not a column"))
    ops.setTableProperty(dir, "cdf.key", "id")
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir#cdf=0..9`").collect()
    }
    assert(e3.getMessage.contains("not a valid range"))
    ops.commit(rows(20 until 22), dir) // v5
    ops.expire(dir, keepLast = 2)      // v1..v3 gone
    val e4 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir#cdf=1..5`").collect()
    }
    assert(e4.getMessage.contains("expired"),
      s"an expired pinned start must refuse: ${e4.getMessage}")
    // a range starting at 0 stays legal: snapshot-as-inserts catch-up
    assert(spark.sql(s"SELECT * FROM graft.`$dir#cdf=0..5`").count() > 0)
  }

  test("a 50-append range collapses to a constant number of scan legs — " +
      "plan size independent of the transition count — and still serves " +
      "per-transition _commit_version") {
    val tmp = tmpDir("cdf-collapse")
    val dir = s"$tmp/t"
    (0 until 50).foreach(i => ops.commit(rows(i until i + 1), dir))
    val feed = TableStreamSource.cdfSlice(spark, dir, "id", 0, 50,
      fresh = true)
    val plan = feed.queryExecution.executedPlan.toString
    val scans = "FileScan".r.findAllIn(plan).size
    assert(scans <= 3,
      s"a 50-append range must plan O(1) scan legs (snapshot + one " +
        s"collapsed run), got $scans FileScans:\n${plan.take(1500)}")
    val got = feed.select("id", "op", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got == (0 until 50).map(i => (i.toLong, "i", (i + 1).toLong)),
      s"the collapsed feed must serve each row under ITS transition: " +
        s"${got.take(5)}...")
    // the SQL door shares the collapsed core verbatim
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    ops.setTableProperty(dir, "cdf.key", "id")
    val viaSql = spark.sql(s"SELECT id, op, _commit_version " +
      s"FROM graft.`$dir#cdf=0..50`")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(viaSql == got, "SQL fragment diverged from the collapsed feed")
  }

  test("an append run spanning a vintage type boundary still collapses: " +
      "the widened read schema serves narrow files") {
    val tmp = tmpDir("cdf-collapse-widen")
    val dir = s"$tmp/t"
    ops.commit((0 until 3).map(i => (i, "a")).toDF("id", "k"), dir)  // int
    ops.commit((3 until 6).map(i => (i, "a")).toDF("id", "k"), dir)  // int
    ops.commit((6 until 9).map(i => (i.toLong, "a")).toDF("id", "k"),
      dir) // long vintage — parquet mergeSchema would refuse this mix
    val feed = TableStreamSource.cdfSlice(spark, dir, "k", 0, 3,
      fresh = true)
    val got = feed.select(col("id").cast("long").as("id"), col("op"),
      col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == (0 until 9).map(i => (i.toLong, "i", (i / 3 + 1).toLong)),
      s"widened run must serve every vintage's rows: $got")
  }

  test("a range spanning more rewriting transitions than the cap refuses " +
      "with a chunking instruction; at-cap ranges plan") {
    val tmp = tmpDir("cdf-rewrite-cap")
    val dir = s"$tmp/t"
    ops.commit(rows(0 until 10), dir)                   // v1
    ops.merge(spark, dir, rows(0 until 2, "u1"), "id")  // v2: rewrite
    ops.merge(spark, dir, rows(2 until 4, "u2"), "id")  // v3: rewrite
    ops.merge(spark, dir, rows(4 until 6, "u3"), "id")  // v4: rewrite
    TableStreamSource.withCdfMaxRewrites(2) {
      val e = intercept[IllegalArgumentException] {
        TableStreamSource.cdfSlice(spark, dir, "id", 1, 4, fresh = false)
      }
      assert(e.getMessage.contains("rewriting transitions") &&
        e.getMessage.contains("Chunk the range"),
        s"over-cap rewriting range must refuse with the chunking " +
          s"instruction: ${e.getMessage}")
      // exactly at the cap plans fine (and the chunked halves cover it)
      val half1 = TableStreamSource.cdfSlice(spark, dir, "id", 1, 3,
        fresh = false).count()
      val half2 = TableStreamSource.cdfSlice(spark, dir, "id", 3, 4,
        fresh = false).count()
      assert(half1 == 4 && half2 == 2,
        s"chunked halves must serve the feed: $half1 + $half2")
    }
  }

  test("change-feed catch-up self-caps versions per micro-batch " +
      "(bounded plan size); the drain still serves everything") {
    val tmp = tmpDir("cdf-cap")
    val dir = s"$tmp/t"; val ck = s"$tmp/ck"
    val n = graft.sources.TableStreamSource.CdfDefaultVersionsPerTrigger + 6
    (0 until n).foreach(i => ops.commit(rows(i until (i + 1)), dir))
    val (got, batches) = drain(dir, ck)
    assert(got.size == n, s"every version's row must arrive: ${got.size}")
    assert(batches >= 2,
      s"an uncapped CDF catch-up would plan $n transitions in one " +
        s"batch; expected the default cap to split it, got $batches")
  }
}
