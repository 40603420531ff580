package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Equality deletes (merge-on-read delete-BY-KEY) on the versioned table:
  * keys land as `#eqdel=` manifest lines + a key file, with ZERO data
  * scanned or written, and readers anti-join them against exactly the
  * files that were in the table when the delete landed (seq scoping —
  * Iceberg v2 semantics). The scoping is the invariant under test: a key
  * re-inserted AFTER the delete must survive, and every maintenance op
  * that cannot preserve the scoping (merge, promote, expire, incremental
  * read) must refuse loudly rather than corrupt it. */
class EqualityDeleteSpec extends SparkSpec {
  import spark.implicits._

  private val backend: TableIO = TableIO.local
  private lazy val ops = new VersionedTableOps(backend)

  private def ids(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id"), (col("id") % 10).as("k"))

  private def eqLines(dir: String, v: Int): Seq[String] =
    backend.readLines(s"$dir/manifests/v$v")
      .filter(_.startsWith("#eqdel="))

  test("deleteByKeys erases by key with zero data files scanned or written") {
    val dir = tmpDir("eq-basic")
    val v1 = ops.commit(ids(0, 1000).repartition(2), dir)
    val files = ops.manifestLines(dir, v1)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
    val sizes = files.map(f => f -> backend.size(f)).toMap
    val dataDirs = backend.list(s"$dir/data").size

    val v2 = ops.deleteByKeys(spark, dir, "id",
      Seq(1L, 5L, 7L, 500L).toDF("id"))
    assert(v2 == v1 + 1)
    // no new data batch dir; existing files byte-identical
    assert(backend.list(s"$dir/data").size == dataDirs)
    assert(files.forall(f => backend.size(f) == sizes(f)))
    assert(eqLines(dir, v2).size == 1)
    assert(ops.read(spark, dir).count() == 996)
    assert(ops.read(spark, dir).filter(col("id").isin(1L, 5L, 7L, 500L))
      .count() == 0)
    // time travel: pre-delete snapshot intact
    assert(ops.read(spark, dir, Some(v1)).count() == 1000)
    // empty key set is a no-op, not a commit
    assert(ops.deleteByKeys(spark, dir, "id",
      spark.emptyDataset[Long].toDF("id")) == v2)
  }

  test("eqdel.compact.threshold auto-materializes: the delete that " +
    "crosses the line pays the compaction, and fastCount serves again") {
    val dir = tmpDir("eq-auto")
    ops.commit(ids(0, 1000).repartition(2), dir)
    ops.setTableProperty(dir, "eqdel.compact.threshold", "2")
    ops.setTableProperty(dir, "compact.target.bytes", (1L << 30).toString)
    // first delete: below threshold — debt stays, fastCount refuses
    ops.deleteByKeys(spark, dir, "id", Seq(1L, 2L).toDF("id"))
    assert(eqLines(dir, ops.versions(dir).last).size == 1)
    val e = intercept[IllegalArgumentException] {
      ops.fastCount(spark, dir)
    }
    assert(e.getMessage.contains("equality deletes"))
    // second delete crosses the threshold: THIS call materializes
    val v = ops.deleteByKeys(spark, dir, "id", Seq(3L, 4L).toDF("id"))
    assert(eqLines(dir, v).isEmpty,
      "threshold crossing must leave a debt-free head")
    assert(ops.fastCount(spark, dir) == 996L)
    assert(ops.read(spark, dir).filter(col("id").isin(1L, 2L, 3L, 4L))
      .count() == 0)
  }

  test("compactIfDebt: no-op on a clean head, materializes positional " +
    "and equality debt otherwise") {
    val dir = tmpDir("eq-ifdebt")
    ops.commit(ids(0, 100), dir)
    val clean = ops.compactIfDebt(spark, dir)
    assert(clean == ops.versions(dir).last && eqLines(dir, clean).isEmpty)
    assert(ops.versions(dir) == Seq(1), "clean-head compactIfDebt committed")
    ops.deleteByKeys(spark, dir, "id", Seq(10L).toDF("id"))
    ops.deleteWhere(spark, dir, col("id") === 20L)
    val v = ops.compactIfDebt(spark, dir)
    assert(eqLines(dir, v).isEmpty)
    assert(ops.fastCount(spark, dir) == 98L)
  }

  test("seq scoping: a key re-inserted after the delete survives") {
    val dir = tmpDir("eq-scope")
    ops.commit(ids(0, 100), dir)
    val vDel = ops.deleteByKeys(spark, dir, "id", Seq(3L, 4L).toDF("id"))
    // re-insert key 3 AFTER the delete: new file, new era — must survive
    val vRe = ops.commit(Seq((3L, 99L)).toDF("id", "k"), dir)
    assert(eqLines(dir, vRe).size == 1, "append dropped the eqdel line")
    val live = ops.read(spark, dir)
    assert(live.count() == 99) // 100 - 2 deleted + 1 re-inserted
    assert(live.filter(col("id") === 3L).select(col("k"))
      .as[Long].collect().toSeq == Seq(99L))
    assert(live.filter(col("id") === 4L).count() == 0)
    // pinned post-delete pre-reinsert snapshot: both keys gone
    assert(ops.read(spark, dir, Some(vDel))
      .filter(col("id").isin(3L, 4L)).count() == 0)
  }

  test("compact materializes equality deletes and clears the lines") {
    val dir = tmpDir("eq-compact")
    ops.commit(ids(0, 500).repartition(2), dir)
    ops.deleteByKeys(spark, dir, "id", Seq(10L, 20L, 30L).toDF("id"))
    val vRe = ops.commit(Seq((10L, 42L)).toDF("id", "k"), dir)
    val before = ops.read(spark, dir, Some(vRe)).collect().toSet
    val vC = ops.compact(spark, dir, targetBytes = 1L << 30)
    assert(vC == vRe + 1)
    assert(eqLines(dir, vC).isEmpty,
      "compact must materialize equality deletes, not carry dead lines")
    assert(ops.read(spark, dir, Some(vC)).collect().toSet == before)
    // the deleted keys are PHYSICALLY absent from the rewritten files now
    val files = ops.manifestLines(dir, vC)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
    val raw = spark.read.parquet(files: _*)
    assert(raw.filter(col("id").isin(20L, 30L)).count() == 0)
    assert(raw.filter(col("id") === 10L).count() == 1) // the re-insert
  }

  test("expire refuses while unmaterialized equality deletes are retained") {
    val dir = tmpDir("eq-expire")
    ops.commit(ids(0, 100), dir)
    ops.commit(ids(100, 200), dir)
    ops.deleteByKeys(spark, dir, "id", Seq(50L).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      ops.expire(dir, keepLast = 2)
    }
    assert(e.getMessage.contains("equality"))
    // materialize, then expire works and GCs the superseded key file
    val vC = ops.compact(spark, dir, targetBytes = 1L << 30)
    val keyFiles = ops.eqDelsOf(dir, vC - 1).map(_._3)
    assert(keyFiles.nonEmpty && keyFiles.forall(backend.exists))
    ops.expire(dir, keepLast = 1)
    assert(keyFiles.forall(f => !backend.exists(f)),
      "expire left superseded equality-delete key files behind")
    assert(ops.read(spark, dir).count() == 199)
  }

  test("merge, promote, and readChanges refuse over unmaterialized deletes") {
    val dir = tmpDir("eq-refuse")
    val v1 = ops.commit(ids(0, 100), dir)
    val v2 = ops.deleteByKeys(spark, dir, "id", Seq(7L).toDF("id"))
    val m = intercept[IllegalArgumentException] {
      ops.merge(spark, dir, Seq((1L, 5L)).toDF("id", "k"), "id")
    }
    assert(m.getMessage.contains("compact"))
    val p = intercept[IllegalArgumentException] {
      ops.promote(spark, dir, tmpDir("eq-refuse-prod"), append = false)
    }
    assert(p.getMessage.contains("equality"))
    val rc = intercept[IllegalArgumentException] {
      ops.readChanges(spark, dir, v1, v2)
    }
    assert(rc.getMessage.contains("equality"))
  }

  test("rollback across a delete restores the pre-delete state") {
    val dir = tmpDir("eq-rollback")
    val v1 = ops.commit(ids(0, 50), dir)
    val v2 = ops.deleteByKeys(spark, dir, "id", Seq(9L).toDF("id"))
    val vR = ops.rollback(dir, v1)
    assert(eqLines(dir, vR).isEmpty)
    assert(ops.read(spark, dir).count() == 50) // key 9 resurrects: intended
    // rolling forward again to the post-delete state carries the line
    val vR2 = ops.rollback(dir, v2)
    assert(eqLines(dir, vR2).size == 1)
    assert(ops.read(spark, dir).filter(col("id") === 9L).count() == 0)
  }

  test("pruned reads apply equality deletes; null key erases null rows") {
    val dir = tmpDir("eq-pruned")
    val df = spark.range(0, 100)
      .select(when(col("id") === 13L, lit(null).cast("long"))
        .otherwise(col("id")).as("id"), (col("id") % 10).as("k"))
    val v1 = ops.commit(df, dir)
    ops.writeStats(spark, dir, v1, Seq("id"))
    ops.deleteByKeys(spark, dir, "id",
      spark.range(2).select(when(col("id") === 0, lit(40L))
        .otherwise(lit(null)).cast("long").as("id")))
    val pruned = ops.prunedRead(spark, dir, "id", 0L, 50L)
    assert(pruned.filter(col("id") === 40L).count() == 0)
    assert(pruned.filter(col("id").isNull).count() == 0,
      "null delete key must erase the null-key row (null-safe equality)")
    assert(ops.read(spark, dir).count() == 98)
  }

  test("compact.auto.files auto-compacts streaming small-file landings: " +
    "the commit that crosses the threshold pays the pass and resets") {
    val dir = tmpDir("eq-autocompact")
    ops.setTableProperty(dir, "compact.auto.files", "6")
    ops.setTableProperty(dir, "compact.target.bytes", (1L << 30).toString)
    // each landing writes 2 tiny files; the 3rd landing crosses 6
    ops.commit(ids(0, 100).repartition(2), dir)
    ops.commit(ids(100, 200).repartition(2), dir)
    assert(ops.versions(dir) == Seq(1, 2), "below threshold: no pass yet")
    def dataFiles(v: Int): Seq[String] =
      ops.manifestLines(dir, v).filter(l => l.nonEmpty && !l.startsWith("#"))
    val v3 = ops.commit(ids(200, 300).repartition(2), dir)
    assert(v3 == 4,
      s"crossing commit must land (v3) then compact (v4), got head $v3")
    assert(dataFiles(v3).size == 1,
      s"auto-pass must bin-pack the 6 small files: ${dataFiles(v3)}")
    assert(ops.read(spark, dir).select("id").as[Long].collect().sorted
      .sameElements(0L until 300L))
    assert(ops.fastCount(spark, dir) == 300L)
    // the counter reset: three more landings before the next pass
    ops.commit(ids(300, 400).repartition(2), dir)
    ops.commit(ids(400, 500).repartition(2), dir)
    assert(ops.versions(dir).last == 6, "counter must reset after a pass")
    val v7 = ops.commit(ids(500, 600).repartition(2), dir)
    assert(v7 == 8, "second crossing compacts again")
    // without the property, nothing ever auto-compacts
    val plain = tmpDir("eq-noauto")
    (0 until 5).foreach(i =>
      ops.commit(ids(i * 10, i * 10 + 10).repartition(2), plain))
    assert(ops.versions(plain) == (1 to 5),
      "no property: landings never trigger maintenance")
  }

  test("auto-compact under concurrent writers: no landing fails, no row " +
    "lost, the advisory counter races are harmless") {
    val dir = tmpDir("eq-autocompact-race")
    ops.setTableProperty(dir, "compact.auto.files", "4")
    ops.setTableProperty(dir, "compact.target.bytes", (1L << 30).toString)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit =
            (0 until 3).foreach { i =>
              val lo = (w * 3 + i) * 100
              ops.commit(ids(lo, lo + 100).repartition(2), dir)
            }
        })
      }
      futures.foreach(_.get()) // a failed landing rethrows here
    } finally pool.shutdown()
    // every row landed exactly once, whatever interleaving happened
    assert(ops.read(spark, dir).select("id").as[Long].collect().sorted
      .sameElements(0L until 1200L))
    assert(ops.fastCount(spark, dir) == 1200L)
    // at least one auto-pass ran (12 landings × 2 small files over a
    // threshold of 4), visible as fewer head files than landed files
    val head = ops.manifestLines(dir, ops.versions(dir).last)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
    assert(head.size < 24,
      s"expected at least one bin-pack pass, head has ${head.size} files")
  }
}
