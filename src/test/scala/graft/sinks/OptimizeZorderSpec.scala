package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OPTIMIZE ZORDER over the versioned table: an arrival-ordered landing
  * with positional + equality delete debt becomes a clustered,
  * delete-free snapshot — same rows, stats that actually prune, ledger
  * carried, history intact, concurrent-delete abort. */
class OptimizeZorderSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  /** Arrival-ordered landing: each commit spans the WHOLE key range, so
    * before clustering every file may contain any key. */
  private def land(dir: String): Unit =
    (0 until 4).foreach { b =>
      ops.commitOnce((0 until 250).map { i =>
        val id = (i * 4 + b).toLong
        (id, id % 97, s"p$b-$i")
      }.toDF("id", "k", "payload"), dir, s"land:$b")
    }

  test("clustered rewrite: same rows, pruning stats, delete debt cleared") {
    val dir = tmpDir("optz")
    land(dir)
    ops.deleteWhere(spark, dir, col("id") < 10L) // positional vector
    ops.deleteByKeys(spark, dir, "id", Seq(500L, 501L).toDF("id")) // eq
    val before = ops.read(spark, dir).collect().toSet
    assert(before.size == 988)

    val v = ops.optimizeZorder(spark, dir, Seq("id"), numFiles = 4)
    val after = ops.read(spark, dir)
    assert(after.collect().toSet == before) // byte-for-byte same rows
    // delete debt is materialized: the clustered head carries no vectors
    val h = ops.history(spark, dir).filter(col("version") === v).head()
    assert(h.getAs[Long]("n_delete_files") == 0L)
    // id-range pruning now skips files (arrival order couldn't)
    val pruned = ops.prunedFiles(dir, v, "id", 0L, 99L)
    assert(pruned.size < 4, s"clustering did not tighten id ranges: " +
      s"${pruned.size} of 4 files admit a 10% key slice")
    // pruning is a superset guarantee: the residual filter over surviving
    // files recovers exactly the slice
    assert(ops.prunedRead(spark, dir, "id", 0L, 99L)
      .filter(col("id").between(0L, 99L)).count() ==
      after.filter(col("id").between(0L, 99L)).count())
    // txn ledger survives maintenance (replay horizon intact)
    assert(ops.committedTxns(dir).contains("land:3"))
    // pre-optimize snapshot still time-travels WITH its deletes applied
    assert(ops.read(spark, dir, Some(v - 1)).collect().toSet == before)
    // equality-delete scoping cleared: a merge is allowed again
    ops.merge(spark, dir, Seq((500L, 1L, "re")).toDF("id", "k", "payload"),
      "id")
    assert(ops.read(spark, dir).filter(col("id") === 500L).count() == 1)
  }

  test("file count lands at numFiles; re-optimize is stable") {
    val dir = tmpDir("optz-twice")
    land(dir)
    val v1 = ops.optimizeZorder(spark, dir, Seq("k"), numFiles = 4)
    assert(ops.filesMeta(spark, dir, Some(v1)).count() == 4)
    val before = ops.read(spark, dir).collect().toSet
    // appends after the pass stay unclustered until the next one
    ops.commit((1000L until 1010L).map(i => (i, i % 97, "late"))
      .toDF("id", "k", "payload"), dir)
    val v2 = ops.optimizeZorder(spark, dir, Seq("k"), numFiles = 4)
    assert(ops.filesMeta(spark, dir, Some(v2)).count() == 4)
    val after = ops.read(spark, dir).collect().toSet
    assert(after.size == before.size + 10)
    assert(before.subsetOf(after))
  }
}
