package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot change feed: op assignment and imaging over an overwrite,
  * delete lineage surfacing as 'd' rows, append lineage as pure inserts,
  * null-position changes detected, and feed-apply replication. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  test("i/u/d assignment with after- and before-images") {
    val dir = tmpDir("cdf-basic")
    ops.commit(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "s", "v"), dir)
    // v2: key 1 unchanged, key 2 mutated, key 3 dropped, key 4 new
    ops.commit(Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0))
      .toDF("id", "s", "v"), dir, append = false)
    val feed = ops.changeFeed(spark, dir, "id", 1, 2)
      .as[(Long, String, Double, String)].collect().sortBy(_._1)
    assert(feed.toSeq == Seq(
      (2L, "B", 20.0, "u"), // after-image
      (3L, "c", 30.0, "d"), // before-image
      (4L, "d", 40.0, "i")))
  }

  test("row deletes surface as 'd'; appends as pure 'i'") {
    val dir = tmpDir("cdf-del")
    ops.commit(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v"), dir)
    ops.deleteWhere(spark, dir, col("id") === 2L)
    val delFeed = ops.changeFeed(spark, dir, "id", 1, 2)
      .as[(Long, Double, String)].collect().toSeq
    assert(delFeed == Seq((2L, 2.0, "d")))
    ops.commit(Seq((4L, 4.0)).toDF("id", "v"), dir)
    assert(ops.changeFeed(spark, dir, "id", 2, 3)
      .as[(Long, Double, String)].collect().toSeq == Seq((4L, 4.0, "i")))
  }

  test("null position swap is a change, not 'unchanged'") {
    val dir = tmpDir("cdf-null")
    ops.commit(Seq((1L, Option.empty[String], Option("x")))
      .toDF("id", "a", "b"), dir)
    ops.commit(Seq((1L, Option("x"), Option.empty[String]))
      .toDF("id", "a", "b"), dir, append = false)
    val feed = ops.changeFeed(spark, dir, "id", 1, 2)
      .select("id", "op").as[(Long, String)].collect().toSeq
    assert(feed == Seq((1L, "u")))
  }

  test("applying the feed replicates the transition across a rewrite") {
    val dir = tmpDir("cdf-apply")
    val replica = tmpDir("cdf-replica")
    val v1 = (1 to 50).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val v2 = (1 to 50).filter(_ % 4 != 0)
      .map(i => (i.toLong, if (i % 3 == 0) i * 2.0 else i * 1.0))
      .toDF("id", "v")
      .unionByName(Seq((99L, 99.0)).toDF("id", "v"))
    ops.commit(v1, dir)
    ops.commit(v2, dir, append = false)
    ops.commit(v1, replica)
    val feed = ops.changeFeed(spark, dir, "id", 1, 2)
    ops.mergeChanges(spark, replica,
      feed.withColumn("op",
        when(col("op") === "i", "u").otherwise(col("op"))), "id")
    val live = ops.read(spark, replica)
    assert(live.exceptAll(v2).isEmpty && v2.exceptAll(live).isEmpty)
  }
}
