package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def shuffleBytesOf(body: => Unit): Long = {
    val bytes = new AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // listener delivery is async — settle until the counter stops moving
      var prev = -1L; var cur = bytes.get()
      while (cur != prev) { Thread.sleep(30); prev = cur; cur = bytes.get() }
    } finally spark.sparkContext.removeSparkListener(l)
    bytes.get()
  }

  test("bloomJoin result is identical to the plain join (superset contract)") {
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
    val bloomed = BloomJoin.bloomJoin(li, col("l_orderkey"),
      urgent, col("o_orderkey"), expectedItems = 10000, fpp = 0.01)
    assert(bloomed.count() == plain.count())
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("no false negatives even at an absurdly small filter (64 bits)") {
    // every build key must survive the pre-filter regardless of fpp —
    // optimalNumBits floors at 64, and 5k keys in 64 bits is fpp ≈ 1,
    // so this is the worst case: the filter keeps nearly everything,
    // but must never drop a true match
    val keys = Tables.orders(spark, sf).select(col("o_orderkey"))
    val bloom = BloomJoin.buildBloom(keys, col("o_orderkey"),
      expectedItems = 1, fpp = 0.5) // → 64 bits
    val survivors = keys.filter(BloomJoin.mightContain(bloom, col("o_orderkey")))
    assert(survivors.count() == keys.count())
  }

  test("empty build side → null bloom → pre-filter keeps nothing") {
    val empty = Tables.orders(spark, sf).filter(lit(false))
    val bloom = BloomJoin.buildBloom(empty, col("o_orderkey"), 100, 0.01)
    assert(bloom == null)
    val li = Tables.lineitem(spark, sf)
    assert(li.filter(BloomJoin.mightContain(bloom, col("l_orderkey"))).isEmpty)
  }

  test("pre-filter cuts the big side's shuffle under a sort-merge join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // ~6% selective build side; payload is per-row hashes so compressed
      // shuffle sizes track row counts (constant pads deflate to nothing)
      val urgent = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"))
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"),
          sha2(concat_ws(":", col("l_orderkey"), col("l_partkey"),
            col("l_linenumber")), 256).as("pad"))
      def run(big: DataFrame): Long = shuffleBytesOf {
        big.join(urgent, col("l_orderkey") === col("o_orderkey")).collect()
      }
      val plainBytes = run(li)
      val bloomedBytes = run(BloomJoin.preFilter(li, col("l_orderkey"),
        urgent, col("o_orderkey"), expectedItems = 10000, fpp = 0.01))
      assert(plainBytes > 0)
      // 6% of orders are urgent+early → ≥ 5× shuffle reduction on the big
      // side even with the small side's repeated shuffle counted both runs
      assert(bloomedBytes * 5 < plainBytes,
        s"bloomed=$bloomedBytes plain=$plainBytes")
      // and the probe itself must sit in the scan stage: the filter shows
      // up below the exchange, not above it
      val bloomedPlan = BloomJoin.preFilter(li, col("l_orderkey"),
          urgent, col("o_orderkey"), 10000, 0.01)
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(bloomedPlan.contains("might_contain"), bloomedPlan.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
