package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SubstrDedupSpec extends SparkSpec {
  import spark.implicits._

  // size-2 windows so test corpora spell the window layout directly
  private def summary(docs: Seq[(Long, String)]) = {
    val df = docs.toDF("doc_id", "text")
    SubstrDedup.repeatSummary(df,
        SubstrDedup.markFirstWindows(df,
          SubstrDedup.windowHashes(TextAnalysis.tokens(col("text")), size = 2)))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("a verbatim span repeated in a later doc counts as duplicated there") {
    // doc 1: "a b c" -> windows [a b], [b c]; doc 2 repeats both
    val s = summary(Seq(1L -> "a b c", 2L -> "a b c"))
    assert(s(1L) == ((2L, 0L)))
    assert(s(2L) == ((2L, 2L)))
  }

  test("overlap at every offset is caught (the sliding-window point)") {
    // doc 2 embeds doc 1's span shifted by one token: LineDedup's fixed
    // segmentation misses it, the stride-1 window does not
    val s = summary(Seq(1L -> "x a b y", 2L -> "q a b z"))
    assert(s(2L)._2 == 1L) // exactly the [a b] window is a repeat
  }

  test("within one document the earlier offset wins") {
    val s = summary(Seq(5L -> "a b a b"))
    // windows: [a b](0) [b a](1) [a b](2) -> one self-repeat
    assert(s(5L) == ((3L, 1L)))
  }

  test("docs shorter than the window report zeros, not missing rows") {
    val s = summary(Seq(1L -> "solo", 2L -> "a b"))
    assert(s(1L) == ((0L, 0L)))
    assert(s(2L) == ((1L, 0L)))
  }

  test("winner stage partial-aggregates map-side (no window sort on hash)") {
    val df = Seq(1L -> "a b c").toDF("doc_id", "text")
    val plan = SubstrDedup.markFirstWindows(df,
        SubstrDedup.windowHashes(TextAnalysis.tokens(col("text")), size = 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q_substr_dedup on testdata: totals consistent, one row per doc") {
    val df = SubstrDedup.qSubstrDedup(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(df.count() == docs)
    assert(df.filter(col("n_dup") > col("n_windows")).isEmpty)
    df.unpersist()
  }
}
