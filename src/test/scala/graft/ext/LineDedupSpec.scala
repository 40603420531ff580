package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  // "lines" below are single tokens segmented at size = 1 so each test row
  // spells out the corpus line layout directly.
  private def marked(docs: Seq[(Long, String)]) =
    LineDedup.markFirstOccurrences(docs.toDF("doc_id", "text"),
        LineDedup.tokenSegments(TextAnalysis.tokens(col("text")), size = 1))
      .select(col("doc_id"), col("line_id"), col("line"), col("keep"))
      .as[(Long, Int, String, Boolean)].collect().toSet

  test("first corpus-wide occurrence wins; all later repeats drop") {
    val m = marked(Seq(1L -> "nav alpha", 2L -> "nav beta nav"))
    assert(m == Set(
      (1L, 0, "nav", true), (1L, 1, "alpha", true),
      (2L, 0, "nav", false), (2L, 1, "beta", true), (2L, 2, "nav", false)))
  }

  test("within one document the earliest line_id is the winner") {
    val m = marked(Seq(7L -> "x y x x"))
    assert(m.filter(_._3 == "x") == Set(
      (7L, 0, "x", true), (7L, 2, "x", false), (7L, 3, "x", false)))
  }

  test("summary counts survivors and fingerprints them in document order") {
    val rows = LineDedup.dedupSummary(
        marked(Seq(1L -> "a b", 2L -> "b c b")).toSeq.toDF("doc_id", "line_id", "line", "keep"))
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("kept_md5"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._3)) == Seq((1L, 2L, 2L), (2L, 3L, 1L)))
    // doc 1 keeps "a b"; doc 2 keeps only "c"
    assert(rows(0)._4 == md5Hex("a b"))
    assert(rows(1)._4 == md5Hex("c"))
  }

  test("a document whose every line is seen earlier fingerprints empty") {
    val rows = LineDedup.dedupSummary(
        marked(Seq(1L -> "a b", 2L -> "a b")).toSeq.toDF("doc_id", "line_id", "line", "keep"))
      .orderBy(col("doc_id"))
      .select(col("n_kept"), col("kept_md5")).as[(Long, String)].collect().toSeq
    assert(rows == Seq((2L, md5Hex("a b")), (0L, md5Hex(""))))
  }

  test("segment lines: geometry matches nChunks(stride = size)") {
    val segs = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
      .select(LineDedup.tokenSegments(TextAnalysis.tokens(col("text")), size = 4))
      .as[Seq[String]].head()
    assert(segs == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9"))
  }

  test("winner stage partial-aggregates map-side (no window sort on line)") {
    // The scale contract: a 10⁸-occurrence boilerplate line must reach the
    // reducer as one candidate per upstream partition, which requires the
    // winner to be an algebraic min (partial_min before the Exchange), not
    // a row_number window sorting every occurrence on one reducer.
    val plan = LineDedup.markFirstOccurrences(
        Seq(1L -> "a b", 2L -> "a c").toDF("doc_id", "text"),
        LineDedup.tokenSegments(TextAnalysis.tokens(col("text")), size = 1))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("NULL text is total: coalesces to one empty line, still deduped") {
    val df = LineDedup.dedupSummary(LineDedup.markFirstOccurrences(
        Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"),
        LineDedup.tokenSegments(
          TextAnalysis.tokens(coalesce(col("text"), lit(""))), size = 8)))
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"))
      .as[(Long, Long, Long)].collect().toSeq
    // each NULL doc yields exactly one (empty) line; the corpus-wide first
    // occurrence survives once, the second document's copy drops
    assert(df == Seq((1L, 1L, 1L), (2L, 1L, 0L)))
  }

  test("q_line_dedup runs on testdata: totals consistent, dedup is real") {
    val df = LineDedup.qLineDedup(spark, sf).cache()
    val agg = df.agg(sum("n_lines"), sum("n_kept")).as[(Long, Long)].head()
    assert(agg._1 >= agg._2 && agg._2 > 0)
    assert(df.filter(col("n_kept") > col("n_lines")).isEmpty)
    df.unpersist()
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
