package graft.ext

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("survival flags: quality, smaller-partner dup, contamination") {
    // long enough and punctuation-light -> quality-ok; stopwords present
    val good = "the quick brown fox jumps over the lazy dog again and " +
      "again for a very long while in the quiet green field today"
    val docs = Seq(
      (10L, "s0", good),
      (11L, "s0", good + " extra"),               // near-dup of 10 (smaller partner)
      (12L, "s1", "!!! ??? ..."),                 // fails quality
      (13L, "s1", "totally unrelated words here make one clean sentence " +
        "that is long enough to pass the quality band for sure it is"))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    // eval set shares a 3-gram with doc 13 only
    val eval_ = Seq((0L, "e", "clean sentence that is what we test"))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val flags = Curation.survivalFlags(docs, eval_)
      .as[(Long, String, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4, r._5)).toMap
    assert(flags(10L) === ((true, false, false)))  // keeper of the dup pair
    assert(flags(11L) === ((true, true, false)))   // has smaller partner 10
    assert(flags(12L)._1 === false)                // quality fail
    assert(flags(13L) === ((true, false, true)))   // contaminated
  }

  test("q_curation_funnel counts are monotone non-increasing") {
    val rows = Curation.qFunnel(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, total, q, d, c) =>
      assert(total >= q && q >= d && d >= c && c >= 0)
    }
    // sources come out sorted (deterministic oracle order)
    assert(rows.map(_._1).sameElements(rows.map(_._1).sorted))
  }
}
