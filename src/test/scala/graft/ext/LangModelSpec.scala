package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("charTrigrams: sliding character windows, empty under 3 chars") {
    val rows = Seq((1L, "abcd"), (2L, "ab"), (3L, "xyz"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), LangModel.charTrigrams("text").as("tris"))
      .as[(Long, Seq[String])].collect().toMap
    assert(rows(1L) == Seq("abc", "bcd"))
    assert(rows(2L) == Seq.empty)
    assert(rows(3L) == Seq("xyz"))
  }

  test("model counts every corpus trigram occurrence") {
    val docs = Seq((1L, "aaab"), (2L, "aaa")).toDF("doc_id", "text")
    val model = LangModel.train(docs)
      .as[(String, Long)].collect().toMap
    assert(model == Map("aaa" -> 2L, "aab" -> 1L))
  }

  test("a document of common trigrams scores lower cross-entropy than a rare one") {
    // "aaaa..." trigrams dominate the corpus; doc 9 is the odd one out
    val docs = (Seq.tabulate(9)(i => (i.toLong, "aaaaaaaaaa")) :+
      (9L, "zqxjvkwpfb")).toDF("doc_id", "text")
    val ce = LangModel.crossEntropy(
        LangModel.docTrigramCounts(docs), LangModel.train(docs))
      .select(col("doc_id"), col("ce")).as[(Long, Double)].collect().toMap
    assert(ce(9L) > ce(0L))
    assert(ce(0L) == ce(5L)) // identical docs, identical score
  }

  test("cross-entropy is the exact hand formula on a tiny corpus") {
    // corpus "abab" (tris: aba, bab), "abab": model {aba->2, bab->2}, total 4
    val docs = Seq((1L, "abab"), (2L, "abab")).toDF("doc_id", "text")
    val ce = LangModel.crossEntropy(
        LangModel.docTrigramCounts(docs), LangModel.train(docs))
      .select(col("doc_id"), col("ce")).as[(Long, Double)].collect().toMap
    // every trigram has ct=2, total=4 -> ce = ln(4) - ln(2) = ln(2)
    assert(math.abs(ce(1L) - math.log(2)) < 1e-12)
  }

  test("q_ngram_perplexity: deterministic 20 rows, positive entropy") {
    val rows = LangModel.qNgramPerplexity(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.length == 20)
    assert(rows.forall(_._3 > 0))
    assert(rows == rows.sortBy(r => (-r._3, r._1)))
  }
}
