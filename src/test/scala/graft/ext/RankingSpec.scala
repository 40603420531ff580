package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def scores(docs: DataFrame, terms: Seq[String]): Map[Long, Double] =
    Ranking.bm25(docs, terms).as[(Long, Double)].collect().toMap

  test("more query-term occurrences rank higher at equal length") {
    val docs = Seq(
      (0L, "spark spark spark pad pad pad"),
      (1L, "spark spark pad pad pad pad"),
      (2L, "spark pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad"))
      .toDF("doc_id", "text")
    val s = scores(docs, Seq("spark"))
    assert(!s.contains(3L)) // no query term -> no row
    assert(s(0L) > s(1L) && s(1L) > s(2L))
  }

  test("rarer terms carry more weight than common ones") {
    // "common" is in every doc, "rare" in one; equal tf and length
    val docs = Seq(
      (0L, "common rare pad pad"),
      (1L, "common pad pad pad"),
      (2L, "common pad pad pad"),
      (3L, "common pad pad pad"))
      .toDF("doc_id", "text")
    val s = scores(docs, Seq("common", "rare"))
    assert(s(0L) > s(1L))
    assert(s(1L) === s(2L) && s(2L) === s(3L))
  }

  test("length normalization: same tf in a shorter doc scores higher") {
    val docs = Seq(
      (0L, "spark pad"),
      (1L, "spark pad pad pad pad pad pad pad"))
      .toDF("doc_id", "text")
    val s = scores(docs, Seq("spark"))
    assert(s(0L) > s(1L))
  }

  test("multi-term score is the sum of single-term scores") {
    val docs = Seq(
      (0L, "spark join pad pad"),
      (1L, "spark pad pad pad"),
      (2L, "join join pad pad"))
      .toDF("doc_id", "text")
    val both = scores(docs, Seq("spark", "join"))
    val sparkOnly = scores(docs, Seq("spark"))
    val joinOnly = scores(docs, Seq("join"))
    assert(math.abs(both(0L) - (sparkOnly(0L) + joinOnly(0L))) < 1e-12)
  }

  test("tfidfTerms: corpus-wide terms score 0, distinctive terms rank first") {
    val docs = Seq(
      (0L, "everywhere unique0 unique0 filler"),
      (1L, "everywhere unique1 filler filler"),
      (2L, "everywhere filler filler filler"))
      .toDF("doc_id", "text")
    val top = Ranking.tfidfTerms(docs, topK = 2)
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    // "everywhere" is in every doc -> idf = ln(1) = 0, never a top term
    // against any positive-idf term
    assert(top(0L).head === "unique0")
    assert(top(1L).head === "unique1")
    // rank 1 beats rank 2 by score: unique0 (tf=2) outranks filler in doc 0
    val doc0 = Ranking.tfidfTerms(docs, 2)
      .as[(Long, String, Double, Int)].collect().filter(_._1 == 0L)
    assert(doc0.find(_._4 == 1).get._3 > doc0.find(_._4 == 2).get._3)
  }

  test("landed index: served scores equal recomputed scores") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val dir = tmpDir("bm25-index")
    Ranking.writeBm25Index(docs, dir)
    val terms = Seq("spark", "join", "window")
    def rounded(df: DataFrame): Map[Long, Double] = df
      .selectExpr("doc_id", "round(score, 6) AS s")
      .as[(Long, Double)].collect().toMap
    val served = rounded(Ranking.serveBm25(spark, dir, terms))
    val recomputed = rounded(Ranking.bm25(docs, terms))
    assert(served == recomputed && served.nonEmpty)
  }

  test("served query pushes the term filter into the postings scan") {
    val dir = tmpDir("bm25-pushdown")
    Ranking.writeBm25Index(
      graft.sources.Tables.documents(spark, sf), dir)
    val plan = Ranking.serveBm25(spark, dir, Seq("spark"))
      .queryExecution.executedPlan.toString
    // the postings files are term-sorted, so this pushed In-filter becomes
    // row-group skipping — the serve path never scans the whole index
    assert(plan.contains("PushedFilters: [In(term") ||
           plan.contains("PushedFilters: [IsNotNull(term"), plan)
  }

  test("q_bm25 is deterministic top-20 with positive scores") {
    val out = Ranking.qBm25(spark, sf).as[(Long, Double)].collect()
    assert(out.length <= 20 && out.nonEmpty)
    assert(out.forall(_._2 > 0))
    assert(out.sameElements(out.sortBy(r => (-r._2, r._1))))
  }
}
