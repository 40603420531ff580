package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("language ID votes correctly on real-language fixtures") {
    val docs = Seq(
      ("en", "the cat sat on the mat and it is happy with the sun"),
      ("fr", "le chat est sur le tapis et il est content pour la vie"),
      ("es", "el gato es feliz y la casa es grande para los amigos"),
      ("de", "der Hund ist ein Freund und die Katze ist mit der Familie"),
      ("zh", "我 是 人 的 朋友 这 是 好 的 不 了")
    ).toDF("lang", "text")
    val pred = TextAnalysis.withLangId(docs).select("lang", "lang_pred")
      .collect()
    pred.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"expected ${r.getString(0)}, predicted ${r.getString(1)}")
    }
  }

  test("features: hand-checked token/punct/stopword arithmetic") {
    val df = Seq((1L, "the cat, the dog!", 17L)).toDF("doc_id", "text", "n_chars")
    val row = TextAnalysis.withFeatures(df).collect().head
    assert(row.getAs[Long]("n_tokens") == 4L)
    // 2 punct chars / 17 chars
    assert(math.abs(row.getAs[Double]("punct_ratio") - 2.0 / 17) < 1e-6)
    // "the" twice / 4 tokens ("cat," with comma doesn't match)
    assert(math.abs(row.getAs[Double]("stopword_ratio") - 0.5) < 1e-6)
  }

  test("quality score is monotone: clean text above punctuation soup") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is fine " * 2, 120L),
      (2L, "!!! ??? ;;; ::: ,,, ...", 23L)
    ).toDF("doc_id", "text", "n_chars")
    val scores = TextAnalysis.withQualityScore(TextAnalysis.withFeatures(df))
      .orderBy("doc_id").select("quality_score").as[Double].collect()
    assert(scores(0) > scores(1))
    assert(scores(0) >= 0.7)
  }

  test("rolling_hash fingerprint: deterministic, order-sensitive, distinct") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.withFingerprints(df)
      .select("fingerprint").as[Long].collect()
    assert(fps(0) == fps(1))   // same text → same fingerprint
    assert(fps(0) != fps(2))   // reordered text → different fingerprint
    assert(fps.forall(_ >= 0)) // sign bit cleared
  }

  test("scrubber redacts emails, urls, and long digit runs; leaves clean text alone") {
    import spark.implicits._
    val got = Seq(
      "contact bob@example.com or see https://example.com/a?b=1 ref 123456",
      "short 123 stays, clean text untouched")
      .toDF("text")
      .select(TextAnalysis.scrubbed(org.apache.spark.sql.functions.col("text")))
      .as[String].collect()
    assert(got(0) == "contact <EMAIL> or see <URL> ref <NUM>", got(0))
    assert(got(1) == "short 123 stays, clean text untouched", got(1))
  }

  test("bpeish count splits case and digit boundaries") {
    val df = Seq(Tuple1("camelCase and v2Model x9")).toDF("text")
    val n = df.select(TextAnalysis.bpeishTokenCount(col("text")).as("n"))
      .as[Int].collect().head
    // camel|Case and v|2|Model x|9 → 8
    assert(n == 8, s"got $n")
  }
}
