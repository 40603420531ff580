package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dataset-assembly operators: deterministic train/val/test splitting and
  * quality binning — the last mile of a training-data pipeline (the
  * reference engine has no sampling/split surface at all; its whole output
  * is one appended row per run, /root/reference/airflow/dags/weather_etl.py).
  *
  * Both operators are pure map-side column arithmetic (no shuffle until the
  * final bounded rollup), which is the 100 TB requirement for assignment
  * passes: every doc's split/bin must be computable from the row alone —
  * no global sort, no stored assignment table, no RNG state.
  *
  *  - Split assignment hashes the STABLE KEY (doc_id), not a random(): the
  *    same document lands in the same split on every rerun, on every
  *    engine, after any repartition — the property that keeps eval sets
  *    uncontaminated across pipeline re-runs (a `rand()` split re-deals the
  *    deck every execution and silently leaks val docs into train).
  *  - Quality bins use FIXED score thresholds, not ntile: an ntile over the
  *    corpus is a global sort (single-reducer on the skewed middle at
  *    100 TB) and its assignment changes whenever any other row changes.
  *    Fixed-width bins of a bounded score are stable, embarrassingly
  *    parallel, and what curriculum schedules actually key on.
  */
object Splits {

  /** Hex md5 prefix of the key: 2 hex chars = 256 deterministic buckets,
    * identically computable by any engine with md5 (the portability that
    * makes the oracle a byte-for-byte hash match). */
  private def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** Split fractions in 1/256ths: [0, trainHi) train, [trainHi, valHi)
    * val, [valHi, 256) test. Defaults ≈ 80/10/10. */
  def assignSplit(df: DataFrame, keyCol: String,
                  trainHi: Int = 205, valHi: Int = 230): DataFrame = {
    require(0 < trainHi && trainHi < valHi && valHi <= 256,
      s"need 0 < trainHi < valHi <= 256, got ($trainHi, $valHi)")
    val b = conv(hashBucket(col(keyCol)), 16, 10).cast("int")
    df.withColumn("split",
      when(b < trainHi, "train").when(b < valHi, "val").otherwise("test"))
  }

  /** Bounded quality score ([[TextAnalysis.withQualityScore]], in [0, 1])
    * → fixed decile bin 0–9 (score 1.0 folds into bin 9). */
  def qualityBin(score: Column): Column =
    least(floor(score * 10).cast("int"), lit(9))

  // ---- driver queries ----

  /** q_split — split-assignment accounting: per split, doc count, char
    * mass, and language spread. The md5-derived assignment is recomputed
    * verbatim by the oracle, so a hash match proves rerun-stability across
    * engines — the whole point of hash splitting. */
  def qSplit(spark: SparkSession, sfDir: String): DataFrame =
    assignSplit(Tables.documents(spark, sfDir), "doc_id")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))

  /** q_quality_bins — curriculum histogram: documents per fixed quality
    * bin with per-bin char mass and mean stopword ratio. Composes the
    * oracled quality-score pipeline with the bin assignment; one bounded
    * (≤10-row) aggregate after pure map-side scoring. */
  def qQualityBins(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.withQualityScore(
        TextAnalysis.withFeatures(Tables.documents(spark, sfDir)))
      .withColumn("bin", qualityBin(col("quality_score")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        round(avg(col("stopword_ratio")), 6).as("avg_stopword_ratio"))
      .orderBy(col("bin"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split" -> (qSplit _),
    "q_quality_bins" -> (qQualityBins _))

  val oracles: Map[String, String] = Map(
    // the split rule re-derived from scratch: md5 hex prefix → 0..255 →
    // threshold cases, identical to assignSplit's constants
    "q_split" ->
      """SELECT split, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  COUNT(DISTINCT lang) AS n_langs
        |FROM (
        |  SELECT CASE
        |      WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
        |           AS INT) < 205 THEN 'train'
        |      WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
        |           AS INT) < 230 THEN 'val'
        |      ELSE 'test' END AS split,
        |    n_chars, lang
        |  FROM documents) t
        |GROUP BY split
        |ORDER BY split""".stripMargin,
    "q_quality_bins" ->
      s"""WITH feat AS (
         |  SELECT n_chars,
         |    ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
         |      / greatest(length(text), 1), 6) AS punct_ratio,
         |    ROUND(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        x -> list_contains(${TextAnalysis.stopwordsSqlList}, x)))
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6)
         |      AS stopword_ratio
         |  FROM documents),
         |scored AS (
         |  SELECT n_chars, stopword_ratio,
         |    ROUND((CASE WHEN n_chars BETWEEN 50 AND 2000 THEN 0.4 ELSE 0.0 END)
         |    + (CASE WHEN stopword_ratio > 0.01 THEN 0.3 ELSE 0.0 END)
         |    + (CASE WHEN punct_ratio < 0.1 THEN 0.3 ELSE 0.0 END), 2) AS q
         |  FROM feat)
         |SELECT CAST(LEAST(FLOOR(q * 10), 9) AS INT) AS bin,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  ROUND(AVG(stopword_ratio), 6) AS avg_stopword_ratio
         |FROM scored
         |GROUP BY bin
         |ORDER BY bin""".stripMargin)
}
