package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Character n-gram language-model quality scoring — the CCNet recipe
  * (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  * from Web Crawl Data", arXiv:1911.00359): score every document by its
  * cross-entropy under a language model and filter the tail. CCNet uses a
  * KenLM 5-gram model; this is the dependency-free form — a char-TRIGRAM
  * unigram model trained on the corpus itself — which keeps the exact
  * pipeline shape (train → broadcast model → map-side score) while staying
  * DuckDB-oracle-expressible. The reference engine has no text surface at
  * all (228-line weather pipeline — /root/reference/airflow/dags/
  * weather_etl.py); this is north-star training-pipeline surface.
  *
  * Scale shape: the MODEL is bounded by the trigram space (≤ |alphabet|³,
  * tens of thousands of rows in practice) — classic bounded model state,
  * broadcast to the scoring join so document counts never shuffle on the
  * (skewed) trigram key. Training and scoring are each one corpus scan;
  * the composed q_ngram_perplexity pays both by design (oracle parity —
  * a production pipeline trains once, lands the (trigram, count) table as
  * parquet, and scoring is a single scan + broadcast join thereafter).
  */
object LangModel {

  /** array<string> of a text column's character trigrams (positions
    * 1..len-2). Guarded to the empty array below 3 chars — Spark's
    * `sequence(1, 0)` would DESCEND, not empty out. */
  def charTrigrams(textCol: String): org.apache.spark.sql.Column =
    when(char_length(col(textCol)) >= 3,
      expr(s"transform(sequence(1, char_length($textCol) - 2), " +
        s"i -> substring($textCol, i, 3))"))
      .otherwise(array().cast("array<string>"))

  /** Per-(doc, trigram) counts — the shared substrate of training and
    * scoring (train aggregates it by trigram; scoring joins it to the
    * model). One corpus scan each time it is evaluated. */
  def docTrigramCounts(docs: DataFrame): DataFrame =
    docs.filter(char_length(col("text")) >= 3)
      .select(col("doc_id"), explode(charTrigrams("text")).as("tri"))
      // semantically a no-op (a substring of non-null text is never
      // null), but load-bearing for plan reuse: the scoring join infers
      // `isnotnull(tri)` on ITS copy of this subtree, and without the
      // same filter on the train/total copies their exchanges
      // canonicalize differently — AQE stage reuse then re-ran the full
      // tokenize→explode→aggregate corpus pass once PER CONSUMER
      // (measured: q_ngram_perplexity paid it twice more at sf0.1).
      // With the filter aligned, all three consumers read ONE shuffle.
      .filter(col("tri").isNotNull)
      .groupBy(col("doc_id"), col("tri"))
      .agg(count(lit(1)).as("c"))

  /** The trained model: (tri, ct) corpus-wide counts. Bounded by the
    * trigram space — parquet-able, broadcast-able. */
  def train(docs: DataFrame): DataFrame =
    docTrigramCounts(docs).groupBy(col("tri")).agg(sum(col("c")).as("ct"))

  /** Cross-entropy of each document under the model:
    * ce = ln(total) − Σ c·ln(ct) / Σ c  (mean negative log-probability of
    * the document's trigrams under the unigram trigram LM). Every corpus
    * trigram is in a corpus-trained model, so no smoothing term is needed;
    * documents shorter than 3 chars have no trigrams and no row. */
  def crossEntropy(docTri: DataFrame, model: DataFrame): DataFrame = {
    val total = model.agg(sum(col("ct")).as("total"))
    docTri.join(broadcast(model), "tri")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tris"),
        (log(max(col("total"))) -
          sum(col("c") * log(col("ct"))) / sum(col("c"))).as("ce"))
  }

  /** q_ngram_perplexity — the 20 most-surprising documents (highest
    * cross-entropy = the quality-filter tail CCNet drops), deterministic
    * on the rounded score then doc_id. */
  def qNgramPerplexity(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val docTri = docTrigramCounts(docs)
    crossEntropy(docTri, train(docs))
      .select(col("doc_id"), col("n_tris"), round(col("ce"), 4).as("ce"))
      .orderBy(col("ce").desc, col("doc_id"))
      .limit(20)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ngram_perplexity" -> (qNgramPerplexity _))

  /** DuckDB twin: identical trigram extraction (1-based substr, len−2
    * positions), identical model and cross-entropy arithmetic in doubles. */
  val oracles: Map[String, String] = Map(
    "q_ngram_perplexity" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents WHERE len(text) >= 3),
        |occ AS (
        |  SELECT doc_id, substr(text, CAST(i AS INT), 3) AS tri
        |  FROM d, UNNEST(generate_series(1, len(text) - 2)) AS g(i)),
        |dt AS (SELECT doc_id, tri, COUNT(*) AS c FROM occ GROUP BY 1, 2),
        |model AS (SELECT tri, SUM(c) AS ct FROM dt GROUP BY tri),
        |tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS total FROM model)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tris,
        |       ROUND(ln((SELECT total FROM tot))
        |             - SUM(c * ln(CAST(ct AS DOUBLE))) / SUM(c), 4) AS ce
        |FROM dt JOIN model USING (tri)
        |GROUP BY doc_id
        |ORDER BY ce DESC, doc_id
        |LIMIT 20""".stripMargin)
}
