package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Keyword relevance ranking over the `documents` table: BM25, the standard
  * lexical retrieval score (Robertson & Zaragoza, "The Probabilistic
  * Relevance Framework: BM25 and Beyond") — the retrieval half of a
  * training-data pipeline's targeted-subset selection ("pull every document
  * about X").
  *
  * Scale design: the query's term set is a literal handful, so the term
  * filter runs map-side BEFORE any shuffle — of a 100 TB corpus, only rows
  * containing a query term enter the (doc_id, term) aggregate, and the
  * per-doc length rides along in that same aggregate (max of a per-doc
  * constant) instead of joining a second scan of the corpus. Corpus size
  * and average length are one scalar row (broadcast), per-term document
  * frequencies aggregate from the checkpointed postings and broadcast
  * (|terms| rows). Total: TWO corpus scans — the tokenize+explode pass
  * that materializes the (bounded) matching postings, and the text-only
  * pass for the corpus-wide count/avgdl, which cannot derive from the
  * term-filtered side — plus one tiny per-doc sum.
  */
object Ranking {

  /** BM25 scores for `terms` over a (doc_id, text) corpus: one row per
    * document containing at least one query term, with the summed per-term
    * score. k1 tempers term-frequency saturation, b the length
    * normalization (textbook defaults 1.2 / 0.75). */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: empty query")
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("t"))
    // corpus stats: one row — joins below as a broadcast nested loop
    val stats = toks.agg(count(lit(1)).as("n"),
      avg(size(col("t"))).as("avgdl"))
    // query-term postings: the isin filter drops every non-query token
    // map-side, so the groupBy shuffles only matching (doc, term) rows;
    // dl is constant per doc and rides the same aggregate (no second scan)
    val tf = toks
      .select(col("doc_id"), size(col("t")).as("dl"),
        explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // tf feeds two consumers (df and the scoring join) and AQE cannot
    // stage-reuse the re-aliased aggregate branch, so without
    // materialization the corpus tokenize+explode runs twice. The three
    // candidate fixes each fail differently at scale: recompute = a second
    // corpus scan; persist = one CacheManager entry PER query-term set for
    // the session (unbounded across a retrieval workload); a by-term
    // count window = at most |terms| reducers sorting ALL postings of a
    // common term in one task (fine in tfidfTerms where terms are the
    // whole vocabulary, broken for a literal handful). localCheckpoint is
    // the fit: eager one-time materialization of the bounded matching
    // postings, no cache-registry entry, storage freed when the plan is
    // GC'd. Consequence: bm25() triggers its corpus scan at CALL time.
    val tfm = tf.localCheckpoint()
    val df = tfm.groupBy(col("term")).agg(count(lit(1)).as("df"))
    scoreBm25(tfm, df, stats, k1, b)
  }

  /** The BM25 arithmetic over prepared inputs: postings (doc_id, term,
    * tf, dl), per-term document frequencies, and the one-row corpus stats
    * (n, avgdl). Shared by the recompute path ([[bm25]]) and the landed-
    * artifact path ([[serveBm25]]) so the two can never drift. */
  private def scoreBm25(tf: DataFrame, df: DataFrame, stats: DataFrame,
                        k1: Double, b: Double): DataFrame = {
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) *
      (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (idf * col("tf") * lit(k1 + 1) / norm).as("term_score"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"))
  }

  /** Land the full-corpus retrieval index as a queryable artifact (the
    * "land it, then query it" treatment [[graft.ext.SimilarityIvf]] gives
    * vectors, applied to lexical retrieval): postings range-partitioned
    * and SORTED by term — so a term lookup is parquet row-group skipping
    * on min/max stats, not a corpus scan — plus the vocabulary's document
    * frequencies and the one-row corpus stats. Two corpus scans at build
    * time (stats + postings); df derives from the LANDED postings, never
    * a third scan. Serving touches the corpus zero times. */
  def writeBm25Index(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("t"))
    toks.agg(count(lit(1)).as("n"), avg(size(col("t"))).as("avgdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    toks
      .select(col("doc_id"), size(col("t")).as("dl"),
        explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .repartitionByRange(col("term"))
      .sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$dir/postings")
    spark.read.parquet(s"$dir/postings")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/df")
  }

  /** Serve BM25 from a landed index: the term filter pushes into the
    * postings scan (term-sorted files → row-group skipping), so a query
    * reads a handful of row groups out of a corpus-sized index. */
  def serveBm25(spark: SparkSession, dir: String, terms: Seq[String],
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "serveBm25: empty query")
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("term").isin(terms: _*))
    val df = spark.read.parquet(s"$dir/df")
      .filter(col("term").isin(terms: _*))
    val stats = spark.read.parquet(s"$dir/stats")
    scoreBm25(postings, df, stats, k1, b)
  }

  /** q_bm25 — top-20 documents for a three-term query, deterministic order
    * (rounded score desc, then doc_id). */
  def qBm25(spark: SparkSession, sfDir: String): DataFrame =
    bm25(Tables.documents(spark, sfDir), Seq("spark", "join", "window"))
      .select(col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)

  /** TF-IDF keyword extraction: top-`topK` terms per document by
    * tf·ln(N/df), ties broken by term. This is the whole-corpus variant
    * (keyword-tag every document): one explode shuffle builds the (doc,
    * term) tf index, document frequencies aggregate from it (vocabulary-
    * sized), and the per-doc ranking window partitions on doc_id — maximal
    * parallelism at any corpus size. Callers selecting a doc subset can
    * filter the RESULT: the window is per-doc independent and Catalyst
    * pushes partition-key filters below it. */
  def tfidfTerms(docs: DataFrame, topK: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("t"))
    // column-less count: reads parquet footers only, not data
    val n = toks.agg(count(lit(1)).as("n"))
    val tf = toks
      .select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df as a window over tf (tf has one row per containing doc), NOT a
    // separate aggregate joined back: AQE can't stage-reuse the re-aliased
    // aggregate branch, so the join formulation would execute the whole
    // corpus-scale tf subtree twice — and persisting corpus-scale tf is
    // not an option at 100 TB. The window pays the same by-term shuffle
    // the join would, once.
    val df = count(lit(1)).over(Window.partitionBy(col("term")))
    val score = col("tf") * log(col("n") / col("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(score.desc, col("term"))
    tf.withColumn("df", df)
      .crossJoin(broadcast(n))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("term"),
        round(score, 6).as("score"), col("rnk"))
  }

  /** q_tfidf_terms — top-3 keywords for the first ten documents (df/N from
    * the whole corpus, as keyword extraction requires). */
  def qTfidf(spark: SparkSession, sfDir: String): DataFrame =
    tfidfTerms(Tables.documents(spark, sfDir), topK = 3)
      .filter(col("doc_id") < 10)
      .orderBy(col("doc_id"), col("rnk"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25" -> (qBm25 _),
    "q_tfidf_terms" -> (qTfidf _))

  val oracles: Map[String, String] = Map(
    "q_tfidf_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(t) AS term FROM toks) u
        |  GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n FROM toks),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    tf.tf * ln(n.n / df.df) AS score,
        |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * ln(n.n / df.df) DESC, tf.term) AS rnk
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, ROUND(score, 6) AS score, rnk
        |FROM scored
        |WHERE doc_id < 10 AND rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |dl AS (SELECT doc_id, len(t) AS dl FROM toks),
        |stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(t) AS term FROM toks) u
        |  WHERE term IN ('spark', 'join', 'window')
        |  GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id,
        |    SUM(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) *
        |        tf.tf * (1.2 + 1) /
        |        (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
        |  FROM tf
        |  JOIN df USING (term)
        |  JOIN dl USING (doc_id)
        |  CROSS JOIN stats s
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, ROUND(score, 4) AS score FROM scored
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin)
}
