package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.rolling_hash
import graft.sources.Tables

/** Text analysis over the `documents` table (north-star text ops,
  * SURVEY.md §2): tokenization, quality scoring, language ID, fingerprints.
  *
  * Everything except the fingerprint is built from codegen'd `functions._`
  * (no UDFs), so all of it runs as pure map-side work — no shuffle until the
  * final per-(lang/source) aggregate, which is partial-agg'd. At 100 TB the
  * whole module is scan-bound, which is the correct bound.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text — mirrors the oracle's
    * `string_split_regex(trim(text), '\s+')` exactly. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish sub-word count: tokens plus intra-word splits at
    * letter/digit and lower→upper boundaries — a cheap proxy for subword
    * tokenizer output with the same monotonicity (more text → more tokens).
    * Implemented as boundary-marking replaces (no lookarounds: DuckDB's RE2
    * oracle can't express them, and plain captures are codegen-cheaper). */
  def bpeishTokenCount(text: Column): Column = {
    val marked = regexp_replace(regexp_replace(regexp_replace(trim(text),
      "([a-z])([A-Z])", "$1 $2"),
      "([A-Za-z])([0-9])", "$1 $2"),
      "([0-9])([A-Za-z])", "$1 $2")
    size(split(marked, "\\s+"))
  }

  /** Small function-word marker lists per language — the n-gram/stopword
    * heuristic's profile set. Deliberately tiny and hand-auditable. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "with"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "pour"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "un", "una", "es", "para"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "von", "mit", "für"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "人", "这"))

  /** All-language stopword set (for the quality score's stopword ratio). */
  val stopwords: Seq[String] = markers.values.flatten.toSeq.distinct.sorted

  /** Per-document features: token count, char count, punctuation ratio,
    * stopword ratio, mean token length — the standard quality-filter
    * signals. All column arithmetic, oracle-parity-safe. */
  def withFeatures(docs: DataFrame): DataFrame = {
    val toks = col("_toks")   // materialized once, see withLangId
    val nTok = size(toks).cast("long")
    val nPunct = length(col("text")) -
      length(regexp_replace(col("text"), "[.,!?;:]", ""))
    val nStop = size(filter(toks,
      t => array_contains(lit(stopwords.toArray), t))).cast("long")
    docs
      .withColumn("_toks", tokens(col("text")))
      .withColumn("n_tokens", nTok)
      .withColumn("punct_ratio",
        round(nPunct.cast("double") / greatest(length(col("text")), lit(1)), 6))
      .withColumn("stopword_ratio",
        round(nStop.cast("double") / greatest(nTok, lit(1L)), 6))
      .withColumn("mean_token_len",
        round((length(col("text")) - nTok + 1).cast("double") /
          greatest(nTok, lit(1L)), 6))
      .drop("_toks")
  }

  /** Composite quality score in [0,1]: length in a sane band, some
    * stopwords, not punctuation-soup. Thresholds are ordinary lit()s so the
    * optimizer folds them. */
  def withQualityScore(featured: DataFrame): DataFrame =
    featured.withColumn("quality_score", round(
      (when(col("n_chars").between(50, 2000), 0.4).otherwise(0.0)) +
      (when(col("stopword_ratio") > 0.01, 0.3).otherwise(0.0)) +
      (when(col("punct_ratio") < 0.1, 0.3).otherwise(0.0)), 2))

  /** Language ID by marker-token voting: per-language hit count via
    * array_intersect (map-side only, no shuffle, no UDF); argmax via a
    * greatest() over (score, lang) structs — ties break to the
    * lexicographically larger lang, deterministically. */
  def withLangId(docs: DataFrame): DataFrame = {
    // Tokenize into its own projection: referencing one materialized column
    // five times beats inlining split(lower(...)) into all five language
    // scores (measured 4× on sf0.1 — the optimizer won't CSE across the
    // greatest() branches).
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(col("_toks"), lit(words.toArray))).as("score"),
        lit(lang).as("lang"))
    }
    docs.withColumn("_toks", tokens(lower(col("text"))))
      .withColumn("lang_pred", greatest(scored: _*).getField("lang"))
      .drop("_toks")
  }

  /** Order-sensitive 63-bit fingerprint (native RollingHash expression) plus
    * its md5 twin for oracle-checkable equality semantics. */
  def withFingerprints(docs: DataFrame): DataFrame =
    docs.withColumn("fingerprint", rolling_hash(col("text")))
        .withColumn("fingerprint_md5", md5(col("text")))

  // ---- driver queries ----

  /** q_text_stats — corpus stats per (lang, source). */
  def qStats(spark: SparkSession, sfDir: String): DataFrame =
    withFeatures(Tables.documents(spark, sfDir))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"),
        round(avg(col("mean_token_len")), 4).as("avg_token_len"))
      .orderBy(col("lang"), col("source"))

  /** q_text_quality — quality-signal rollup per language. */
  def qQuality(spark: SparkSession, sfDir: String): DataFrame =
    withQualityScore(withFeatures(Tables.documents(spark, sfDir)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("punct_ratio")), 6).as("avg_punct_ratio"),
        round(avg(col("stopword_ratio")), 6).as("avg_stopword_ratio"),
        sum(when(col("quality_score") >= 0.7, 1L).otherwise(0L)).as("n_good"))
      .orderBy(col("lang"))

  /** q_text_tokens — token-count accounting per source (whitespace +
    * BPE-ish), the budget query of a training-data pipeline. */
  def qTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"), size(tokens(col("text"))).cast("long").as("n_ws"),
        bpeishTokenCount(col("text")).cast("long").as("n_bpeish"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_ws")).as("ws_tokens"),
        sum(col("n_bpeish")).as("bpeish_tokens"))
      .orderBy(col("source"))

  /** q_text_langid — confusion counts of predicted vs labeled language,
    * hash-matched against a DuckDB oracle reconstructing the vote
    * exactly: `list_intersect` is the distinct-common-elements twin of
    * `array_intersect`, and the tie-to-lexicographically-larger-lang
    * argmax (greatest over (score, lang) structs) unrolls to a CASE
    * chain probing languages in DESCENDING name order with `>=`.
    * TextAnalysisSpec keeps the behavioral accuracy assertion. */
  def qLangId(spark: SparkSession, sfDir: String): DataFrame =
    withLangId(Tables.documents(spark, sfDir))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_pred"))

  /** q_text_fingerprint — fingerprint uniqueness accounting; md5 twin keeps
    * it oracle-checkable while the rolling hash is covered by equality with
    * distinct-text counts. */
  def qFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    withFingerprints(Tables.documents(spark, sfDir))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_text"),
        countDistinct(col("fingerprint")).as("n_distinct_fp"),
        countDistinct(col("fingerprint_md5")).as("n_distinct_md5"))

  /** PII/noise scrubbing patterns (emails, URLs, long digit runs) — chosen
    * inside the RE2 ∩ Java dialect so the DuckDB oracle matches. */
  private val scrubs: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "[0-9]{4,}" -> "<NUM>")

  /** Text with the scrub patterns applied in order. */
  def scrubbed(text: Column): Column =
    scrubs.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl) }

  /** q_text_scrub — redaction accounting per source: how many documents a
    * scrubbing pass touches and the net character delta. The redaction
    * itself is pure map-side regexp work (codegen'd, no UDF); a 100 TB
    * scrub is scan-bound, which is the right bound. */
  def qScrub(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"), col("text"), scrubbed(col("text")).as("red"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("red") =!= col("text"), 1L).otherwise(0L))
          .as("n_redacted"),
        sum((length(col("text")) - length(col("red"))).cast("long"))
          .as("chars_delta"))
      .orderBy(col("source"))

  /** Longest run of equal values in a sorted array = the multiset's top
    * element count, computed map-side with one aggregate() fold — no
    * explode, no per-(doc, shingle) shuffle. */
  private def maxRunLength(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** q_text_repetition — Gopher-style repetition signal: the most frequent
    * 3-gram's share of all 3-grams per document (multiset — duplicates are
    * the signal), rolled up per source with a >10% flag count. The per-doc
    * top count is [[maxRunLength]] over the doc's own sorted shingle array:
    * entirely map-side, so the only shuffle in the query is the final
    * per-source rollup (the explode → groupBy(doc, shingle) →
    * groupBy(doc) formulation shuffled every shingle occurrence twice).
    * Docs shorter than 3 tokens have no 3-grams and drop out (mirrored by
    * the oracle's len >= 3). */
  def qRepetition(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("source"),
        DedupOps.shingles(col("t"), 3).as("sh"))
      .select(col("source"),
        round(maxRunLength(array_sort(col("sh"))).cast("double") /
          size(col("sh")), 6).as("rep_ratio"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("rep_ratio")), 6).as("avg_rep_ratio"),
        sum(when(col("rep_ratio") > 0.1, 1L).otherwise(0L)).as("n_flagged"))
      .orderBy(col("source"))

  /** q_token_hist — token-length histogram in buckets of 32 (the
    * sequence-packing planner's input: how much of the corpus fits a
    * context window, and where padding waste concentrates). Map-side
    * bucketing + one tiny-group aggregate; scan-bound at any scale. */
  def qTokenHist(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select((floor(size(tokens(col("text"))) / lit(32.0)) * 32)
        .cast("long").as("bucket_lo"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("bucket_lo"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_token_hist" -> (qTokenHist _),
    "q_text_scrub" -> (qScrub _),
    "q_text_repetition" -> (qRepetition _),
    "q_text_stats" -> (qStats _),
    "q_text_quality" -> (qQuality _),
    "q_text_tokens" -> (qTokens _),
    "q_text_langid" -> (qLangId _),
    "q_text_fingerprint" -> (qFingerprint _))

  /** DuckDB list literal of [[stopwords]] — shared with the Curation
    * oracle so the two quality-score SQL twins can't drift. */
  private[ext] val stopwordsSqlList =
    stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** The langid oracle's SQL is GENERATED from [[markers]] (the
    * stopwordsSqlList discipline — the two vote definitions cannot
    * drift): one `list_intersect` score per language, and the
    * tie-to-larger-lang argmax as a CASE chain probing languages in
    * DESCENDING name order with `>=`. */
  private val langIdOracle: String = {
    val langs = markers.keys.toSeq.sorted
    val scores = langs.map { l =>
      val lst = markers(l).map(w => s"'$w'").mkString("[", ", ", "]")
      s"    len(list_intersect(toks, $lst)) AS s_$l"
    }.mkString(",\n")
    val desc = langs.reverse
    val caseChain = desc.init.zipWithIndex.map { case (l, i) =>
      val rest = desc.drop(i + 1)
      s"WHEN ${rest.map(r => s"s_$l >= s_$r").mkString(" AND ")} THEN '$l'"
    }.mkString("\n    ") + s"\n    ELSE '${desc.last}' END AS lang_pred"
    s"""WITH t AS (
       |  SELECT lang, string_split_regex(trim(lower(text)), '\\s+') AS toks
       |  FROM documents
       |), s AS (
       |  SELECT lang,
       |$scores
       |  FROM t
       |), p AS (
       |  SELECT lang, CASE
       |    $caseChain
       |  FROM s)
       |SELECT lang, lang_pred, COUNT(*) AS n
       |FROM p
       |GROUP BY lang, lang_pred
       |ORDER BY lang, lang_pred""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_text_langid" -> langIdOracle,
    "q_token_hist" ->
      """SELECT CAST(FLOOR(len(string_split_regex(trim(text), '\s+')) / 32.0)
        |    * 32 AS BIGINT) AS bucket_lo,
        |  COUNT(*) AS n_docs
        |FROM documents
        |GROUP BY 1
        |ORDER BY bucket_lo""".stripMargin,
    "q_text_scrub" ->
      """WITH red AS (
        |  SELECT source, text,
        |    regexp_replace(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      'https?://[^\s]+', '<URL>', 'g'),
        |      '[0-9]{4,}', '<NUM>', 'g') AS r
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN r <> text THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_redacted,
        |  CAST(SUM(length(text) - length(r)) AS BIGINT) AS chars_delta
        |FROM red GROUP BY source ORDER BY source""".stripMargin,
    "q_text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(range(1, len(t) - 3 + 2),
        |      i -> array_to_string(t[i:i+2], ' '))) AS s
        |  FROM toks WHERE len(t) >= 3),
        |cnt AS (
        |  SELECT doc_id, source, s, COUNT(*) AS c
        |  FROM sh GROUP BY 1, 2, 3),
        |per_doc AS (
        |  SELECT doc_id, source,
        |    ROUND(MAX(c) / SUM(c), 6) AS rep_ratio
        |  FROM cnt GROUP BY 1, 2)
        |SELECT source, COUNT(*) AS n_docs,
        |  ROUND(AVG(rep_ratio), 6) AS avg_rep_ratio,
        |  CAST(SUM(CASE WHEN rep_ratio > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged
        |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,
    "q_text_stats" ->
      s"""SELECT lang, source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  ROUND(AVG(n_tokens), 4) AS avg_tokens,
         |  ROUND(AVG(mean_token_len), 4) AS avg_token_len
         |FROM (
         |  SELECT lang, source, n_chars,
         |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         |    ROUND((length(text) - len(string_split_regex(trim(text), '\\s+')) + 1)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6)
         |      AS mean_token_len
         |  FROM documents) t
         |GROUP BY lang, source
         |ORDER BY lang, source""".stripMargin,
    "q_text_quality" ->
      s"""WITH feat AS (
         |  SELECT lang, n_chars,
         |    ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
         |      / greatest(length(text), 1), 6) AS punct_ratio,
         |    ROUND(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        x -> list_contains($stopwordsSqlList, x)))
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6)
         |      AS stopword_ratio
         |  FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         |  ROUND(AVG(punct_ratio), 6) AS avg_punct_ratio,
         |  ROUND(AVG(stopword_ratio), 6) AS avg_stopword_ratio,
         |  CAST(SUM(CASE WHEN
         |    ROUND((CASE WHEN n_chars BETWEEN 50 AND 2000 THEN 0.4 ELSE 0.0 END)
         |    + (CASE WHEN stopword_ratio > 0.01 THEN 0.3 ELSE 0.0 END)
         |    + (CASE WHEN punct_ratio < 0.1 THEN 0.3 ELSE 0.0 END), 2) >= 0.7
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_good
         |FROM feat
         |GROUP BY lang
         |ORDER BY lang""".stripMargin,
    "q_text_tokens" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |    AS ws_tokens,
        |  CAST(SUM(len(string_split_regex(
        |    regexp_replace(regexp_replace(regexp_replace(trim(text),
        |      '([a-z])([A-Z])', '\1 \2', 'g'),
        |      '([A-Za-z])([0-9])', '\1 \2', 'g'),
        |      '([0-9])([A-Za-z])', '\1 \2', 'g'), '\s+')))
        |    AS BIGINT) AS bpeish_tokens
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT COUNT(*) AS n_docs,
        |  COUNT(DISTINCT text) AS n_distinct_text,
        |  COUNT(DISTINCT text) AS n_distinct_fp,
        |  COUNT(DISTINCT md5(text)) AS n_distinct_md5
        |FROM documents""".stripMargin)
}
