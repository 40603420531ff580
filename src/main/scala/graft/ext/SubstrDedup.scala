package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Exact-substring duplication accounting — the ExactSubstr signal of Lee
  * et al., "Deduplicating Training Data Makes Language Models Better"
  * (arXiv:2107.06499): a span repeated VERBATIM anywhere else in the
  * corpus is memorization fuel even when the containing documents are
  * globally dissimilar. The paper finds repeats with a corpus-wide suffix
  * array; the Spark-native form slides a fixed token window (stride 1)
  * over every document and marks each window whose exact text occurred at
  * a smaller (doc_id, pos) site — per-document repeat counts then drive
  * span-trimming or doc-dropping policy. Distinct from [[LineDedup]]
  * (non-overlapping segments, keep-first reassembly) and from
  * [[DedupOps]]' shingle Jaccard (whole-document similarity): this scores
  * verbatim SPAN overlap at every offset.
  *
  * Scale shape: windows are hashed to 64 bits map-side (xxhash64 — the
  * window text never shuffles; at stride 1 the text expansion would be
  * window_size× the corpus). The first-occurrence winner is the same
  * de-skewed min(struct(doc_id, pos)) partial aggregate as [[LineDedup]] —
  * a boilerplate window with 10⁸ occurrences reaches the reducer as one
  * candidate per map task — and the keep-marking join-back is
  * AQE-skew-splittable. Collision odds on 64-bit hashes (~1e-8 at 10⁶
  * distinct windows) are the [[DedupOps.jaccardPairs]] precedent: the
  * oracle groups by exact window text and still hash-matches.
  */
object SubstrDedup {

  /** array<bigint> of xxhash64 fingerprints of every `size`-token window
    * at stride 1 (positions 0..len−size); empty below `size` tokens. */
  def windowHashes(tokens: Column, size: Int): Column = {
    require(size > 0, s"need size > 0: $size")
    when(org.apache.spark.sql.functions.size(tokens) >= size,
      transform(
        sequence(lit(0L),
          (org.apache.spark.sql.functions.size(tokens) - size).cast("long")),
        i => xxhash64(concat_ws(" ",
          slice(tokens, (i + 1L).cast("int"), lit(size))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** One row per (doc_id, pos, wh) window occurrence with `keep` = true
    * iff it is the corpus-wide first (min (doc_id, pos)) of its window. */
  def markFirstWindows(docs: DataFrame, windows: Column): DataFrame = {
    val occ = docs
      .select(col("doc_id"), posexplode(windows).as(Seq("pos", "wh")))
    val firstSite = occ
      .groupBy(col("wh"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first_site"))
    occ
      // merge: firstSite is O(distinct windows) — unbounded, and its
      // explode-derived estimate undershoots (see jaccardPairs)
      .join(firstSite.hint("merge"), Seq("wh"))
      .withColumn("keep",
        struct(col("doc_id"), col("pos")) === col("first_site"))
      .select(col("doc_id"), col("pos"), col("wh"), col("keep"))
  }

  /** Per-document repeat accounting over ALL documents (windowless docs
    * report zeros): (doc_id, n_windows, n_dup) where n_dup counts the
    * windows already seen at a smaller site. */
  def repeatSummary(docs: DataFrame, marked: DataFrame): DataFrame = {
    val agg = marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        count(when(!col("keep"), lit(1))).as("n_dup"))
    docs.select(col("doc_id"))
      .join(agg.hint("merge"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
  }

  /** q_substr_dedup — verbatim 16-token-window repeat accounting over the
    * documents corpus (NULL text total via coalesce, the [[LineDedup]]
    * contract). */
  def qSubstrDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = TextAnalysis.tokens(coalesce(col("text"), lit("")))
    repeatSummary(docs,
        markFirstWindows(docs, windowHashes(toks, size = 16)))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_substr_dedup" -> (qSubstrDedup _))

  /** DuckDB twin on exact window TEXT (the engine side groups by the
    * 64-bit hash — same grouping up to ~1e-8 collision odds): identical
    * tokenization, window geometry (1-based inclusive slice of 16), and
    * first-site rule. */
  val oracles: Map[String, String] = Map(
    "q_substr_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS t
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |         array_to_string(
        |           t[CAST(i + 1 AS BIGINT):CAST(i + 16 AS BIGINT)], ' ') AS win
        |  FROM toks,
        |       UNNEST(generate_series(0, len(t) - 16)) AS g(i)
        |  WHERE len(t) >= 16),
        |m AS (
        |  SELECT doc_id, pos,
        |         row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) = 1
        |           AS keep
        |  FROM w),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_windows,
        |         COUNT(*) FILTER (WHERE NOT keep) AS n_dup
        |  FROM m GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CAST(coalesce(a.n_windows, 0) AS BIGINT) AS n_windows,
        |       CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)
}
