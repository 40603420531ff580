package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-wide line-level deduplication — the C4/CCNet preprocessing step
  * that removes boilerplate repeated ACROSS documents (nav bars, license
  * headers, cookie banners) while keeping each line's first occurrence:
  * every line that appears anywhere in the corpus survives exactly once,
  * at its smallest (doc_id, line_id) site, and each document is
  * reassembled from its surviving lines in original order.
  *
  * The reference engine has no text operators at all (its 228-line
  * pipeline lands flat weather rows — /root/reference/airflow/dags/
  * weather_etl.py); this is north-star training-pipeline surface.
  *
  * Scale shape: the first-occurrence winner is a
  * `groupBy(line).agg(min(struct(doc_id, line_id)))` — an algebraic
  * aggregate that PARTIAL-aggregates map-side, so a boilerplate line with
  * 10⁸ occurrences reaches the reducer as one candidate row per upstream
  * partition instead of 10⁸ rows sorted on one reducer (the failure mode
  * of the row_number-over-line window this replaced). Keeps are then
  * marked by joining the (one-row-per-distinct-line) winner table back to
  * the occurrences; the join still hashes on the skewed line key, but
  * join skew is AQE-splittable (spark.sql.adaptive.skewJoin) while window
  * skew is not — and the winner side carries exactly one row per heavy
  * key. Partitioning by the exact text instead of a 64-bit hash means a
  * hash collision can never silently delete a distinct line (the text
  * travels through the shuffle anyway, because reassembly needs it).
  * Reassembly is one groupBy(doc_id) whose state per group is the
  * surviving lines of ONE document — bounded by document length, not
  * corpus size. No self-join, no O(n²) pair step: cost is linear in total
  * line count at any corpus size.
  *
  * The synthetic corpus has no newlines or sentence punctuation, so the
  * driver query segments text into fixed 8-token lines (stride = size via
  * [[tokenSegments]]); on a real corpus the caller passes
  * `split(text, "\n")` or a sentence splitter — the dedup core is
  * segmentation-agnostic.
  */
object LineDedup {

  /** Per-document array<string> of "lines": non-overlapping `size`-token
    * segments joined by single spaces. Mirrors [[Chunking.nChunks]] with
    * stride = size (ceil(len/size) segments, min 1), as a single map-side
    * expression — no explode/regroup round trip. */
  def tokenSegments(tokens: Column, size: Int): Column = {
    require(size > 0, s"need size > 0: $size")
    val n = Chunking.nChunks(
      coalesce(org.apache.spark.sql.functions.size(tokens), lit(0)), size, size)
    transform(sequence(lit(0L), n - 1L),
      i => concat_ws(" ", slice(tokens, (i * size + 1L).cast("int"), lit(size))))
  }

  /** One row per (doc_id, line_id, line) with `keep` = true iff this
    * occurrence is the corpus-wide first (min (doc_id, line_id)) of its
    * line text. `lines` must be an array<string> column; line_id is the
    * 0-based position within the document.
    *
    * The winner is computed as an algebraic min over the (doc_id, line_id)
    * struct (lexicographic — identical ordering to the row_number
    * formulation) so each map task emits ONE candidate per distinct line
    * before the shuffle; see the scale note in the class doc. */
  def markFirstOccurrences(docs: DataFrame, lines: Column): DataFrame = {
    val occ = docs
      .select(col("doc_id"), posexplode(lines).as(Seq("line_id", "line")))
    val firstSite = occ
      .groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("line_id"))).as("first_site"))
    occ
      // merge: firstSite is O(distinct lines) — unbounded, and its
      // explode-derived estimate undershoots (see jaccardPairs)
      .join(firstSite.hint("merge"), Seq("line"))
      .withColumn("keep",
        struct(col("doc_id"), col("line_id")) === col("first_site"))
      .select(col("doc_id"), col("line_id"), col("line"), col("keep"))
  }

  /** Reassemble per-document survivors: (doc_id, n_lines, n_kept,
    * kept_md5) where kept_md5 fingerprints the surviving lines joined in
    * original order — comparing content, not just counts. collect_list
    * drops the nulls the when() leaves for removed lines; array_sort on
    * the (line_id, line) struct restores document order. */
  def dedupSummary(marked: DataFrame): DataFrame =
    marked
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("keep"), lit(1))).as("n_kept"),
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("line_id"), col("line"))))),
            s => s.getField("line")))).as("kept_md5"))

  /** q_line_dedup — corpus-wide first-occurrence line dedup over the
    * documents table, "lines" = non-overlapping 8-token segments. NULL
    * text coalesces to '' BEFORE tokenization (mirrored in the oracle's
    * toks CTE) so the operator is total over nullable input — without it
    * Spark yields one empty line while DuckDB propagates NULL. */
  def qLineDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    dedupSummary(markFirstOccurrences(docs,
        tokenSegments(TextAnalysis.tokens(coalesce(col("text"), lit(""))),
          size = 8)))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_line_dedup" -> (qLineDedup _))

  /** DuckDB twin: same tokenization (`string_split_regex(trim(text),
    * '\s+')` — the TextAnalysis.tokens contract), same segment geometry
    * (1-based inclusive list slice t[i*8+1 : i*8+8]), same winner rule.
    * md5 coalesces the all-removed case to '' to match Spark's concat_ws
    * over an empty array. */
  val oracles: Map[String, String] = Map(
    "q_line_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS t
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS line_id,
        |         array_to_string(t[CAST(i*8+1 AS BIGINT):CAST(i*8+8 AS BIGINT)], ' ') AS line
        |  FROM toks,
        |       UNNEST(generate_series(0,
        |         greatest(CAST(ceil(len(t)/8.0) AS BIGINT), 1) - 1)) AS g(i)),
        |marked AS (
        |  SELECT doc_id, line_id, line,
        |         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_id) = 1 AS keep
        |  FROM occ)
        |SELECT doc_id,
        |       count(*) AS n_lines,
        |       count(*) FILTER (WHERE keep) AS n_kept,
        |       md5(coalesce(
        |         string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY line_id),
        |         '')) AS kept_md5
        |FROM marked
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin)
}
