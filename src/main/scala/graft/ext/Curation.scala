package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** End-to-end corpus-curation accounting: the funnel that every
  * training-data pipeline reports — how many documents survive quality
  * filtering, then near-duplicate removal, then benchmark decontamination.
  * This composes the standalone operators ([[TextAnalysis]] quality score,
  * [[DedupOps]] jaccard pairs + eval-shingle overlap) into the one query a
  * pipeline owner actually looks at before a training run.
  *
  * Scale shape: three flag computations over one corpus scan family —
  * quality is pure map-side column arithmetic; the near-dup flag reuses the
  * inverted-index pair generation (bounded by maxDf in production); the
  * contamination flag is a broadcast membership join against the tiny eval
  * shingle set. The funnel itself is one small per-source aggregate of
  * boolean flags. Nothing here shuffles document text.
  */
object Curation {

  /** Per-document survival flags over `docs`: quality (composite score ≥
    * 0.7), near-dup (has a SMALLER doc at 3-gram Jaccard ≥ `threshold` —
    * the greedy pairwise drop rule; [[DedupCluster.clusterDuplicates]] is
    * the cluster-exact variant), contaminated (shares ≥1 3-gram with
    * `evalDocs`). Flags are computed independently; the funnel is their
    * progressive intersection. */
  def survivalFlags(docs: DataFrame, evalDocs: DataFrame,
                    maxDf: Option[Int] = Some(DedupOps.DefaultMaxDf),
                    threshold: Double = 0.5): DataFrame = {
    val quality =
      TextAnalysis.withQualityScore(TextAnalysis.withFeatures(docs))
        .select(col("doc_id"), col("source"),
          (col("quality_score") >= 0.7).as("q_ok"))
    // jaccardPairs emits id_a < id_b, so id_b is exactly "has a smaller
    // near-dup partner"
    val dupIds = DedupOps.jaccardPairs(docs, k = 3, maxDf)
      .filter(col("jaccard") >= threshold)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("is_dup", lit(true))
    val contIds = DedupOps.contaminationHits(docs, evalDocs)
      .select(col("doc_id"))
      .withColumn("is_cont", lit(true))
    // merge hints: dupIds/contIds are O(docs) distinct-id sets riding
    // explode-heavy lineages whose size-only estimates are far below
    // reality (explode is invisible to size-only stats — the static
    // planner broadcast a 10 GiB side at a 10× corpus and died); the
    // genuinely-tiny broadcast here is the EVAL set inside
    // contaminationHits, which keeps its broadcast join.
    quality
      .join(dupIds.hint("merge"), Seq("doc_id"), "left")
      .join(contIds.hint("merge"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("q_ok"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"),
        coalesce(col("is_cont"), lit(false)).as("is_cont"))
  }

  /** q_curation_funnel — per-source survivor counts through quality →
    * near-dedup → decontamination (docs 0–1 stand in as the eval set,
    * mirroring q_decontaminate). `maxDf = None` is oracle parity only. */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val all = Tables.documents(spark, sfDir)
    survivalFlags(all.filter(col("doc_id") >= 2),
        all.filter(col("doc_id") < 2), maxDf = None)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("q_ok").cast("long")).as("n_quality"),
        sum((col("q_ok") && !col("is_dup")).cast("long")).as("n_dedup"),
        sum((col("q_ok") && !col("is_dup") && !col("is_cont")).cast("long"))
          .as("n_clean"))
      .orderBy(col("source"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation_funnel" -> (qFunnel _))

  private val stopwordsSqlList = TextAnalysis.stopwordsSqlList

  val oracles: Map[String, String] = Map(
    "q_curation_funnel" ->
      s"""WITH corpus AS (
         |  SELECT * FROM documents WHERE doc_id >= 2),
         |quality AS (
         |  SELECT doc_id, source,
         |    ROUND((CASE WHEN n_chars BETWEEN 50 AND 2000 THEN 0.4 ELSE 0.0 END)
         |    + (CASE WHEN
         |        ROUND(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |            x -> list_contains($stopwordsSqlList, x)))
         |          / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6)
         |        > 0.01 THEN 0.3 ELSE 0.0 END)
         |    + (CASE WHEN
         |        ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
         |          / greatest(length(text), 1), 6) < 0.1 THEN 0.3 ELSE 0.0 END),
         |      2) >= 0.7 AS q_ok
         |  FROM corpus),
         |toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
         |  FROM corpus),
         |sh AS (
         |  SELECT DISTINCT doc_id, s FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(1, len(t) - 3 + 2),
         |        i -> array_to_string(t[i:i+2], ' '))) AS s
         |    FROM toks WHERE len(t) >= 3)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |dup AS (
         |  SELECT DISTINCT id_b AS doc_id FROM pairs
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE ROUND(common / (sa.n_sh + sb.n_sh - common), 6) >= 0.5),
         |etoks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
         |  FROM documents WHERE doc_id < 2),
         |esh AS (
         |  SELECT DISTINCT s FROM (
         |    SELECT unnest(list_transform(range(1, len(t) - 3 + 2),
         |      i -> array_to_string(t[i:i+2], ' '))) AS s
         |    FROM etoks WHERE len(t) >= 3)),
         |cont AS (
         |  SELECT DISTINCT sh.doc_id FROM sh JOIN esh ON sh.s = esh.s),
         |flags AS (
         |  SELECT q.doc_id, q.source, q.q_ok,
         |    d.doc_id IS NOT NULL AS is_dup,
         |    c.doc_id IS NOT NULL AS is_cont
         |  FROM quality q
         |  LEFT JOIN dup d ON q.doc_id = d.doc_id
         |  LEFT JOIN cont c ON q.doc_id = c.doc_id)
         |SELECT source, COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(SUM(CASE WHEN q_ok AND NOT is_dup THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dedup,
         |  CAST(SUM(CASE WHEN q_ok AND NOT is_dup AND NOT is_cont
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
         |FROM flags
         |GROUP BY source
         |ORDER BY source""".stripMargin)
}
