package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis.tokens
import graft.sources.Tables

/** Data-mixture operators for training-set assembly (north-star surface
  * beyond the reference): stratified sampling to hit a target domain mix,
  * and sequential sequence packing for context-window budgeting.
  *
  * Both are DETERMINISTIC by construction — systematic (every k-th row in
  * key order) rather than pseudo-random — which is what makes them (a)
  * reproducible across reruns/retries at 100 TB, where a re-executed stage
  * must not change the training set, and (b) exactly oracle-checkable in
  * SQL, unlike `sample()`'s RNG. A seeded hash-mod variant
  * (`xxhash64(doc_id) % k = 0`) has the same properties when key order
  * itself is biased; both shapes are one window/filter — no extra shuffle
  * beyond the per-stratum partition.
  */
object Mixing {

  /** Keep every stride-th document per language (doc_id order): the domain
    * re-weighting step of corpus assembly. `strides(lang) = k` keeps ~1/k of
    * that stratum; unlisted languages use `defaultStride`. One window
    * shuffle on the stratum key. */
  def stratifiedSystematic(docs: DataFrame, strides: Map[String, Int],
                           defaultStride: Int): DataFrame = {
    val strideCol: Column = coalesce(
      try_element_at(typedlit(strides), col("lang")), lit(defaultStride))
    val rn = row_number().over(
      Window.partitionBy(col("lang")).orderBy(col("doc_id")))
    docs.withColumn("__stride", strideCol)
      .withColumn("__rn", rn)
      .filter((col("__rn") - 1) % col("__stride") === 0)
      .drop("__stride", "__rn")
  }

  /** q_sample_stratified — per-language kept counts for a 2/5/10 mix
    * (en kept densest). Deterministic, hash-matched by the oracle's
    * ROW_NUMBER twin. */
  def qSampleStratified(spark: SparkSession, sfDir: String): DataFrame =
    stratifiedSystematic(Tables.documents(spark, sfDir),
      Map("en" -> 2, "fr" -> 5), defaultStride = 10)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
      .orderBy(col("lang"))

  /** Sequential packing accounting: documents per source in doc_id order
    * fill context windows of `ctx` tokens; a document starts a new bin when
    * the running total before it crosses a bin boundary. bin id =
    * floor(preceding-cumsum / ctx) — the standard streaming-packer shape,
    * exact in one window pass (no per-bin state, no driver loop). The last
    * document of a bin straddles the boundary, so bins can exceed ctx
    * tokens even when every document is shorter than ctx (real packers
    * truncate or split the straddler; the accounting stays exact either
    * way, and fill ratios > 1.0 quantify exactly that overflow). */
  def packBins(docs: DataFrame, ctx: Int): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / lit(ctx))
          .cast("long"))
  }

  /** q_seq_pack — packing efficiency per source at ctx=2048: bins used,
    * fill ratio, biggest bin. THE context-window budgeting query: fill
    * ratio tells you the padding waste a naive sequential packer pays. */
  def qSeqPack(spark: SparkSession, sfDir: String): DataFrame = {
    val ctx = 2048
    packBins(Tables.documents(spark, sfDir), ctx)
      .groupBy(col("source"), col("bin"))
      .agg(sum(col("n_tokens")).as("bin_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bins"),
        max(col("bin_tokens")).as("max_bin_tokens"),
        round(avg(col("bin_tokens")) / ctx, 4).as("avg_fill"))
      .orderBy(col("source"))
  }

  /** Temperature-based mixture re-weighting: sampling share per stratum
    * `p_s ∝ n_s^alpha` (the multilingual-corpus standard — alpha=1 keeps
    * natural proportions, alpha→0 approaches uniform, 0.2–0.7 is the usual
    * up-weight-the-tail band). Returns one row per stratum with natural and
    * re-weighted shares plus the document budget each stratum receives.
    *
    * The window runs over the AGGREGATED frame — |strata| rows, not the
    * corpus — so the single-partition window is a few dozen rows at any
    * corpus size; the only corpus-scale work is the partial-agg'd count. */
  def mixtureWeights(docs: DataFrame, alpha: Double, budget: Long,
                     stratum: String = "lang"): DataFrame = {
    val all = Window.partitionBy()
    val powed = pow(col("n_docs"), alpha)
    docs.groupBy(col(stratum)).agg(count(lit(1)).as("n_docs"))
      .withColumn("raw_share",
        col("n_docs") / sum(col("n_docs")).over(all))
      .withColumn("weight", powed / sum(powed).over(all))
      .withColumn("target_docs",
        floor(col("weight") * budget).cast("long"))
  }

  /** q_mixture — alpha=0.7 language mixture for a 100k-document budget:
    * the plan-the-sampling-rates query that precedes
    * [[stratifiedSystematic]] (its per-stratum stride ≈ n_docs/target). */
  def qMixture(spark: SparkSession, sfDir: String): DataFrame =
    mixtureWeights(Tables.documents(spark, sfDir), alpha = 0.7,
        budget = 100000L)
      .select(col("lang"), col("n_docs"),
        round(col("raw_share"), 6).as("raw_share"),
        round(col("weight"), 6).as("weight"),
        col("target_docs"))
      .orderBy(col("lang"))

  /** Deterministic epoch shuffle: a seeded-hash TOTAL order over the
    * corpus — the training-order randomization step. Hash-ordering beats
    * `orderBy(rand())` on the two properties that matter at 100 TB:
    * a re-executed stage reproduces the same order (retry-stable, so the
    * training set's order is a pure function of (corpus, seed)), and a
    * new epoch is just a new seed. The sort is Spark's standard
    * range-partitioned total order; at scale you'd write the result as
    * sorted epoch shards rather than collect it. */
  def epochShuffle(docs: DataFrame, seed: Long): DataFrame =
    docs.orderBy(
      md5(concat_ws(":", lit(seed), col("doc_id").cast("string"))),
      col("doc_id"))

  /** q_epoch_shuffle — the first 20 positions of the seed-42 epoch order
    * (position via the same total order, so the oracle can reproduce it
    * exactly). */
  def qEpochShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val key = md5(concat_ws(":", lit(42L), col("doc_id").cast("string")))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        row_number().over(
          Window.orderBy(key, col("doc_id"))).as("position"))
      .filter(col("position") <= 20)
      .orderBy(col("position"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_epoch_shuffle" -> (qEpochShuffle _),
    "q_mixture" -> (qMixture _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_seq_pack" -> (qSeqPack _))

  val oracles: Map[String, String] = Map(
    "q_epoch_shuffle" ->
      """SELECT doc_id, position FROM (
        |  SELECT doc_id,
        |    ROW_NUMBER() OVER (
        |      ORDER BY md5(CONCAT('42', ':', CAST(doc_id AS VARCHAR))),
        |        doc_id) AS position
        |  FROM documents) t
        |WHERE position <= 20
        |ORDER BY position""".stripMargin,
    "q_mixture" ->
      """WITH counts AS (
        |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        |weighted AS (
        |  SELECT lang, n_docs,
        |    n_docs / SUM(n_docs) OVER () AS raw_share,
        |    POWER(n_docs, 0.7) / SUM(POWER(n_docs, 0.7)) OVER () AS weight
        |  FROM counts)
        |SELECT lang, n_docs,
        |  ROUND(raw_share, 6) AS raw_share,
        |  ROUND(weight, 6) AS weight,
        |  CAST(FLOOR(weight * 100000) AS BIGINT) AS target_docs
        |FROM weighted
        |ORDER BY lang""".stripMargin,
    "q_sample_stratified" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
        |    CASE lang WHEN 'en' THEN 2 WHEN 'fr' THEN 5 ELSE 10 END AS stride
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_kept,
        |  MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
        |FROM ranked WHERE (rn - 1) % stride = 0
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "q_seq_pack" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |  FROM documents),
        |binned AS (
        |  SELECT source,
        |    CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      / 2048.0) AS BIGINT) AS bin,
        |    n_tokens
        |  FROM toks),
        |per_bin AS (
        |  SELECT source, bin, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        |  FROM binned GROUP BY 1, 2)
        |SELECT source, COUNT(*) AS n_bins,
        |  MAX(bin_tokens) AS max_bin_tokens,
        |  ROUND(AVG(bin_tokens) / 2048, 4) AS avg_fill
        |FROM per_bin
        |GROUP BY source
        |ORDER BY source""".stripMargin)
}
