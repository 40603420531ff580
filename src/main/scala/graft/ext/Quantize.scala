package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Int8 scalar quantization for embedding columns — the standard 4×
  * memory/shuffle/scan compression for vector search at corpus scale
  * (float32[64] = 256 B/vector; int8[64] = 64 B + one float scale).
  *
  * Symmetric per-vector quantization: scale = max|x| / 127,
  * q_i = round(x_i / scale) ∈ [-127, 127], stored as array<tinyint>.
  * Cosine similarity is scale-invariant, so ranking quantized vectors
  * against each other needs NO dequantization — the int codes are cast
  * to float lazily inside the scoring expression while the stored (and
  * shuffled, and scanned) representation stays 1 byte per dimension.
  * Recall loss at 64-dim is small (spec-asserted ≥ 0.8 @5, measured
  * higher); the q_quant_recall query measures it against the float
  * brute-force ground truth.
  *
  * All built-in higher-order column functions (no UDFs), map-side only;
  * quantization of 100 TB of embeddings is scan-bound, which is the
  * right bound.
  */
object Quantize {

  /** Per-vector symmetric scale (double). The 1e-30 floor keeps zero
    * vectors finite (they quantize to all-zero codes, cosine 0 — same
    * contract as the native kernel's zero-norm rule). */
  def scaleOf(emb: Column): Column =
    greatest(array_max(transform(emb, x => abs(x))).cast("double") / 127.0,
      lit(1e-30))

  /** array<float> → array<tinyint> codes for a PRE-PROJECTED scale column.
    * The scale must be materialized once per row before entering the
    * lambda: referencing `scaleOf(emb)` inside it would re-evaluate the
    * array_max scan per ELEMENT — O(d²) work per vector. */
  def int8Codes(emb: Column, scale: Column): Column =
    transform(emb, x => round(x / scale).cast("byte"))

  /** Quantized twin of an embeddings frame: vec_id, codes, scale. The
    * two-step projection keeps the scale an attribute reference inside the
    * quantization lambda (CollapseProject does not inline non-cheap
    * expressions used twice). */
  def quantize(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
        scaleOf(col("embedding")).as("s"))
      .select(col("vec_id"),
        int8Codes(col("embedding"), col("s")).as("codes"),
        col("s").cast("float").as("scale"))

  /** Codes viewed as array<float> for the cosine kernel — the lazy
    * dequantization-free scoring form (cosine ignores the per-vector
    * scale). */
  private def scoreView(quantized: DataFrame): DataFrame =
    quantized.select(col("vec_id"),
      col("codes").cast("array<float>").as("embedding"))

  /** q_quant_recall — recall@5 of int8-quantized brute-force search vs
    * the float ground truth over the probe set. One row: pair counts +
    * recall. Hash-matched against a DuckDB oracle that REPLAYS the
    * quantization arithmetic (scale = max|x|/127 floored at 1e-30,
    * q_i = round(x_i/scale)) — portable because every step is exact or
    * deterministic: the codes are small integers (|q| ≤ 127, so a
    * 64-dim dot ≤ 127²·64 ≈ 2²⁰ — exact in float AND double), cosine
    * over integer-valued vectors is a ratio of exact sums, both engines
    * round() half-away-from-zero, and the top-5 tie-break is
    * (score DESC, vec_id) on both sides. */
  def qQuantRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val probes = Similarity.queriesSet(emb) // SAME probe set as q_sim_brute/ann
    val exact = Similarity.bruteForceTopK(probes, emb, k = 5)
      .select(col("query_id"), col("vec_id"))
    val qAll = scoreView(quantize(emb))
    val qProbes = Similarity.queriesSet(qAll)
    val approx = Similarity.bruteForceTopK(qProbes, qAll, k = 5)
      .select(col("query_id"), col("vec_id"))
    exact
      .join(approx.withColumn("hit", lit(1)),
        Seq("query_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_matched"))
      .withColumn("recall", round(col("n_matched") / col("n_pairs"), 4))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quant_recall" -> (qQuantRecall _))

  val oracles: Map[String, String] = Map(
    "q_quant_recall" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> abs(x))) / 127.0, 1e-30) AS s
        |  FROM embeddings),
        |quant AS (
        |  SELECT vec_id, list_transform(emb, x -> round(x / s)) AS qemb
        |  FROM base),
        |exact AS (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.emb, e.emb) DESC,
        |        e.vec_id) AS rank
        |  FROM base e CROSS JOIN (SELECT * FROM base WHERE vec_id < 10) q
        |  WHERE e.vec_id <> q.vec_id),
        |approx AS (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.qemb, e.qemb) DESC,
        |        e.vec_id) AS rank
        |  FROM quant e CROSS JOIN (SELECT * FROM quant WHERE vec_id < 10) q
        |  WHERE e.vec_id <> q.vec_id)
        |SELECT COUNT(*) AS n_pairs,
        |  CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_matched,
        |  ROUND(CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*), 4) AS recall
        |FROM (SELECT query_id, vec_id FROM exact WHERE rank <= 5) x
        |LEFT JOIN (SELECT query_id, vec_id FROM approx WHERE rank <= 5) a
        |  ON x.query_id = a.query_id AND x.vec_id = a.vec_id""".stripMargin)
}
