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
    * the float ground truth over the probe set (rows-only oracle: the
    * measurement is the assertion; DuckDB has no tinyint-array pipeline
    * to mirror). One row: pair counts + recall. */
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
}
