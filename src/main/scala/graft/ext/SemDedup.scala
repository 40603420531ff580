package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_sim
import graft.sources.Tables

/** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
  * arXiv:2303.09540): remove documents that SAY the same thing — near-
  * identical embeddings — even when their text shares no n-grams, by
  * (1) coarse-clustering the embedding space with k-means and
  * (2) comparing pairs only WITHIN a cluster, keeping one representative
  * per semantic-duplicate relation.
  *
  * This is the third fuzzy-dedup family next to [[DedupOps]]' lexical
  * (shingle/MinHash/SimHash) and embedding-LSH paths, and the one used to
  * prune web-scale corpora before LLM pretraining. The reference engine
  * has no text or vector surface at all (228-line weather pipeline —
  * /root/reference/airflow/dags/weather_etl.py).
  *
  * Scale shape: clustering reuses [[SimilarityIvf]]'s Lloyd trainer
  * (driver-resident nList×dim model, map-side fused-kernel assignment —
  * no per-centroid plan growth). The pair stage self-joins each cluster
  * with an id-ordered predicate: cost is Σ|c|² over clusters, the knob
  * being nList (paper uses nList ≈ n/avg_cluster_size so |c| stays
  * bounded — e.g. 50k clusters over 5B docs). The join shuffles on
  * list_id only; a pathologically hot cluster is the same heavy-key
  * profile as a stop-shingle and is bounded the same way — raise nList
  * (finer clusters) rather than any maxDf-style cutoff, because unlike a
  * stop-shingle a big cluster is exactly where semantic duplicates live.
  * Keeper rule: a vector is removed iff some SMALLER vec_id in its
  * cluster clears the threshold — greedy-by-id, one pass, deterministic,
  * and it guarantees the kept set is pairwise ≤ threshold within every
  * cluster (each survivor certifies no smaller kept neighbor above it).
  */
object SemDedup {

  /** Distinct vec_ids condemned within their cluster: b is a duplicate
    * iff ∃ a with a.list_id = b.list_id, a.vec_id < b.vec_id and
    * cos(a, b) > threshold. `indexed` needs (vec_id, embedding, list_id). */
  def duplicateIds(indexed: DataFrame, threshold: Double): DataFrame = {
    val a = indexed.select(col("list_id"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = indexed.select(col("list_id"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    // merge: per-cluster self-join of the whole corpus carrying full
    // embeddings — unbounded and estimate-blind (see jaccardPairs)
    a.join(b.hint("merge"), Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine_sim(col("emb_a"), col("emb_b")) > threshold)
      .select(col("id_b").as("vec_id"))
      .distinct()
  }

  /** Survivors given an already-indexed corpus (vec_id, embedding,
    * list_id) — the entry point for a LOADED index artifact
    * ([[SimilarityIvf.loadIndex]]): dedup serves from the landed parquet
    * without retraining or reassigning. */
  def semDedupIndexed(indexed: DataFrame, threshold: Double = 0.7): DataFrame =
    // merge: the condemned-id set is O(corpus) — unbroadcastable
    indexed.join(duplicateIds(indexed, threshold).hint("merge"),
      Seq("vec_id"), "left_anti")

  /** The surviving corpus: cluster with k-means (nList, nIters), then
    * drop every within-cluster duplicate. Returns the input rows plus
    * their list_id, minus the condemned.
    *
    * EAGER on the condemned set: the index feeds both sides of the
    * per-cluster self-join, so it is persisted for exactly that stage —
    * the duplicate ids (a vec_id-only projection, far narrower than the
    * corpus+embeddings) are materialized through the cache and the
    * corpus-sized index entry is freed before returning. The returned
    * plan re-derives list_id with one map-side assignment scan (driver-
    * resident centroids, fused kernel) on consumption — a corpus scan is
    * the right trade against pinning a corpus-sized cache entry for the
    * session lifetime. */
  def semDedup(corpus: DataFrame, nList: Int, nIters: Int = 2,
               threshold: Double = 0.7): DataFrame = {
    val centroids = SimilarityIvf.train(corpus, nList, nIters)
    val indexed = SimilarityIvf.index(corpus, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dups = duplicateIds(indexed, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dups.count() // materialize the pair stage through the cached index
    indexed.unpersist(blocking = false)
    SimilarityIvf.index(corpus, centroids)
      .join(dups.hint("merge"), Seq("vec_id"), "left_anti")
  }

  /** q_dedup_semantic — per-cluster survivor accounting over the
    * embeddings table. Hash-matched against a generated DuckDB oracle
    * that reads the trained centroids as a parquet side-input ([[sides]])
    * and REPLAYS cluster assignment (max cosine, ties to the larger id),
    * the within-cluster condemnation rule (∃ smaller id with cosine > τ,
    * computed by the same dot/√(na·nb) double arithmetic as the kernel)
    * and the per-list rollup; the keeper invariants stay pinned in
    * SemDedupSpec. τ = 0.3 is corpus-calibrated: the synthetic embeddings
    * are isotropic-ish (max within-label cosine ≈ 0.5), so the
    * real-corpus default of 0.7 would be a no-op here; 0.3 exercises the
    * removal path at every scale factor. */
  def qSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = SimilarityIvf.train(emb, nList = 8, nIters = 2)
    val indexed = SimilarityIvf.index(emb, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = indexed
      .join(duplicateIds(indexed, threshold = 0.3).hint("merge"),
        Seq("vec_id"), "left_anti")
    val out = indexed.groupBy(col("list_id")).agg(count(lit(1)).as("n_vecs"))
      .join(kept.groupBy(col("list_id")).agg(count(lit(1)).as("n_kept")),
        Seq("list_id"), "left")
      .select(col("list_id"), col("n_vecs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("list_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the nList-row rollup through the index cache, then free
    // the big index: a resident session keeps only the bounded result
    // cached (CacheManager dedups repeats by canonicalized plan)
    out.count()
    indexed.unpersist(blocking = false)
    out
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_semantic" -> (qSemantic _))

  /** Oracle side-input: the trained nList=8 centroids (same [[SimilarityIvf
    * .train]] call as [[qSemantic]]'s; [[SimilarityPq.snap]] makes the
    * runs identical). */
  val sides: Map[String, (SparkSession, String, String) => Unit] = Map(
    "q_dedup_semantic" ->
      ((spark: SparkSession, sfDir: String, dir: String) =>
        SimilarityIvf.train(Tables.embeddings(spark, sfDir), nList = 8,
          nIters = 2).coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/centroids")))

  val oracles: Map[String, String] = Map(
    "q_dedup_semantic" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |cents AS (
        |  SELECT centroid_id, CAST(centroid AS DOUBLE[]) AS cvec
        |  FROM read_parquet('{OUT_DIR}/_side/q_dedup_semantic/centroids/*.parquet')),
        |assigned AS (
        |  SELECT vec_id, emb, centroid_id AS list_id FROM (
        |    SELECT b.vec_id, b.emb, c.centroid_id, ROW_NUMBER() OVER (
        |      PARTITION BY b.vec_id
        |      ORDER BY list_inner_product(b.emb, c.cvec) /
        |          sqrt(list_inner_product(b.emb, b.emb) *
        |            list_inner_product(c.cvec, c.cvec)) DESC,
        |        c.centroid_id DESC) AS rn
        |    FROM base b CROSS JOIN cents c) WHERE rn = 1),
        |dups AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM assigned a JOIN assigned b
        |    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        |  WHERE list_inner_product(a.emb, b.emb) /
        |      sqrt(list_inner_product(a.emb, a.emb) *
        |        list_inner_product(b.emb, b.emb)) > 0.3),
        |kept AS (
        |  SELECT list_id, COUNT(*) AS n_kept FROM assigned
        |  WHERE vec_id NOT IN (SELECT vec_id FROM dups)
        |  GROUP BY list_id)
        |SELECT a.list_id, COUNT(*) AS n_vecs,
        |  COALESCE(MAX(k.n_kept), 0) AS n_kept
        |FROM assigned a LEFT JOIN kept k ON k.list_id = a.list_id
        |GROUP BY a.list_id
        |ORDER BY a.list_id""".stripMargin)
}
