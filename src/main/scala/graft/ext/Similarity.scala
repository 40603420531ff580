package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosine_sim, dot_product, hyperplane_buckets}
import graft.sources.Tables

/** Similarity search over the `embeddings` table (north-star op,
  * SURVEY.md §2): brute-force cosine top-k as the correctness baseline, and
  * random-hyperplane LSH as the scale path.
  *
  * Scale shape: brute force is O(|Q|·|C|) — correct only when the query set
  * is small enough to broadcast (it is here: broadcast(queries) × corpus is
  * a map-side nested loop with NO shuffle of the corpus). The ANN variant
  * buckets the corpus once (linear scan, deterministic hyperplanes) and
  * probes only matching buckets, trading recall for a |C|/2^planes-sized
  * candidate set per query. Recall is measured against brute force in
  * SimilaritySpec.
  */
object Similarity {

  /** Flattened deterministic gaussian plane matrix (seeded; same on every
    * executor since they're driver-side literals) — ONE generator shared
    * with the SQL `hyperplane_buckets(emb, nT, bits, dim, seed)` builder
    * so SQL and Scala bucket ids agree bit-for-bit. */
  private def flatPlanes(nPlanes: Int, dim: Int, seed: Long): Array[Float] =
    org.apache.spark.sql.graft.GraftExpressions
      .gaussianPlanes(nPlanes, dim, seed)

  /** Sign-bit bucket id from nPlanes hyperplane dot products — one long
    * column from the single fused [[hyperplane_buckets]] kernel (the
    * composed per-plane dot_product/when/shiftleft tree costs seconds of
    * analysis+codegen at high plane counts). A vector whose length ≠ dim
    * throws — silent mis-bucketing would degrade LSH to the O(n²) cross
    * join the design forbids while still returning "correct" rows. */
  def bucketExpr(embedding: Column, nPlanes: Int, dim: Int = 64,
                 seed: Long = 7L): Column =
    hyperplane_buckets(embedding, flatPlanes(nPlanes, dim, seed),
      nTables = 1, bitsPerTable = nPlanes).getItem(0)

  /** Corpus with its LSH bucket id. */
  def hyperplaneBuckets(emb: DataFrame, nPlanes: Int, dim: Int = 64,
                        seed: Long = 7L): DataFrame =
    emb.withColumn("bucket", bucketExpr(col("embedding"), nPlanes, dim, seed))

  /** The seeded plane matrix as a (tbl, bit, vec) frame — the oracle
    * side-input that lets DuckDB replay sign-bit bucketing (the gaussian
    * draw itself is the one part SQL cannot reproduce; the dots over the
    * landed planes are bit-identical, float×float products being exact in
    * double with both engines summing left-to-right). */
  private[ext] def planesTable(spark: SparkSession, nTables: Int,
                               bitsPerTable: Int, dim: Int,
                               seed: Long): DataFrame = {
    import spark.implicits._
    val ps = flatPlanes(nTables * bitsPerTable, dim, seed)
    (for (t <- 0 until nTables; j <- 0 until bitsPerTable) yield {
      val base = (t * bitsPerTable + j) * dim
      (t, j, (base until base + dim).map(ps(_)))
    }).toDF("tbl", "bit", "vec")
  }

  /** Brute-force top-k: broadcast the query set, nested-loop cosine against
    * the whole corpus, per-query window rank. Self-matches excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_sim(col("q_emb"), col("embedding")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** ANN top-k: classic multi-table hyperplane LSH — nTables independent
    * tables of bitsPerTable sign bits; a pair is a candidate if it collides
    * in ANY table. Collision probability for angle θ is
    * 1-(1-(1-θ/π)^b)^L, so recall is tuned by (L, b) and pruning by b alone
    * (candidates/query ≈ L·n/2^b). At 100 TB, b grows with log(n) to keep
    * buckets bounded; the ×L corpus replication is the standard LSH
    * memory-for-recall trade. Per-table bucketing is one map-side pass (no
    * shuffle until the candidate join). */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nTables: Int = 16, bitsPerTable: Int = 4, dim: Int = 64,
              seed: Long = 7L): DataFrame = {
    val ps = flatPlanes(nTables * bitsPerTable, dim, seed)
    def tabled(df: DataFrame, idCol: String, embOut: String): DataFrame =
      df.select(col("vec_id").as(idCol), col("embedding").as(embOut),
        posexplode(hyperplane_buckets(col("embedding"), ps,
          nTables, bitsPerTable)).as(Seq("table", "bucket")))
    val c = tabled(corpus, "vec_id", "embedding")
    val q = tabled(queries, "query_id", "q_emb")
    // Shuffle-minimal shape: the query side is small by contract (that's
    // what makes top-k search a lookup, not a join), so its bucketed form
    // broadcasts and the candidate join is map-side — the 16×|C| exploded
    // corpus never shuffles. Scoring happens IN the broadcast join stage
    // (the query embedding rides the broadcast), so a pair colliding in
    // several tables is scored per collision (cheap: one fused cosine
    // kernel) and deduped by max() on an 18-byte row — versus distinct()
    // on the raw pair list plus two join-backs to re-attach embeddings,
    // which costs three extra shuffles.
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_sim(col("q_emb"), col("embedding")).as("score"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("score")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ---- driver queries ----

  /** The shared probe set for every similarity measurement query
    * (brute/ANN/quantized) — one definition so their recalls compare over
    * the same population. */
  private[ext] def queriesSet(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 10)

  /** q_sim_brute — exact cosine top-5 for the 10 probe vectors. */
  def qBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    bruteForceTopK(queriesSet(emb), emb, k = 5)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q_sim_ann — LSH-bucketed approximate top-5. Hash-matched against a
    * generated DuckDB oracle that reads the seeded plane matrix as a
    * parquet side-input ([[sides]] — the gaussian draw is the one part
    * SQL cannot reproduce) and REPLAYS sign-bit bucketing, per-table
    * collision candidates and the exact cosine top-5; recall vs brute
    * force stays asserted in SimilaritySpec. */
  def qAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    annTopK(queriesSet(emb), emb, k = 5)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q_embed_stats — embedding hygiene: dimension and norm accounting per
    * label (catches truncated or zero vectors at ingest). */
  def qEmbedStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"), size(col("embedding")).as("dim"),
        sqrt(dot_product(col("embedding"), col("embedding"))).as("norm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("dim")).as("min_dim"), max(col("dim")).as("max_dim"),
        round(avg(col("norm")), 4).as("avg_norm"))
      .orderBy(col("label"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_brute" -> (qBrute _),
    "q_sim_ann" -> (qAnn _),
    "q_embed_stats" -> (qEmbedStats _))

  /** Oracle side-input for q_sim_ann: the 16-table × 4-bit plane matrix
    * (the [[annTopK]] defaults). The generated oracle replays bucketing,
    * multi-table candidate union and the exact top-5. */
  val sides: Map[String, (SparkSession, String, String) => Unit] = Map(
    "q_sim_ann" -> ((spark: SparkSession, sfDir: String, dir: String) =>
      planesTable(spark, nTables = 16, bitsPerTable = 4, dim = 64,
        seed = 7L).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/planes")))

  val oracles: Map[String, String] = Map(
    "q_sim_ann" ->
      """WITH planes AS (
        |  SELECT tbl, bit, CAST(vec AS DOUBLE[]) AS pvec
        |  FROM read_parquet('{OUT_DIR}/_side/q_sim_ann/planes/*.parquet')),
        |base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |buckets AS (
        |  SELECT b.vec_id, p.tbl,
        |    SUM(CASE WHEN list_inner_product(b.emb, p.pvec) > 0
        |      THEN 1 << p.bit ELSE 0 END) AS bucket
        |  FROM base b CROSS JOIN planes p
        |  GROUP BY b.vec_id, p.tbl),
        |cands AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
        |  FROM (SELECT * FROM buckets WHERE vec_id < 10) q
        |  JOIN buckets c ON c.tbl = q.tbl AND c.bucket = q.bucket
        |  WHERE c.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT cd.query_id, cd.vec_id,
        |    list_inner_product(q.emb, e.emb) /
        |      sqrt(list_inner_product(q.emb, q.emb) *
        |        list_inner_product(e.emb, e.emb)) AS cs
        |  FROM cands cd
        |  JOIN base e ON e.vec_id = cd.vec_id
        |  JOIN base q ON q.vec_id = cd.query_id)
        |SELECT query_id, rank, vec_id, score FROM (
        |  SELECT query_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rank,
        |    vec_id, ROUND(cs, 6) AS score
        |  FROM scored) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q_sim_brute" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |             CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_inner_product(q.q_emb, CAST(e.embedding AS DOUBLE[])) /
        |      sqrt(list_inner_product(q.q_emb, q.q_emb) *
        |        list_inner_product(CAST(e.embedding AS DOUBLE[]),
        |          CAST(e.embedding AS DOUBLE[]))) AS score
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.query_id)
        |SELECT query_id, rank, vec_id, score FROM (
        |  SELECT query_id, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id) AS rank,
        |    vec_id, ROUND(score, 6) AS score
        |  FROM scored) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q_embed_stats" ->
      """SELECT label, COUNT(*) AS n_vecs,
        |  CAST(MIN(len(embedding)) AS INT) AS min_dim,
        |  CAST(MAX(len(embedding)) AS INT) AS max_dim,
        |  ROUND(AVG(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |    CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
        |FROM embeddings
        |GROUP BY label
        |ORDER BY label""".stripMargin)
}
