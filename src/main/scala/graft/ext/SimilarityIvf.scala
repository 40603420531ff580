package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorAggregates.vector_mean
import graft.functions.VectorFunctions.{centroid_argmax, centroid_topn, cosine_sim}
import graft.sources.Tables

/** IVF (inverted-file) ANN — the second scale path next to
  * [[Similarity.annTopK]]'s LSH: cluster the corpus once into nList coarse
  * centroids (Lloyd's iterations, pure DataFrame ops + the native cosine
  * kernel — no MLlib, no UDFs), build the centroid→vectors inverted lists,
  * and serve queries by probing only the nProbe nearest lists.
  *
  * Scale shape: training touches the corpus nIters times (one linear scan +
  * one nList-group aggregate per iteration); the trained centroids are
  * driver-side model state — nList×dim floats, the same bounded
  * "model on the driver" shape MLlib's KMeans uses — so list assignment is a
  * pure map-side projection against centroid literals: no crossJoin, no
  * groupBy-argmax, no join-back, and no recursive plan growth in the Lloyd
  * loop (an unmaterialized centroid lineage would embed each iteration's
  * plan inside the next, re-executing training per downstream use). The
  * index is one extra int column (list id = a partition-able key); a query
  * scans |corpus|·nProbe/nList candidates. Unlike LSH there is no corpus
  * replication, and recall degrades gracefully with data that HAS cluster
  * structure (for isotropic-noise corpora like the test embeddings,
  * LSH multi-table is the better tool — both are provided and measured).
  */
object SimilarityIvf {

  /** Materialize a centroid table as driver model state (bounded:
    * nList rows × dim floats). */
  private def collectCentroids(centroids: DataFrame): Seq[(Int, Seq[Float])] =
    centroids.select(col("centroid_id"), col("centroid")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toSeq.sortBy(_._1)

  private def centroidDf(spark: SparkSession,
                         cents: Seq[(Int, Seq[Float])]): DataFrame = {
    import spark.implicits._
    cents.toDF("centroid_id", "centroid")
  }

  /** Flatten driver model state into the (ids, matrix) pair the native
    * centroid kernels carry via `addReferenceObj` — ids stay explicit
    * because Lloyd iterations can empty a list (gaps). */
  private def flat(cents: Seq[(Int, Seq[Float])]): (Array[Int], Array[Float]) =
    (cents.map(_._1).toArray, cents.flatMap(_._2).toArray)

  /** Map-side argmax-cosine assignment via the fused [[centroid_argmax]]
    * kernel (max cosine, ties to the larger id — the array_max-over-structs
    * tie rule). The composed alternative — nList separate
    * `cosine_sim(emb, typedlit(centroid))` struct nodes — costs seconds of
    * analysis/codegen once nList reaches the 10³–10⁵ a 100 TB corpus needs
    * (nList ≈ √n); the kernel is O(1) to plan regardless of nList. */
  private def assignExpr(cents: Seq[(Int, Seq[Float])], emb: Column): Column = {
    val (ids, m) = flat(cents)
    centroid_argmax(emb, m, ids)
  }

  /** Train nList centroids with Lloyd's iterations in cosine space.
    * Init = deterministic systematic sample (vec_id mod stride). Mean
    * vectors use the typed [[vector_mean]] Aggregator — fixed-size
    * (dim doubles) mergeable state per group, partial-aggregated map-side,
    * where a collect_list-based mean would materialize every member vector
    * of a list in one buffer (unbounded state — the thing that OOMs on a
    * hot list at scale). One shuffle of nList groups per iteration. */
  def train(corpus: DataFrame, nList: Int, nIters: Int = 3, dim: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    val n = corpus.count()
    val stride = math.max(1L, n / nList)
    // orderBy before limit: when n is not an exact multiple of nList the
    // systematic sample has nList+1 candidates, and an unordered limit
    // would pick an arbitrary subset — training must be a pure function
    // of the data (two runs feed the oracle side-input contract)
    // seed ids are the sample's DENSE RANK, not vec_id/stride: ids are
    // arbitrary 64-bit values in a real corpus (snowflake-style, or a
    // partition-shifted blowup), and the division overflowed the INT id
    // at vec_id ≈ 2.4e9 (measured at a 10× corpus). For dense 0..n ids
    // the rank equals the old quotient, so trained artifacts (and the
    // side-input oracle) are unchanged. The rank window runs over the
    // ≤ nList+1-row sample, never the corpus.
    val seedW = Window.orderBy(col("vec_id"))
    var cents = collectCentroids(corpus
      .filter(col("vec_id") % stride === 0).orderBy(col("vec_id"))
      .limit(nList)
      .select((row_number().over(seedW) - 1).as("centroid_id"),
        col("embedding").as("centroid")))
    (1 to nIters).foreach { _ =>
      cents = collectCentroids(corpus
        .select(assignExpr(cents, col("embedding")).as("list_id"),
          col("embedding"))
        .groupBy(col("list_id"))
        .agg(vector_mean(col("embedding")).as("centroid"))
        .select(col("list_id").as("centroid_id"), col("centroid")))
        // snap each Lloyd mean to the 2⁻¹⁰ grid — run-to-run
        // reproducibility for the side-input oracle, see
        // [[SimilarityPq.snap]]
        .map { case (id, v) => id -> v.map(SimilarityPq.snap) }
    }
    centroidDf(spark, cents)
  }

  /** Index: corpus plus its inverted-list id — a single map-side projection
    * (the embedding and any payload columns stay on the row). */
  def index(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.withColumn("list_id",
      assignExpr(collectCentroids(centroids), col("embedding")))

  /** Query: probe the nProbe closest lists per query, exact-score only the
    * vectors in those lists. Probe selection is the fused [[centroid_topn]]
    * kernel — nProbe ranking happens INSIDE the expression (cosine desc,
    * ties to the smaller id, the row_number contract), so the per-query
    * ranking window (and its shuffle) is gone from the probe side entirely.
    * The probe table (|Q|·nProbe rows, carrying the query embedding)
    * broadcasts, so candidate generation + scoring is one map-side pass over
    * the index; the only shuffle is the final per-query top-k window on
    * (query_id, vec_id, score) triples. */
  def topK(queries: DataFrame, indexed: DataFrame, centroids: DataFrame,
           k: Int, nProbe: Int): DataFrame =
    scoreProbed(indexed,
      probeTable(queries, collectCentroids(centroids), nProbe), k)

  /** (query_id, q_emb, list_id) — one row per (query, probed list), built
    * by the fused [[centroid_topn]] kernel entirely map-side. */
  private def probeTable(queries: DataFrame, cents: Seq[(Int, Seq[Float])],
                         nProbe: Int): DataFrame = {
    val (ids, m) = flat(cents)
    queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .select(col("query_id"), col("q_emb"),
        explode(centroid_topn(col("q_emb"), m, ids, nProbe)).as("sc"))
      .select(col("query_id"), col("q_emb"),
        col("sc.centroid_id").as("list_id"))
  }

  /** Broadcast the probe table against the candidate lists, exact-score,
    * keep per-query top-k (cosine desc, ties to the smaller vec_id). */
  private def scoreProbed(candidates: DataFrame, probes: DataFrame,
                          k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    candidates.join(broadcast(probes), "list_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_sim(col("q_emb"), col("embedding")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Land the trained index as a queryable artifact — the reference's own
    * "land it, then query it" design (weather_etl.py:156–187 lands;
    * README.md:539–547 queries) applied to the vector index: centroids
    * (tiny, one file) + the indexed corpus partitioned BY LIST on disk, so
    * serve-time probes become partition-pruned scans instead of a full
    * corpus read. Train once, serve forever; no per-query retraining. */
  def writeIndex(indexed: DataFrame, centroids: DataFrame,
                 dir: String): Unit = {
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    indexed.write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$dir/lists")
  }

  /** (indexed corpus, centroids) read back from [[writeIndex]]'s layout.
    * The corpus side is partition-discovered on list_id — any filter on it
    * prunes directories at planning time. */
  def loadIndex(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/lists"),
     spark.read.parquet(s"$dir/centroids"))

  /** Incremental ingest into a LANDED index: assign the new batch against
    * the artifact's existing centroids (one map-side kernel pass — no
    * retraining, no touch of the already-landed lists) and append its rows
    * into the per-list directories. This is how a daily crawl lands into a
    * trained index: assignment quality degrades only as the data drifts
    * from the training distribution, at which point [[train]] +
    * [[writeIndex]] rebuild the artifact. */
  def appendToIndex(newCorpus: DataFrame, dir: String): Unit = {
    val centroids = newCorpus.sparkSession.read.parquet(s"$dir/centroids")
    index(newCorpus, centroids)
      .write.mode("append").partitionBy("list_id").parquet(s"$dir/lists")
  }

  /** Serve top-k from a LANDED index: probe lists are resolved first and
    * pushed into the scan as a partition filter (`list_id IN (...)`), so
    * the job reads only the ≤ |Q|·nProbe probed directories out of nList —
    * at 100 TB the scan is |corpus|·nProbe/nList bytes, not the corpus.
    * The probed-list collect is bounded driver state (≤ |Q|·nProbe ints). */
  def serveTopK(queries: DataFrame, indexDir: String, k: Int,
                nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    val (lists, centroids) = loadIndex(spark, indexDir)
    // probes is |Q|·nProbe rows from a pure map-side kernel — cheap enough
    // to evaluate twice (once to resolve the partition filter, once as the
    // broadcast side) without a cache entry lingering in a resident session
    val probes = probeTable(queries, collectCentroids(centroids), nProbe)
    val probed = probes.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    scoreProbed(lists.filter(col("list_id").isin(probed: _*)), probes, k)
  }

  /** q_sim_ivf — end-to-end IVF search. Hash-matched against a generated
    * DuckDB oracle that reads the trained centroids as a parquet
    * side-input ([[sides]]) and REPLAYS list assignment (max cosine, ties
    * to the LARGER id — the [[centroid_argmax]] rule), nProbe probe
    * selection (ties to the smaller id — the [[centroid_topn]] rule),
    * exact scoring of the probed lists and the top-5 cut. Training stays
    * Spark-side, reproducible via [[SimilarityPq.snap]]; recall + pruning
    * stay asserted in SimilarityIvfSpec. */
  def qIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = train(emb, nList = 16, nIters = 2)
    val indexed = index(emb, centroids)
    topK(emb.filter(col("vec_id") < 10), indexed, centroids, k = 5, nProbe = 6)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_ivf" -> (qIvf _))

  /** Oracle side-input: the trained centroids (same [[train]] call as
    * [[qIvf]]'s; [[SimilarityPq.snap]] makes the runs identical). */
  val sides: Map[String, (SparkSession, String, String) => Unit] = Map(
    "q_sim_ivf" -> ((spark: SparkSession, sfDir: String, dir: String) =>
      train(Tables.embeddings(spark, sfDir), nList = 16, nIters = 2)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")))

  val oracles: Map[String, String] = Map(
    "q_sim_ivf" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |cents AS (
        |  SELECT centroid_id, CAST(centroid AS DOUBLE[]) AS cvec
        |  FROM read_parquet('{OUT_DIR}/_side/q_sim_ivf/centroids/*.parquet')),
        |assigned AS (
        |  SELECT vec_id, centroid_id AS list_id FROM (
        |    SELECT b.vec_id, c.centroid_id, ROW_NUMBER() OVER (
        |      PARTITION BY b.vec_id
        |      ORDER BY list_inner_product(b.emb, c.cvec) /
        |          sqrt(list_inner_product(b.emb, b.emb) *
        |            list_inner_product(c.cvec, c.cvec)) DESC,
        |        c.centroid_id DESC) AS rn
        |    FROM base b CROSS JOIN cents c) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, centroid_id AS list_id FROM (
        |    SELECT q.vec_id AS query_id, c.centroid_id, ROW_NUMBER() OVER (
        |      PARTITION BY q.vec_id
        |      ORDER BY list_inner_product(q.emb, c.cvec) /
        |          sqrt(list_inner_product(q.emb, q.emb) *
        |            list_inner_product(c.cvec, c.cvec)) DESC,
        |        c.centroid_id) AS rn
        |    FROM (SELECT * FROM base WHERE vec_id < 10) q
        |    CROSS JOIN cents c) WHERE rn <= 6),
        |scored AS (
        |  SELECT p.query_id, a.vec_id,
        |    list_inner_product(q.emb, e.emb) /
        |      sqrt(list_inner_product(q.emb, q.emb) *
        |        list_inner_product(e.emb, e.emb)) AS cs
        |  FROM probes p
        |  JOIN assigned a ON a.list_id = p.list_id
        |  JOIN base e ON e.vec_id = a.vec_id
        |  JOIN base q ON q.vec_id = p.query_id
        |  WHERE a.vec_id <> p.query_id)
        |SELECT query_id, rank, vec_id, score FROM (
        |  SELECT query_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rank,
        |    vec_id, ROUND(cs, 6) AS score
        |  FROM scored) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)
}
