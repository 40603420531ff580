package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_sim
import graft.sources.Tables

/** IVF (inverted-file) ANN — the second scale path next to
  * [[Similarity.annTopK]]'s LSH: cluster the corpus once into nList coarse
  * centroids (Lloyd's iterations, pure DataFrame ops + the native cosine
  * kernel — no MLlib, no UDFs), build the centroid→vectors inverted lists,
  * and serve queries by probing only the nProbe nearest lists.
  *
  * Scale shape: training touches the corpus nIters times (linear scans with
  * a broadcast centroid table — centroids are √n-ish, always broadcastable);
  * the index is one extra int column (list id = a partition-able key);
  * a query scans |corpus|·nProbe/nList candidates. Unlike LSH there is no
  * corpus replication, and recall degrades gracefully with data that HAS
  * cluster structure (for isotropic-noise corpora like the test embeddings,
  * LSH multi-table is the better tool — both are provided and measured).
  */
object SimilarityIvf {

  /** Assign each vector the id of its max-cosine centroid (broadcast
    * centroids → map-side argmax via one window-free groupBy-less
    * max_by(struct)). */
  private def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        cosine_sim(col("embedding"), col("centroid")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("centroid_id"), struct(col("sim"), col("centroid_id")))
        .as("list_id"))

  /** Train nList centroids with Lloyd's iterations in cosine space.
    * Init = deterministic systematic sample (vec_id mod stride). Mean
    * vectors are computed with `aggregate`+`zip_with` array sums — one
    * shuffle of nList groups per iteration. */
  def train(corpus: DataFrame, nList: Int, nIters: Int = 3, dim: Int = 64): DataFrame = {
    val n = corpus.count()
    val stride = math.max(1L, n / nList)
    var centroids = corpus
      .filter(col("vec_id") % stride === 0).limit(nList)
      .select((col("vec_id") / stride).cast("int").as("centroid_id"),
        col("embedding").as("centroid"))
    (1 to nIters).foreach { _ =>
      val assigned = assign(corpus, centroids)
        .join(corpus, "vec_id")
      // element-wise mean per list: sum each dimension, divide by count
      val zeros = array((0 until dim).map(_ => lit(0.0d)): _*)
      centroids = assigned.groupBy(col("list_id"))
        .agg(
          aggregate(collect_list(col("embedding")), zeros,
            (acc, v) => zip_with(acc, v, (a, b) => a + b)).as("sums"),
          count(lit(1)).as("cnt"))
        .select(col("list_id").as("centroid_id"),
          transform(col("sums"), s => (s / col("cnt")).cast("float"))
            .as("centroid"))
    }
    centroids
  }

  /** Index: corpus with its inverted-list id. */
  def index(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assign(corpus, centroids).join(corpus, "vec_id")

  /** Query: probe the nProbe closest lists per query, exact-score only the
    * vectors in those lists. */
  def topK(queries: DataFrame, indexed: DataFrame, centroids: DataFrame,
           k: Int, nProbe: Int): DataFrame = {
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q_emb"), col("centroid_id"),
        cosine_sim(col("q_emb"), col("centroid")).as("csim"))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("centroid_id").as("list_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    probes.join(indexed, "list_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_sim(col("q_emb"), col("embedding")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** q_sim_ivf — end-to-end IVF search (rows-only oracle; recall + pruning
    * asserted in SimilarityIvfSpec). */
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
}
