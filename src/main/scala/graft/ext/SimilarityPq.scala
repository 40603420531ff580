package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorAggregates.vector_mean
import graft.functions.VectorFunctions.{cosine_sim, pq_adc, pq_encode, pq_lut}
import graft.sources.Tables

/** Product quantization — the third ANN scale path next to
  * [[Similarity.annTopK]]'s LSH and [[SimilarityIvf]]'s inverted lists
  * (Jégou et al., PAMI 2011; the compression half of FAISS's IVF-PQ).
  *
  * The corpus is stored as m per-subspace codes instead of dim floats —
  * m=8, ksub=16 over 64-d float vectors is 8 small ints (1 byte each in a
  * real layout, and parquet dictionary-encodes them near that) against
  * 256 bytes of floats: a ~32× reduction of exactly the artifact a 100 TB
  * vector store scans on every query. Serving never touches the original
  * vectors: each query computes one m·ksub lookup table map-side
  * ([[graft.functions.VectorFunctions.pq_lut]]), and scoring a candidate is
  * m table lookups (pq_adc) instead of a dim-length dot product. Exact
  * re-ranking then joins ONLY the top candidates back to the
  * full-precision store — a selective join against candidate ids, not a
  * corpus scan.
  *
  * Training is Lloyd's per subspace, all m subspaces in one pass per
  * iteration: encode map-side (pq_encode), posexplode the m codes, slice
  * the matching subvector, and one (subspace, code)-grouped vector_mean —
  * bounded m·ksub-group shuffle, mergeable fixed-size state. The codebook
  * (m·ksub·dsub floats — 8 KB here) is driver model state like the IVF
  * centroids.
  */
object SimilarityPq {

  /** Snap a trained centroid coordinate to the 2⁻¹⁰ dyadic grid. Lloyd
    * means are double sums whose partition order varies run to run, so
    * two trainings of the same corpus differ in the last ulp — enough to
    * flip an argmax assignment that sits exactly on a boundary. Snapping
    * makes training a pure function of the data (the ~1e-14 sum noise
    * would have to straddle a 2⁻¹⁰ cell edge to survive — odds ~1e-11),
    * which is what lets a landed codebook serve as a DuckDB-oracle
    * side-input for the SAME query run's retraining. The grid is far
    * finer than Lloyd's convergence tolerance, so recall is unaffected
    * (spec-pinned floors unchanged); grid values k/1024 are exact in
    * float AND double, so both engines read identical coordinates. */
  private[ext] def snap(x: Float): Float =
    (math.rint(x.toDouble * 1024.0) / 1024.0).toFloat

  /** Train per-subspace codebooks; returns the flattened
    * [subspace][code][dim] matrix (m·ksub·dsub floats, driver-resident).
    * Init = subvectors of a deterministic strided sample. `embCol` names
    * the vector column — [[SimilarityIvfPq]] trains on IVF residuals. */
  def train(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
            nIters: Int = 2, embCol: String = "embedding"): Array[Float] = {
    val dim = corpus.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val n = corpus.count()
    require(n >= ksub, s"corpus rows $n < ksub=$ksub")
    val stride = math.max(1L, n / ksub)
    val sample = corpus.filter(col("vec_id") % stride === 0)
      .orderBy(col("vec_id")).limit(ksub)
      .select(col(embCol)).collect().map(_.getSeq[Float](0))
    val cb = new Array[Float](m * ksub * dsub)
    var c = 0
    while (c < math.min(ksub, sample.length)) {
      var j = 0
      while (j < m) {
        var d = 0
        while (d < dsub) {
          cb((j * ksub + c) * dsub + d) = sample(c)(j * dsub + d); d += 1
        }
        j += 1
      }
      c += 1
    }
    (1 to nIters).foreach { _ =>
      // one corpus scan: encode → explode m codes → slice the subvector →
      // m·ksub-group mean (fixed-size mergeable state, map-side partials)
      val means = corpus
        .select(posexplode(pq_encode(col(embCol), cb, m, ksub))
          .as(Seq("j", "code")), col(embCol))
        .select(col("j"), col("code"),
          slice(col(embCol), col("j") * dsub + 1, lit(dsub)).as("sub"))
        .groupBy(col("j"), col("code"))
        .agg(vector_mean(col("sub")).as("mean"))
        .collect()
      // cells no vector mapped to keep their previous centroid
      means.foreach { r =>
        val j = r.getInt(0); val code = r.getInt(1)
        val v = r.getSeq[Float](2)
        var d = 0
        while (d < dsub) {
          cb((j * ksub + code) * dsub + d) = snap(v(d)); d += 1
        }
      }
    }
    cb
  }

  /** Corpus with its code column — one map-side kernel pass. Projecting
    * away `embedding` afterwards is what makes the serving table small. */
  def encode(corpus: DataFrame, codebooks: Array[Float], m: Int,
             ksub: Int, embCol: String = "embedding"): DataFrame =
    corpus.withColumn("codes", pq_encode(col(embCol), codebooks, m, ksub))

  /** ADC top-k over the coded table: per-query LUT map-side on the
    * (broadcast) query side, m-lookup scoring against every candidate,
    * per-query top-k window. The scan reads codes, never embeddings. */
  def adcTopK(queries: DataFrame, coded: DataFrame, codebooks: Array[Float],
              m: Int, ksub: Int, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      pq_lut(col("embedding"), codebooks, m, ksub).as("lut"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    coded.select(col("vec_id"), col("codes"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        pq_adc(col("codes"), col("lut"), ksub).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("rank")
  }

  /** Exact re-rank of ADC candidates: join the candidate ids back to the
    * full-precision store (selective — |Q|·rerankK rows against the
    * corpus, broadcast on the candidate side at serving scale), score with
    * true cosine, keep top-k. The standard two-stage PQ serving shape:
    * cheap approximate scan over codes, exact math over candidates only. */
  def rerankTopK(queries: DataFrame, coded: DataFrame, corpus: DataFrame,
                 codebooks: Array[Float], m: Int, ksub: Int, k: Int,
                 rerankK: Int): DataFrame = {
    require(rerankK >= k, s"rerankK=$rerankK < k=$k")
    exactRerank(queries,
      adcTopK(queries, coded, codebooks, m, ksub, rerankK), corpus, k)
  }

  /** The exact half of two-stage serving, shared with [[SimilarityIvfPq]]:
    * join (query_id, vec_id) candidates back to the full-precision store,
    * score with true cosine, keep per-query top-k (desc, ties to the
    * smaller vec_id). */
  def exactRerank(queries: DataFrame, candidates: DataFrame,
                  corpus: DataFrame, k: Int): DataFrame = {
    val cands = candidates.select(col("query_id"), col("vec_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(cands), "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        cosine_sim(col("q_emb"), col("embedding")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Land the PQ index: the coded table (ids + codes, embeddings projected
    * AWAY — that projection is the 32× artifact shrink) plus the codebook
    * as one tiny parquet of (j, code, vec) rows. Same "train once, serve
    * forever" artifact treatment as [[SimilarityIvf.writeIndex]]. */
  def writeIndex(coded: DataFrame, codebooks: Array[Float], m: Int,
                 ksub: Int, dir: String): Unit = {
    coded.select(col("vec_id"), col("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")
    writeCodebookTable(coded.sparkSession, codebooks, m, ksub,
      s"$dir/codebook")
  }

  /** The codebook as one tiny (j, code, vec) parquet — the landed half of
    * [[writeIndex]], also the oracle side-input [[sides]] lands. */
  private[ext] def writeCodebookTable(spark: SparkSession,
                                      codebooks: Array[Float], m: Int,
                                      ksub: Int, path: String): Unit = {
    import spark.implicits._
    val dsub = codebooks.length / (m * ksub)
    (for (j <- 0 until m; c <- 0 until ksub) yield {
      val base = (j * ksub + c) * dsub
      (j, c, (base until base + dsub).map(codebooks(_)))
    }).toDF("j", "code", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** (coded table, flattened codebook, (m, ksub)) read back from
    * [[writeIndex]]'s layout. */
  def loadIndex(spark: SparkSession, dir: String)
      : (DataFrame, Array[Float], (Int, Int)) = {
    val coded = spark.read.parquet(s"$dir/codes")
    val rows = spark.read.parquet(s"$dir/codebook")
      .orderBy(col("j"), col("code")).collect()
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    val dsub = rows.head.getSeq[Float](2).length
    val cb = new Array[Float](m * ksub * dsub)
    rows.foreach { r =>
      val base = (r.getInt(0) * ksub + r.getInt(1)) * dsub
      val v = r.getSeq[Float](2)
      var d = 0
      while (d < dsub) { cb(base + d) = v(d); d += 1 }
    }
    (coded, cb, (m, ksub))
  }

  /** q_sim_pq — end-to-end PQ search over the embeddings table: train,
    * encode, ADC top-20 over codes only, exact re-rank to top-5.
    * Hash-matched against a generated DuckDB oracle that reads the
    * trained codebook as a parquet side-input ([[sides]]) and REPLAYS
    * everything downstream of training: per-subspace encode (the same
    * argmax(dot − ½‖c‖²) with ties to the smaller code — the dot
    * products are bit-identical because snapped-codebook × float32
    * products are exact in double and both engines sum left-to-right),
    * the per-query LUT with its double→float rounding, the m-lookup ADC
    * top-20, and the exact cosine re-rank. Training itself stays
    * Spark-side (Lloyd's over [[graft.functions.VectorAggregates]]) —
    * the [[snap]] grid makes it reproducible, so the side-input equals
    * the query run's own codebook; recall, compression and the landed
    * round-trip stay pinned in SimilarityPqSpec. */
  def qPq(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val (m, ksub) = (8, 16)
    val cb = train(emb, m, ksub, nIters = 2)
    val coded = encode(emb, cb, m, ksub)
    rerankTopK(emb.filter(col("vec_id") < 10), coded, emb, cb, m, ksub,
        k = 5, rerankK = 20)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_pq" -> (qPq _))

  /** Oracle side-input: the trained codebook, landed for the generated
    * DuckDB replay (the `{OUT_DIR}` placeholder in [[oracles]] resolves
    * to the verify out dir at dump time). */
  val sides: Map[String, (SparkSession, String, String) => Unit] = Map(
    "q_sim_pq" -> ((spark: SparkSession, sfDir: String, dir: String) => {
      val emb = Tables.embeddings(spark, sfDir)
      writeCodebookTable(spark, train(emb, 8, 16, nIters = 2), 8, 16,
        s"$dir/codebook")
    }))

  val oracles: Map[String, String] = Map(
    "q_sim_pq" ->
      """WITH cb AS (
        |  SELECT j, code, CAST(vec AS DOUBLE[]) AS vec,
        |    0.5 * list_inner_product(CAST(vec AS DOUBLE[]),
        |      CAST(vec AS DOUBLE[])) AS halfnorm
        |  FROM read_parquet('{OUT_DIR}/_side/q_sim_pq/codebook/*.parquet')),
        |base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |scored AS (
        |  SELECT b.vec_id, cb.j, cb.code,
        |    list_inner_product(b.emb[cb.j*8+1 : cb.j*8+8], cb.vec)
        |      - cb.halfnorm AS s
        |  FROM base b CROSS JOIN cb),
        |codes AS (
        |  SELECT vec_id, j, code FROM (
        |    SELECT vec_id, j, code, ROW_NUMBER() OVER (
        |      PARTITION BY vec_id, j ORDER BY s DESC, code) AS rn
        |    FROM scored) WHERE rn = 1),
        |lut AS (
        |  SELECT b.vec_id AS query_id, cb.j, cb.code,
        |    CAST(CAST(list_inner_product(b.emb[cb.j*8+1 : cb.j*8+8], cb.vec)
        |      AS REAL) AS DOUBLE) AS lv
        |  FROM base b CROSS JOIN cb WHERE b.vec_id < 10),
        |adc AS (
        |  SELECT l.query_id, c.vec_id, SUM(l.lv) AS score
        |  FROM codes c JOIN lut l ON l.j = c.j AND l.code = c.code
        |  WHERE c.vec_id <> l.query_id
        |  GROUP BY l.query_id, c.vec_id),
        |top20 AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
        |    FROM adc) WHERE rn <= 20),
        |rerank AS (
        |  SELECT t.query_id, e.vec_id,
        |    list_inner_product(q.emb, e.emb) /
        |      sqrt(list_inner_product(q.emb, q.emb) *
        |        list_inner_product(e.emb, e.emb)) AS cs
        |  FROM top20 t JOIN base e ON e.vec_id = t.vec_id
        |  JOIN base q ON q.vec_id = t.query_id)
        |SELECT query_id, rank, vec_id, score FROM (
        |  SELECT query_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rank,
        |    vec_id, ROUND(cs, 6) AS score
        |  FROM rerank) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)
}
