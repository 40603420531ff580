package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Checkpointer
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** Duplicate-cluster resolution: the step AFTER candidate-pair generation.
  *
  * Every fuzzy-dedup scheme in [[DedupOps]] ends in verified similar PAIRS,
  * but a dedup pass needs CLUSTERS — near-duplicate similarity is not
  * transitive, yet keep-one-per-group semantics require a partition of the
  * corpus (A~B and B~C must land A, B, C in one group even when A~C is below
  * threshold, or the keeper set still contains a near-duplicate). The
  * standard resolution (reference pipelines and the MapReduce literature
  * alike) is connected components over the pair graph, with the component's
  * minimum doc id as the canonical keeper.
  *
  * Scale design: iterative min-label propagation. Each round every node
  * adopts the smallest label among itself and its neighbors — one shuffle
  * join (labels onto edges) plus one aggregate per round. Rounds needed =
  * the graph diameter, and duplicate clusters are near-cliques (diameter
  * 2–3) because edges come from a similarity threshold, so the loop settles
  * in a handful of rounds at any corpus size; for adversarially long chains
  * the large-star/small-star contraction (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") bounds rounds at O(log n) — not
  * needed for threshold graphs. Per-round `localCheckpoint` truncates the
  * logical plan so round N never replays rounds 1..N-1 (the classic
  * iterative-Spark lineage explosion). The per-round driver-side scalar is
  * ONE count (the convergence test), same family as the Lloyd-iteration
  * scalars in [[SimilarityIvf]]. The edge list is tiny relative to the
  * corpus — only docs that matched a candidate pair appear in it.
  */
object DedupCluster {

  /** Connected components of an undirected (id_a, id_b) edge list.
    * Returns one row per distinct endpoint: (doc_id, cluster_id) where
    * cluster_id is the component's minimum doc id. `maxIter` bounds the
    * component diameter: labels settle within `maxIter` propagation rounds
    * plus one quiet confirmation round, and a graph still changing after
    * that throws — loud failure beats silently mislabeled clusters.
    * `checkpointDir` switches the per-round snapshots from localCheckpoint
    * to RELIABLE checkpoints that survive executor loss (the multi-hour
    * 100 TB option — [[Checkpointer]]); unlike [[graft.analytics.GraphOps]]
    * every round still materializes, because the convergence probe needs
    * an action per round anyway.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          checkpointDir: Option[String] = None): DataFrame = {
    val cp = Checkpointer(checkpointDir)
    // symmetrize once: propagation below only follows src -> dst
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = cp.checkpoint(sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label")))
      var round = 0
      var converged = false
      // on ANY failure path (mid-round error, non-convergence throw) the
      // in-flight label snapshot must be released too — only the SUCCESS
      // path hands its final checkpoint to the caller
      def failing[A](body: => A): A =
        try body catch {
          case t: Throwable => cp.free(labels); throw t
        }
      failing {
        // a diameter-d graph changes labels in rounds 1..d and confirms the
        // fixpoint in round d+1, hence the +1 on the cap
        while (!converged && round < maxIter + 1) {
          // merge hints: labels is O(nodes) — unbroadcastable at corpus
          // scale — and checkpointed-plan size estimates undershoot
          // (explode-heavy lineage; see GraphOps.triangleCounts)
          val neighborMin = sym
            .join(labels.select(col("id").as("src"), col("label"))
              .hint("merge"), "src")
            .groupBy(col("dst"))
            .agg(min(col("label")).as("nmin"))
            .select(col("dst").as("id"), col("nmin"))
          val stepped = labels
            .join(neighborMin.hint("merge"), Seq("id"), "left")
            .select(col("id"),
              least(col("label"), coalesce(col("nmin"), col("label")))
                .as("label"),
              coalesce(col("nmin") < col("label"), lit(false)).as("changed"))
          val snap = cp.checkpoint(stepped)
            // materialize: truncates lineage AND makes the convergence
            // count + next round share one pass
          // free the superseded snapshot and hand over BEFORE the
          // convergence probe, so a probe failure releases `snap` (now
          // `labels`) through `failing`, not leaks it
          cp.free(labels)
          labels = snap.drop("changed")
          converged = snap.filter(col("changed")).isEmpty
          round += 1
        }
        if (!converged)
          throw new IllegalStateException(
            s"connectedComponents: labels still changing after ${maxIter + 1} " +
              s"rounds (component diameter exceeds maxIter=$maxIter)")
        labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      }
    } finally sym.unpersist() // labels are checkpointed — safe to drop
  }

  /** Near-duplicate clusters of a (doc_id, text) corpus: n-gram-Jaccard
    * pairs at `threshold` (see [[DedupOps.jaccardPairs]]) resolved into
    * components. Production callers inherit jaccardPairs' maxDf default. */
  def clusterDuplicates(docs: DataFrame, k: Int = 3,
                        maxDf: Option[Int] = Some(DedupOps.DefaultMaxDf),
                        threshold: Double = 0.8): DataFrame =
    connectedComponents(
      DedupOps.jaccardPairs(docs, k, maxDf)
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b")))

  /** q_dedup_cluster — duplicate clusters at 3-gram Jaccard ≥ 0.5 with the
    * component minimum as keeper. `maxDf = None` is the oracle-parity
    * configuration (the DuckDB recompute is unguarded); production callers
    * go through [[clusterDuplicates]]' defaults. */
  def qCluster(spark: SparkSession, sfDir: String): DataFrame =
    clusterDuplicates(Tables.documents(spark, sfDir),
        k = 3, maxDf = None, threshold = 0.5)
      .select(col("cluster_id"), col("doc_id"))
      .orderBy(col("cluster_id"), col("doc_id"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_cluster" -> (qCluster _))

  /** Oracle: same pair generation as q_dedup_ngram, thresholded, then
    * transitive closure by recursive label spread + per-node MIN — textbook
    * recursive-CTE connected components. */
  val oracles: Map[String, String] = Map(
    "q_dedup_cluster" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
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
        |jp AS (
        |  SELECT id_a, id_b FROM pairs
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE ROUND(common / (sa.n_sh + sb.n_sh - common), 6) >= 0.5),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM jp
        |  UNION SELECT id_b, id_a FROM jp),
        |cc(id, lbl) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.id)
        |SELECT MIN(lbl) AS cluster_id, id AS doc_id
        |FROM cc GROUP BY id
        |ORDER BY cluster_id, doc_id""".stripMargin)
}
