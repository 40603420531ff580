package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Checkpointer
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** Graph centrality over relational edge lists — PageRank as iterative
  * DataFrame joins. The reference engine has no graph surface (its
  * 228-line pipeline is linear — /root/reference/airflow/dags/
  * weather_etl.py); a training-data pipeline needs link-graph centrality
  * for source weighting (rank domains by citation structure, weight a
  * crawl by authority, seed-expand a curated allowlist).
  *
  * Scale design, per iteration: ONE shuffle family — ranks join onto the
  * out-degree-annotated edge list by src, then a sum aggregate by dst.
  * The edge list is persisted once with its degree annotation and reused
  * every round; ranks are checkpointed every second round (lineage depth
  * ≤ 2 — round N never replays more than one unmaterialized predecessor)
  * and the superseded snapshot's blocks are freed eagerly
  * ([[Checkpointer]], the [[graft.ext.DedupCluster]] discipline). The
  * only driver-side scalar is
  * the node count (the teleport denominator) — one long, computed once.
  * Iteration count is FIXED, not convergence-probed: power iteration's
  * error decays as damping^k regardless of graph size, so k is a quality
  * knob independent of scale, and a fixed k keeps the operator
  * oracle-expressible (k chained CTEs) and free of per-round driver
  * round-trips.
  *
  * Dangling nodes (out-degree 0) contribute no redistributed mass — the
  * standard "removed dangling" simplification; callers who need strict
  * probability conservation symmetrize the edge list (undirected graphs
  * conserve exactly — spec-pinned) or add self-loops.
  */
object GraphOps {

  /** Fixed-iteration PageRank over a directed (src, dst) edge list.
    * Returns (node, rank, rank_n) for node = every distinct src or dst:
    * rank is the teleport-smoothed probability after `iters` rounds of
    * r(v) = (1-d)/N + d * Σ_{u→v} r(u)/outdeg(u); rank_n = rank · N
    * (mean 1.0 — the scale-free form to compare across corpus sizes).
    *
    * Checkpointing: every SECOND round (plus the last) — lineage depth
    * stays bounded at 2 while halving the materialization jobs that
    * dominate the operator's cost on small graphs (the unmaterialized
    * round fuses into the next round's job; total shuffle work is
    * unchanged). `checkpointDir` switches the snapshots from
    * localCheckpoint to RELIABLE checkpoints that survive executor loss —
    * the option a 100 TB multi-hour run wants ([[Checkpointer]]). */
  def pageRank(edges: DataFrame, damping: Double = 0.85,
               iters: Int = 5, checkpointDir: Option[String] = None): DataFrame = {
    require(iters > 0 && damping > 0 && damping < 1,
      s"need iters > 0 and 0 < damping < 1: iters=$iters damping=$damping")
    val cp = Checkpointer(checkpointDir)
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // NO merge hints here, deliberately (the dedup/triangle operators
    // carry them): pagerank's join inputs are persisted AND materialized
    // before any per-round plan is built (`nodes.count()` below), so the
    // InMemoryRelation serves ACCURATE sizes and Catalyst's
    // broadcast-vs-SMJ choice is trustworthy at every scale — unlike the
    // explode-blind estimates that mis-broadcast a 10 GiB pair table.
    // Verified flat at the 10× blowup pre-hint; hinting cost 2 extra
    // shuffles per iteration for nothing.
    val withDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = cp.checkpoint(e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
        // reused every round as the left side
      try {
        val n = nodes.count() // ONE driver scalar: the teleport denominator
        var ranks = cp.checkpoint(nodes.withColumn("rank", lit(1.0 / n)))
        var lastSnap = ranks // most recent MATERIALIZED snapshot
        def failing[A](body: => A): A =
          try body catch {
            case t: Throwable => cp.free(lastSnap); throw t
          }
        failing {
          for (i <- 1 to iters) {
            val contribs = withDeg
              .join(ranks.select(col("node").as("src"), col("rank")), "src")
              .groupBy(col("dst"))
              .agg(sum(col("rank") / col("outdeg")).as("contrib"))
              .select(col("dst").as("node"), col("contrib"))
            // left join from the stable node list: a node with no in-edges
            // keeps the bare teleport share instead of dropping out
            val stepped = nodes
              .join(contribs, Seq("node"), "left")
              .select(col("node"),
                (lit((1 - damping) / n) +
                  lit(damping) * coalesce(col("contrib"), lit(0.0)))
                  .as("rank"))
            if (i % 2 == 0 || i == iters) {
              // checkpoint is eager: materialize the new snapshot, THEN
              // free the superseded one
              ranks = cp.checkpoint(stepped)
              cp.free(lastSnap)
              lastSnap = ranks
            } else ranks = stepped // lineage depth ≤ 2, fused into next job
          }
          ranks.withColumn("rank_n", col("rank") * n)
        }
      } finally cp.free(nodes)
    } finally { withDeg.unpersist(); e.unpersist() }
  }

  /** q_pagerank — authority ranking over the who-buys-from-whom graph:
    * distinct (customer, supplier) trade pairs from lineitem ⋈ orders,
    * symmetrized (undirected trade relation → exact mass conservation),
    * 5 damped iterations, top 20 by normalized rank. Ordering ties are
    * broken on the ROUNDED rank then node id, so the boundary of the
    * top-20 cannot flip on cross-engine float noise. */
  def qPageRank(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("cust"),
        concat(lit("s"), col("l_suppkey")).as("supp"))
      .distinct()
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .union(pairs.select(col("supp").as("src"), col("cust").as("dst")))
    pageRank(edges, damping = 0.85, iters = 5)
      .select(col("node"), round(col("rank_n"), 6).as("rank_n"))
      .orderBy(col("rank_n").desc, col("node"))
      .limit(20)
  }

  /** Per-node triangle counts over an undirected edge list — the
    * degree-ordered ("node-iterator++") formulation every distributed
    * triangle counter uses: orient each edge from its lower-(degree, id)
    * endpoint to the higher, enumerate wedges from the ORIENTED adjacency
    * only, and close them with one join back against the oriented edges.
    * Orientation is the scale trick: out-degree under it is bounded by
    * O(√m) on any graph (a hub's edges point INTO it, so the hub generates
    * no wedges), which caps the wedge table at O(m^1.5) instead of the
    * Σdeg² a naive neighbor self-join pays — on a power-law crawl graph
    * the difference is the job finishing or not. Each triangle is
    * enumerated exactly once (its lowest-order vertex is the wedge
    * center), then exploded to its three corners for per-node counts.
    *
    * The oriented edge table is REFERENCED THREE TIMES downstream (both
    * wedge legs and the closing probe) and its own construction reads the
    * canonical edges twice — pure lazy composition would recompute the
    * caller's whole edge-derivation chain once per reference (the
    * PlanInvariantsSpec shuffle canary measured 53 shuffles against the
    * suite's ceiling of 12 when `edges` is itself a join pipeline), so
    * `ori` is checkpointed once at the diamond point: every downstream
    * branch reads the materialized rows, and `checkpointDir` upgrades the
    * snapshot to a reliable one for multi-hour graphs, exactly as in
    * [[pageRank]]. */
  def triangleCounts(edges: DataFrame,
                     checkpointDir: Option[String] = None): DataFrame = {
    val cp = Checkpointer(checkpointDir)
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // merge hints throughout: every side here is data-dependent and
    // unbounded (deg and the edge list are O(nodes)/O(edges)), and the
    // edge side's size-only estimate is catastrophically LOW when edges
    // derive from an explode-heavy pipeline (explode is invisible to
    // size-only stats — measured: the static planner broadcast a 10 GiB
    // pair graph at a 10× corpus and the job died). Sort-merge finishes
    // at every scale; AQE still localizes the small-sf shuffles.
    val withOrds = canon
      .join(deg.select(col("node").as("a"),
        struct(col("deg"), col("node")).as("ord_a")).hint("merge"), "a")
      .join(deg.select(col("node").as("b"),
        struct(col("deg"), col("node")).as("ord_b")).hint("merge"), "b")
    val ori = cp.checkpoint(withOrds.select(
      when(col("ord_a") < col("ord_b"), col("a")).otherwise(col("b"))
        .as("src"),
      when(col("ord_a") < col("ord_b"), col("b")).otherwise(col("a"))
        .as("dst"),
      when(col("ord_a") < col("ord_b"), col("ord_b")).otherwise(col("ord_a"))
        .as("dst_ord")))
    val e1 = ori.select(col("src").as("n0"), col("dst").as("n1"),
      col("dst_ord").as("ord1"))
    val e2 = ori.select(col("src").as("n0"), col("dst").as("n2"),
      col("dst_ord").as("ord2"))
    val wedges = e1.join(e2.hint("merge"), Seq("n0"))
      .filter(col("ord1") < col("ord2"))
    // the closing edge is oriented n1 → n2 because ord(n1) < ord(n2)
    val closed = wedges.join(
      ori.select(col("src").as("n1"), col("dst").as("n2")).hint("merge"),
      Seq("n1", "n2"))
    closed
      .select(explode(array(col("n0"), col("n1"), col("n2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** q_triangles — triangle counts over the near-dup pair graph
    * ([[graft.ext.DedupOps.jaccardPairs]] at the q_dedup_cluster
    * threshold): a node's triangle count separates COHESIVE duplicate
    * cliques (every member pairs with every other) from chained false
    * positives (A~B~C where A≁C), which is exactly the judgment a dedup
    * reviewer makes before condemning a cluster. maxDf = None is the
    * oracle-parity configuration, as in q_dedup_cluster. */
  def qTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = graft.ext.DedupOps
      .jaccardPairs(Tables.documents(spark, sfDir), k = 3, maxDf = None)
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    triangleCounts(edges)
      .select(col("node").as("doc_id"), col("n_tri"))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (qPageRank _),
    "q_triangles" -> (qTriangles _))

  /** DuckDB twin: the same edge construction and 5 unrolled power
    * iterations as chained CTEs (recursive CTEs can't re-aggregate per
    * step). Every node appears as src after symmetrization, so the node
    * list and the left-join base case match the Spark side exactly. */
  val oracles: Map[String, String] = Map(
    "q_pagerank" -> {
      // bit-identical coefficients on both engines: Spark computes the
      // teleport term as (1 - damping) in driver double arithmetic
      // (0.15000000000000002, not 0.15) — emit the oracle constants from
      // the SAME doubles, cast to DOUBLE so DuckDB doesn't parse the long
      // literal as DECIMAL and change the arithmetic
      val damping = 0.85
      val tel = s"CAST(${(1 - damping).toString} AS DOUBLE)"
      val d = s"CAST(${damping.toString} AS DOUBLE)"
      val step = (k: Int) =>
        s"""r$k AS (
           |  SELECT nd.node,
           |         ($tel / (SELECT n FROM nn)) + $d * coalesce(c.contrib, 0.0) AS rank
           |  FROM nodes nd LEFT JOIN (
           |    SELECT e.dst AS node, sum(r.rank / d.outdeg) AS contrib
           |    FROM edges e
           |    JOIN r${k - 1} r ON e.src = r.node
           |    JOIN deg d ON e.src = d.src
           |    GROUP BY e.dst) c ON nd.node = c.node)""".stripMargin
      s"""WITH pairs AS (
         |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cust,
         |                  's' || CAST(l_suppkey AS VARCHAR) AS supp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (
         |  SELECT cust AS src, supp AS dst FROM pairs
         |  UNION ALL
         |  SELECT supp AS src, cust AS dst FROM pairs),
         |nodes AS (
         |  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |r0 AS (
         |  SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
         |  FROM nodes),
         |${(1 to 5).map(step).mkString(",\n")}
         |SELECT node,
         |       ROUND(rank * (SELECT n FROM nn), 6) AS rank_n
         |FROM r5
         |ORDER BY rank_n DESC, node
         |LIMIT 20""".stripMargin
    },
    // same pair generation as q_dedup_cluster's oracle (unguarded, 3-gram
    // Jaccard >= 0.5), then the textbook per-node triple join over the
    // symmetrized edge list — each triangle contributes once per corner
    "q_triangles" ->
      """WITH toks AS (
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
        |ed AS (
        |  SELECT id_a AS u, id_b AS v FROM jp
        |  UNION SELECT id_b, id_a FROM jp)
        |SELECT e1.u AS doc_id, COUNT(*) AS n_tri
        |FROM ed e1
        |JOIN ed e2 ON e1.u = e2.u AND e1.v < e2.v
        |JOIN ed e3 ON e3.u = e1.v AND e3.v = e2.v
        |GROUP BY e1.u
        |ORDER BY doc_id""".stripMargin)
}
