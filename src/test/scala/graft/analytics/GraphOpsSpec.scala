package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], damping: Double = 0.85,
                    iters: Int = 5): Map[String, Double] =
    GraphOps.pageRank(edges.toDF("src", "dst"), damping, iters)
      .select(col("node"), col("rank"))
      .as[(String, Double)].collect().toMap

  test("two-node symmetric graph is the uniform fixpoint at any k") {
    for (k <- Seq(1, 5)) {
      val r = ranks(Seq("a" -> "b", "b" -> "a"), iters = k)
      assert(math.abs(r("a") - 0.5) < 1e-12 && math.abs(r("b") - 0.5) < 1e-12)
    }
  }

  test("one directed iteration matches the hand-computed formula") {
    // a -> b, a -> c: outdeg(a)=2; after 1 round with d=0.85, N=3
    // b,c: 0.15/3 + 0.85*(1/3)/2 ; a (no in-edges): 0.15/3
    val r = ranks(Seq("a" -> "b", "a" -> "c"), iters = 1)
    assert(math.abs(r("a") - 0.05) < 1e-12)
    assert(math.abs(r("b") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(r("b") == r("c"))
  }

  test("symmetric star: center outranks leaves; mass conserves exactly") {
    val half = Seq("a" -> "b", "a" -> "c", "a" -> "d")
    val r = ranks(half ++ half.map(_.swap))
    assert(r("a") > r("b") && r("b") == r("c") && r("c") == r("d"))
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // undirected: no dangling leak
  }

  test("dangling sink keeps teleport share and drains nothing back") {
    // b has no out-edges: its mass is dropped (documented simplification),
    // so the total dips below 1 while b still holds teleport + inflow
    val r = ranks(Seq("a" -> "b"), iters = 3)
    assert(r("b") > r("a"))
    assert(r.values.sum < 1.0)
  }

  test("reliable-checkpoint mode returns ranks identical to local mode") {
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a")
      .toDF("src", "dst")
    def run(dir: Option[String]) =
      GraphOps.pageRank(edges, damping = 0.85, iters = 5, checkpointDir = dir)
        .select(col("node"), col("rank"))
        .as[(String, Double)].collect().toMap
    val local = run(None)
    val reliable = run(Some(tmpDir("pr-ckpt")))
    assert(local == reliable) // bit-identical: same plan, different snapshots
  }

  test("connected components agree across checkpoint modes") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    def run(dir: Option[String]) =
      graft.ext.DedupCluster.connectedComponents(edges, checkpointDir = dir)
        .as[(Long, Long)].collect().toSet
    val expect = Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
    assert(run(None) == expect)
    assert(run(Some(tmpDir("cc-ckpt"))) == expect)
  }

  test("q_pagerank: 20 rows, normalized ranks positive, deterministic") {
    val df = GraphOps.qPageRank(spark, sf)
    val rows = df.as[(String, Double)].collect().toSeq
    assert(rows.length == 20)
    assert(rows.forall(_._2 > 0))
    assert(rows == rows.sortBy(r => (-r._2, r._1)))
    val again = GraphOps.qPageRank(spark, sf).as[(String, Double)].collect().toSeq
    assert(rows == again)
  }
}
