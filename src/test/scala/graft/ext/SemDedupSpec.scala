package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("duplicateIds: smaller-id neighbor above threshold condemns, cluster boundary protects") {
    // cluster 0: ids 1,2 identical (2 condemned), id 3 orthogonal (kept)
    // cluster 1: id 4 identical to id 1 but in another cluster → kept
    val indexed = Seq(
      (1L, vec(1, 0), 0), (2L, vec(1, 0), 0), (3L, vec(0, 1), 0),
      (4L, vec(1, 0), 1)).toDF("vec_id", "embedding", "list_id")
    val dups = SemDedup.duplicateIds(indexed, threshold = 0.9)
      .as[Long].collect().toSet
    assert(dups == Set(2L))
  }

  test("chain semantics are greedy-by-id, not transitive-closure") {
    // cos(a,b) ≈ .95, cos(b,c) ≈ .95, cos(a,c) ≈ .81 < τ: b condemned by a,
    // c condemned by b even though b itself is removed (greedy marking)
    val a = vec(1, 0)
    val b = vec(math.cos(0.32), math.sin(0.32))
    val c = vec(math.cos(0.64), math.sin(0.64))
    val indexed = Seq((1L, a, 0), (2L, b, 0), (3L, c, 0))
      .toDF("vec_id", "embedding", "list_id")
    val dups = SemDedup.duplicateIds(indexed, threshold = 0.9)
      .as[Long].collect().toSet
    assert(dups == Set(2L, 3L))
  }

  test("kept set is pairwise <= threshold within every cluster (testdata)") {
    val tau = 0.3
    val emb = Tables.embeddings(spark, sf)
    val kept = SemDedup.semDedup(emb, nList = 8, nIters = 2, threshold = tau)
      .select(col("list_id"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])].collect()
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      val nx = math.sqrt(x.map(p => p.toDouble * p).sum)
      val ny = math.sqrt(y.map(p => p.toDouble * p).sum)
      d / (nx * ny)
    }
    for {
      (_, members) <- kept.groupBy(_._1)
      Array(u, v) <- members.combinations(2).map(_.toArray)
    } assert(cos(u._3, v._3) <= tau + 1e-9,
      s"kept pair ${u._2},${v._2} above threshold")
    // and the pass removed at least something at this threshold
    assert(kept.length < emb.count())
  }

  test("every removed vector has a smaller-id cluster-mate above threshold") {
    val tau = 0.3
    val emb = Tables.embeddings(spark, sf)
    val centroids = SimilarityIvf.train(emb, nList = 8, nIters = 2)
    val indexed = SimilarityIvf.index(emb, centroids)
    val all = indexed.select(col("list_id"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])].collect()
    val removed = SemDedup.duplicateIds(indexed, tau).as[Long].collect().toSet
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      d / (math.sqrt(x.map(p => p.toDouble * p).sum) *
        math.sqrt(y.map(p => p.toDouble * p).sum))
    }
    val byList = all.groupBy(_._1)
    removed.foreach { id =>
      val me = all.find(_._2 == id).get
      assert(byList(me._1).exists(o => o._2 < id && cos(o._3, me._3) > tau),
        s"removed $id has no condemning neighbor")
    }
  }

  test("q_dedup_semantic: per-cluster accounting is consistent") {
    val rows = SemDedup.qSemantic(spark, sf)
      .as[(Int, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 >= 0 && r._3 <= r._2))
    assert(rows.map(_._2).sum == Tables.embeddings(spark, sf).count())
  }
}
