package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  private def edges(ps: (Long, Long)*): DataFrame =
    ps.toDF("id_a", "id_b")

  private def components(df: DataFrame): Map[Long, Long] =
    DedupCluster.connectedComponents(df)
      .as[(Long, Long)].collect().toMap

  test("two components, transitive within each") {
    // 1-2, 2-3 chain plus a separate 4-5 pair: {1,2,3} and {4,5}
    val cc = components(edges(1L -> 2L, 2L -> 3L, 4L -> 5L))
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("long path needs multiple propagation rounds") {
    // diameter-7 path: min label must walk the whole chain
    val path = (1L to 7L).sliding(2).map(s => s.head -> s.last).toSeq
    val cc = components(edges(path: _*))
    assert(cc.values.toSet === Set(1L))
    assert(cc.keySet === (1L to 7L).toSet)
  }

  test("edge direction and duplicates don't matter") {
    val cc = components(edges(9L -> 2L, 2L -> 9L, 9L -> 2L, 5L -> 9L))
    assert(cc === Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("diameter exactly maxIter converges (confirmation round is extra)") {
    // 1-2-3-4: diameter 3; label 1 reaches node 4 in round 3, round 4 confirms
    val path = (1L to 4L).sliding(2).map(s => s.head -> s.last).toSeq
    val cc = DedupCluster.connectedComponents(edges(path: _*), maxIter = 3)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet === Set(1L))
  }

  test("non-convergence within maxIter fails loudly") {
    val path = (1L to 9L).sliding(2).map(s => s.head -> s.last).toSeq
    val e = intercept[IllegalStateException] {
      DedupCluster.connectedComponents(edges(path: _*), maxIter = 2).collect()
    }
    assert(e.getMessage.contains("still changing"))
  }

  test("clusterDuplicates groups near-identical texts and only those") {
    // 0/1/2 are single-token-edited copies (a mid-token edit kills 3 of the
    // 18 3-grams -> J(0,1) = J(0,2) = 15/21 = 0.71 > 0.5, connecting all
    // three through doc 0); 3 and 4 are unrelated
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (0L, base),
      (1L, base.replace("epsilon", "EPS")),
      (2L, base.replace("kappa", "KAP")),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "uno dos tres cuatro cinco seis siete ocho nueve diez"))
      .toDF("doc_id", "text")
    val cc = DedupCluster.clusterDuplicates(docs, threshold = 0.5)
      .as[(Long, Long)].collect().toMap
    // 3 and 4 share no shingle with anything: no candidate pair, absent
    assert(cc === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("q_dedup_cluster is deterministic with keeper = component minimum") {
    val out = DedupCluster.qCluster(spark, sf)
    val rows = out.as[(Long, Long)].collect()
    assert(rows.sameElements(rows.sortBy(r => (r._1, r._2))))
    // every cluster_id is itself a member row, and is that cluster's min
    val byCluster = rows.groupBy(_._1)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._2).min === cid)
    }
    // second run identical (propagation order can't leak into the result)
    assert(DedupCluster.qCluster(spark, sf).as[(Long, Long)].collect()
      .sameElements(rows))
  }
}
