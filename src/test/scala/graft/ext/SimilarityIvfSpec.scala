package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SimilarityIvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val centroids = SimilarityIvf.train(emb, nList = 16, nIters = 2)
  private lazy val indexed = SimilarityIvf.index(emb, centroids)

  test("index assigns every vector to exactly one inverted list") {
    assert(indexed.count() == emb.count())
    assert(indexed.select("vec_id").distinct().count() == emb.count())
    val nLists = indexed.select("list_id").distinct().count()
    assert(nLists > 1 && nLists <= 16, s"lists=$nLists")
  }

  test("probing fewer lists scans fewer candidates (the pruning exists)") {
    val q = emb.filter($"vec_id" < 5)
    def candidates(nProbe: Int): Long =
      SimilarityIvf.topK(q, indexed, centroids, k = 1000000, nProbe = nProbe)
        .count()
    val narrow = candidates(2)
    val wide = candidates(12)
    assert(narrow < wide, s"narrow=$narrow wide=$wide")
    assert(wide <= 5L * emb.count())
  }

  test("landed index: train→write→load→serve returns identical top-k") {
    val dir = tmpDir("ivf-index")
    SimilarityIvf.writeIndex(indexed, centroids, dir)
    val q = emb.filter($"vec_id" < 10)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"rank", $"vec_id", round($"score", 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val inMem = key(SimilarityIvf.topK(q, indexed, centroids, 5, nProbe = 6))
    val served = key(SimilarityIvf.serveTopK(q, dir, 5, nProbe = 6))
    assert(served == inMem)
  }

  test("serve path prunes the scan to the probed partitions") {
    val dir = tmpDir("ivf-prune")
    SimilarityIvf.writeIndex(indexed, centroids, dir)
    val q = emb.filter($"vec_id" === 0)
    val plan = SimilarityIvf.serveTopK(q, dir, 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    // the probe set must reach the file scan as a partition filter so only
    // the probed list directories are read
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      plan)
    val (lists, cents) = SimilarityIvf.loadIndex(spark, dir)
    assert(cents.count() == centroids.count())
    assert(lists.count() == emb.count())
  }

  test("incremental append: new batch is served without retraining") {
    val dir = tmpDir("ivf-append")
    val old = emb.filter($"vec_id" >= 10)
    val fresh = emb.filter($"vec_id" < 10)
    SimilarityIvf.writeIndex(
      SimilarityIvf.index(old, centroids), centroids, dir)
    SimilarityIvf.appendToIndex(fresh, dir)
    val (lists, _) = SimilarityIvf.loadIndex(spark, dir)
    assert(lists.count() == emb.count())
    // a landed-then-appended index must answer exactly like one built over
    // the full corpus in memory (same centroids → same assignments)
    val q = emb.filter($"vec_id" >= 10 && $"vec_id" < 15)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"rank", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val served = key(SimilarityIvf.serveTopK(q, dir, 5, nProbe = 16))
    val inMem = key(SimilarityIvf.topK(q, indexed, centroids, 5, nProbe = 16))
    assert(served == inMem)
  }

  test("loaded index serves semantic dedup without retraining") {
    val dir = tmpDir("ivf-semdedup")
    SimilarityIvf.writeIndex(indexed, centroids, dir)
    val (lists, _) = SimilarityIvf.loadIndex(spark, dir)
    val fromArtifact = SemDedup.semDedupIndexed(lists, threshold = 0.3)
      .select("vec_id").as[Long].collect().toSet
    val fromMemory = SemDedup.semDedupIndexed(indexed, threshold = 0.3)
      .select("vec_id").as[Long].collect().toSet
    assert(fromArtifact == fromMemory && fromMemory.nonEmpty)
  }

  test("recall@5 with wide probe beats narrow probe and is sane") {
    val q = emb.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(q, emb, 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    def recall(nProbe: Int): Double = {
      val got = SimilarityIvf.topK(q, indexed, centroids, 5, nProbe).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val r2 = recall(2); val r12 = recall(12)
    assert(r12 >= r2, s"recall(12)=$r12 < recall(2)=$r2")
    // isotropic-noise corpus: full probe (16/16) must recover brute force
    assert(recall(16) >= 0.99, s"full-probe recall=${recall(16)}")
  }
}
