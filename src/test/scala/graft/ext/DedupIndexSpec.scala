package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Landed MinHash index: serving must equal a from-scratch recompute, the
  * landed side must never shuffle, and the append loop must keep the index
  * current. */
class DedupIndexSpec extends SparkSpec {

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
  private lazy val landed = docs.filter(col("doc_id") % 2 === 0)
  private lazy val fresh = docs.filter(col("doc_id") % 2 === 1)

  private lazy val indexDir: String = {
    val dir = tmpDir("mhidx_spec")
    DedupIndex.writeIndex(landed, dir)
    dir
  }

  test("index artifact lands meta + sigs + all-band postings") {
    val meta = DedupIndex.readMeta(spark, indexDir)
    assert(meta == DedupIndex.Meta(3, 64, 16, 4))
    val sigs = spark.read.parquet(s"$indexDir/sigs")
    assert(sigs.count() == landed.count())
    assert(sigs.head().getAs[scala.collection.Seq[Long]]("sig").length == 64)
    val bands = spark.read.parquet(s"$indexDir/postings")
      .select("band").distinct().count()
    assert(bands == 16)
  }

  test("serving equals a from-scratch recompute on the union corpus") {
    // ground truth: full-corpus LSH candidates restricted to cross-half
    // pairs, verified by the same signature-agreement estimate
    val sigs = DedupOps.minhashSignatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cross = DedupOps.minhashCandidates(sigs)
      .filter((col("id_a") % 2 === 0) =!= (col("id_b") % 2 === 0))
    val sigsA = sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val sigsB = sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val est = cross.join(sigsA, "id_a").join(sigsB, "id_b")
      .withColumn("est", aggregate(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / 64)
    val expectedCondemned = est.filter(col("est") >= 0.5)
      .select(when(col("id_a") % 2 === 1, col("id_a")).otherwise(col("id_b"))
        .as("doc_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    sigs.unpersist(blocking = false)

    val served = DedupIndex.dedupAgainstIndex(fresh, indexDir, 0.5)
    val keptIds = served.select("doc_id").collect().map(_.getLong(0)).toSet
    val freshIds = fresh.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == freshIds -- expectedCondemned,
      s"landed-index serving diverged from recompute: " +
        s"extra=${keptIds -- (freshIds -- expectedCondemned)} " +
        s"missing=${(freshIds -- expectedCondemned) -- keptIds}")
    assert(expectedCondemned.nonEmpty,
      "fixture must actually exercise the condemn path")
  }

  test("landed postings join broadcasts the NEW side (landed never shuffles)") {
    val plan = DedupIndex.candidatesAgainstIndex(fresh, indexDir, 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only exchanges allowed are broadcasts of the new side and the
    // candidate distinct; no shuffle may carry the landed postings/sigs
    val shuffles = "ShuffleExchange".r.findAllIn(plan).size
    assert(shuffles <= 2, s"landed side appears to shuffle:\n$plan")
  }

  test("append keeps the index current: re-served batch dedups against itself") {
    val dir = tmpDir("mhidx_append")
    DedupIndex.writeIndex(landed, dir)
    val kept = DedupIndex.dedupAgainstIndex(fresh, dir, 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    kept.count()
    DedupIndex.appendToIndex(kept, dir)
    // serving the SAME batch again must now condemn every doc (each kept
    // doc collides with its own landed signature at est-J = 1.0)
    val again = DedupIndex.dedupAgainstIndex(kept, dir, 0.5)
    assert(again.count() == 0,
      "after append, re-serving the same docs must find them landed")
    kept.unpersist(blocking = false)
  }
}
