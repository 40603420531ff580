package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  // Two near-duplicate pairs + unrelated docs. ~60 tokens each so MinHash
  // signatures are stable.
  private lazy val corpus = {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 57).map(i => s"w$i").mkString(" ") + " x1 x2 x3"
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val otherDup = (100 to 160).map(i => s"v$i").mkString(" ")
    Seq((0L, base), (1L, nearDup), (2L, other), (3L, otherDup),
      (4L, (200 to 260).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("exact dedup: identical texts share a keeper, keeper is min id") {
    val res = DedupOps.exactKeepers(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(3L) == 2L) // doc 3 is an exact copy of doc 2
    assert(res(2L) == 2L)
    assert(res(0L) == 0L && res(1L) == 1L) // near-dup is NOT exact-dup
  }

  test("ngram jaccard finds the near-dup pair with high score") {
    val pairs = DedupOps.jaccardPairs(corpus, k = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs((0L, 1L)) > 0.8, s"got ${pairs.get((0L, 1L))}")
    assert(pairs((2L, 3L)) == 1.0)
    assert(!pairs.contains((0L, 2L))) // disjoint docs never materialize
  }

  test("minhash-LSH candidates contain every pair with jaccard >= 0.8") {
    val sigs = DedupOps.minhashSignatures(corpus)
    val cands = DedupOps.minhashCandidates(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val highJaccard = DedupOps.jaccardPairs(corpus, k = 3)
      .filter(col("jaccard") >= 0.8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(highJaccard.nonEmpty)
    assert(highJaccard.subsetOf(cands),
      s"missed: ${highJaccard -- cands}")
  }

  test("simhash: near-dups are close in hamming, unrelated docs are far") {
    val pairs = DedupOps.simhashPairs(DedupOps.simhash(corpus), maxHamming = 64)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs((2L, 3L)) == 0) // identical text → identical simhash
    assert(pairs.get((0L, 1L)).exists(_ <= 16),
      s"near-dup too far: ${pairs.get((0L, 1L))}")
  }

  test("native simhash64 kernel matches the explode/aggregate formulation bit-for-bit") {
    val viaAgg = {
      val tok = corpus.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
        .withColumn("h", xxhash64(col("token")))
      val bitSums = (0 until 64).map { j =>
        sum(when(shiftrightunsigned(col("h"), j).bitwiseAND(1) === 1, 1)
          .otherwise(-1)).as(s"b$j")
      }
      val packed = (0 until 64).map { j =>
        when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L)
      }.reduce(_ + _)
      tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), packed.as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val native = DedupOps.simhash(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == viaAgg)
  }

  test("simhash64: interpreted eval matches codegen") {
    val df = corpus.select(
      graft.functions.VectorFunctions.simhash64(
        TextAnalysis.tokens(col("text"))).as("s"))
    val codegen = df.collect().map(_.getLong(0)).toSeq
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val i = corpus.select(
        graft.functions.VectorFunctions.simhash64(
          TextAnalysis.tokens(col("text"))).as("s"))
        .collect().map(_.getLong(0)).toSeq
      assert(i == codegen)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("maxDf cutoff drops stop-shingle-only pairs (skew control)") {
    // every doc shares the same 5-token prefix → one family of hot shingles
    val hot = "s1 s2 s3 s4 s5 "
    val docs = Seq(
      (0L, hot + (1 to 60).map(i => s"a$i").mkString(" ")),
      (1L, hot + (100 to 160).map(i => s"b$i").mkString(" ")),
      (2L, hot + (200 to 260).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val unfiltered = DedupOps.jaccardPairs(docs, k = 3).count()
    val filtered = DedupOps.jaccardPairs(docs, k = 3, maxDf = Some(2)).count()
    assert(unfiltered == 3)  // all pairs share the hot prefix shingles
    assert(filtered == 0)    // cutoff removes shingles present in >2 docs
  }

  test("jaccardPairs DEFAULT bounds posting lists (stop-shingles can't explode)") {
    // DefaultMaxDf+1 docs all share one hot shingle; each doc's second
    // shingle is unique. Unguarded, the hot posting list alone emits
    // C(1001, 2) ≈ 500k pairs; the default cutoff must drop it entirely.
    val n = DedupOps.DefaultMaxDf + 1
    val docs = (0 until n).map(i => (i.toLong, s"common one two w$i"))
      .toDF("doc_id", "text")
    assert(DedupOps.jaccardPairs(docs).count() == 0)
    // the guard is the default, not a lucky corpus: unguarded DOES explode
    assert(DedupOps.jaccardPairs(docs, maxDf = None).count() == n.toLong * (n - 1) / 2)
  }

  test("decontamination flags exactly the docs sharing a 3-gram with the eval set") {
    val bench = Seq((100L, "benchq", "alpha beta gamma delta"))
      .toDF("doc_id", "source", "text")
    val train = Seq(
      (0L, "web", "alpha beta gamma copied verbatim here"), // shares "alpha beta gamma"
      (1L, "web", "entirely different words in this one ok"),
      (2L, "books", "beta gamma delta also leaked through")  // shares "beta gamma delta"
    ).toDF("doc_id", "source", "text")
    val got = DedupOps.contaminationBySource(train, bench).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("web") == ((2L, 1L, 1L)))   // 2 docs, 1 contaminated, 1 shared
    assert(got("books") == ((1L, 1L, 1L)))
  }

  test("embedding near-dup query returns self-consistent cosine ordering") {
    val res = DedupOps.qEmbedding(spark, sf).collect()
    val cosines = res.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sortBy(-(_: Double))))
    assert(res.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
  }
}
