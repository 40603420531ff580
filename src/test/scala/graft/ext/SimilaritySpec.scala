package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions.{cosine_sim, dot_product}
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim: hand-checked values, zero-norm safety, null propagation") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),   // identical → 1
      (Array(1f, 0f), Array(0f, 1f)),   // orthogonal → 0
      (Array(1f, 0f), Array(-1f, 0f)),  // opposite → -1
      (Array(0f, 0f), Array(1f, 1f))    // zero norm → 0, not NaN
    ).toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
    assert(got(3) == 0.0)
    val withNull = Seq((Array(1f), null: Array[Float])).toDF("a", "b")
    assert(withNull.select(cosine_sim(col("a"), col("b"))).collect()
      .head.isNullAt(0))
  }

  test("mismatched vector lengths yield NULL, not a prefix score") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    assert(df.select(cosine_sim(col("a"), col("b"))).collect().head.isNullAt(0))
    assert(df.select(dot_product(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("interpreted eval matches codegen for cosine kernel") {
    val df = Tables.embeddings(spark, sf).limit(50)
      .select(col("embedding").as("a"), col("embedding").as("b"))
    // codegen path (default) vs forced interpreted path
    val cg = df.select(cosine_sim(col("a"), col("b")).as("c")).as[Double].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try
      df.select(cosine_sim(col("a"), col("b")).as("c")).as[Double].collect()
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    cg.zip(interp).foreach { case (x, y) => assert(x == y) }
    cg.foreach(c => assert(math.abs(c - 1.0) < 1e-9)) // self-cosine = 1
  }

  test("cosine kernel stays inside whole-stage codegen") {
    val df = Tables.embeddings(spark, sf)
      .select(cosine_sim(col("embedding"), col("embedding")).as("c"))
    // the `*(n)` prefix is executedPlan.toString's marker for a
    // WholeStageCodegen stage containing the projection
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosine_sim"), plan)
  }

  test("ann recall@5 >= 0.6 against brute force on sf0.001") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, emb, 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ann = Similarity.annTopK(queries, emb, 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (brute intersect ann).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("ann candidate set is a strict subset of the corpus (it prunes)") {
    val emb = Tables.embeddings(spark, sf)
    val bucketed = Similarity.hyperplaneBuckets(emb, nPlanes = 8)
    val maxBucket = bucketed.groupBy("bucket").count()
      .agg(max("count")).as[Long].collect().head
    val n = emb.count()
    assert(maxBucket < n / 4, s"largest bucket $maxBucket of $n — not pruning")
  }

  test("LSH fails loudly on embedding dimension mismatch (no silent bucket-0 collapse)") {
    val bad = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      Similarity.hyperplaneBuckets(bad, nPlanes = 8, dim = 64).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("dim=64")), msgs(err).mkString(" | "))
  }

  test("dot_product agrees with sql aggregate reference") {
    val df = Tables.embeddings(spark, sf).limit(20)
    val native = df.select(dot_product(col("embedding"), col("embedding")))
      .as[Double].collect()
    val viaHof = df.select(
      aggregate(zip_with(col("embedding"), col("embedding"), _ * _),
        lit(0.0d), _ + _)).as[Double].collect()
    native.zip(viaHof).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
  }
}
