package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorAggregates.vector_mean
import graft.sources.Tables

class VectorAggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("vector_mean matches the collect_list/HOF reference, any partitioning") {
    val emb = Tables.embeddings(spark, sf)
    val dim = 64
    val zeros = array((0 until dim).map(_ => lit(0.0d)): _*)
    def byLabel(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("label"))
      .agg(vector_mean(col("embedding")).as("m"))
      .collect().map(r => r.get(0).toString -> r.getSeq[Float](1)).toMap
    val reference = emb.groupBy(col("label"))
      .agg(aggregate(collect_list(col("embedding")), zeros,
        (acc, v) => zip_with(acc, v, (a, b) => a + b)).as("sums"),
        count(lit(1)).as("cnt"))
      .select(col("label"),
        transform(col("sums"), s => (s / col("cnt")).cast("float")).as("m"))
      .collect().map(r => r.get(0).toString -> r.getSeq[Float](1)).toMap
    val agg1 = byLabel(emb)
    val agg7 = byLabel(emb.repartition(7))
    assert(agg1.keySet == reference.keySet)
    for (k <- reference.keySet; i <- 0 until dim) {
      assert(math.abs(agg1(k)(i) - reference(k)(i)) < 1e-5f,
        s"label $k dim $i: ${agg1(k)(i)} vs ${reference(k)(i)}")
      assert(math.abs(agg7(k)(i) - agg1(k)(i)) < 1e-5f,
        s"partitioning changed label $k dim $i")
    }
  }

  test("vector_mean fails loudly on mismatched dimensions") {
    val bad = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("id", "embedding").coalesce(1)
    val err = intercept[Exception] {
      bad.agg(vector_mean(col("embedding"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("vector_mean")), msgs(err))
  }

  test("null vectors are skipped like built-in aggregates") {
    val mixed = Seq((1L, Some(Seq(2.0f, 4.0f))), (2L, None),
      (3L, Some(Seq(4.0f, 8.0f))))
      .toDF("id", "embedding")
    val got = mixed.agg(vector_mean(col("embedding"))).collect()(0)
      .getSeq[Float](0)
    assert(got == Seq(3.0f, 6.0f), got.toString)
  }
}
