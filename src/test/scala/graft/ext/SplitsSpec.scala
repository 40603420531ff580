package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic split assignment + quality binning invariants. */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.documents(spark, sf)

  test("split assignment is deterministic and repartition-invariant") {
    val a = Splits.assignSplit(docs, "doc_id")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.assignSplit(docs.repartition(17), "doc_id")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "assignment must depend on the key alone, not layout")
    assert(a.values.toSet == Set("train", "val", "test"))
  }

  test("split fractions land near the configured 80/10/10") {
    val n = docs.count().toDouble
    val byCounts = Splits.assignSplit(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 is uniform; at n≈500 a ±8pp band is 4+ sigma
    assert(math.abs(byCounts("train") / n - 0.80) < 0.08)
    assert(math.abs(byCounts("val") / n - 0.10) < 0.08)
    assert(math.abs(byCounts("test") / n - 0.10) < 0.08)
  }

  test("splits are disjoint and exhaustive (every doc exactly one split)") {
    val assigned = Splits.assignSplit(docs, "doc_id")
    assert(assigned.count() == docs.count())
    assert(assigned.filter(col("split").isNull).count() == 0)
  }

  test("invalid thresholds are rejected loudly") {
    intercept[IllegalArgumentException] {
      Splits.assignSplit(docs, "doc_id", trainHi = 300, valHi = 301)
    }
    intercept[IllegalArgumentException] {
      Splits.assignSplit(docs, "doc_id", trainHi = 100, valHi = 50)
    }
  }

  test("quality bins are fixed-width, bounded 0..9; score 1.0 folds into 9") {
    val binned = TextAnalysis.withQualityScore(
        TextAnalysis.withFeatures(docs))
      .withColumn("bin", Splits.qualityBin(col("quality_score")))
    val range = binned.agg(min("bin"), max("bin")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) <= 9)
    val top = Seq(1.0).toDF("s")
      .select(Splits.qualityBin(col("s"))).head().getInt(0)
    assert(top == 9)
  }

  test("bin assignment is map-side: only the bounded rollup shuffles") {
    val plan = Splits.qQualityBins(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2,
      s"expected only the rollup (+sort) exchange, got:\n$plan")
  }
}
