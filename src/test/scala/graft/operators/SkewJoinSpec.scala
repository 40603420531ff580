package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  // constructed skew: one key carries 90% of the rows
  private def skewed = {
    import spark.implicits._
    ((1L to 900L).map(i => ("hot", i)) ++
      (901L to 1000L).map(i => (s"cold${i % 10}", i)))
      .toDF("k", "id")
  }

  private def dim = {
    import spark.implicits._
    (Seq(("hot", 1)) ++ (0 until 10).map(i => (s"cold$i", i + 2)))
      .toDF("k", "v")
  }

  test("salted join returns exactly the plain-join rows") {
    val plain = skewed.join(dim, "k").select(col("id"), col("v"))
    val salted = SkewJoin.saltedJoin(skewed, "k", dim, "k",
        saltFrom = col("id"), nSalts = 8)
      .select(col("id"), col("v"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    assert(salted.count() == plain.count()) // multiplicity, not just set equality
  }

  test("the hot key is spread across multiple salt values") {
    val nSaltsUsed = skewed
      .withColumn("salt", pmod(hash(col("id")), lit(8)))
      .filter(col("k") === "hot")
      .select(col("salt")).distinct().count()
    assert(nSaltsUsed == 8, s"expected all 8 salts on the hot key, got $nSaltsUsed")
  }

  test("join keys include the salt, so reducers partition by (key, salt)") {
    val plan = SkewJoin.saltedJoin(skewed, "k",
        dim.hint("shuffle_hash"), "k", saltFrom = col("id"), nSalts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt_b"), plan)
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      plan)
  }

  test("build side replicates exactly nSalts times") {
    import spark.implicits._
    val d = dim.withColumn("__salt_d", explode(lit((0 until 8).toArray)))
    assert(d.count() == dim.count() * 8)
    // and the salted join's dedup-free inner semantics keep multiplicity 1
    val joined = SkewJoin.saltedJoin(skewed, "k", dim, "k",
      saltFrom = col("id"), nSalts = 8)
    assert(joined.groupBy(col("id")).count().filter(col("count") > 1)
      .isEmpty)
  }

  test("deterministic salt: two runs produce identical row sets") {
    val a = SkewJoin.saltedJoin(skewed, "k", dim, "k", col("id"), 4)
      .select(col("id"), col("v"))
    val b = SkewJoin.saltedJoin(skewed, "k", dim, "k", col("id"), 4)
      .select(col("id"), col("v"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
