package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of key=1 (hot), sprinkle of other keys
  private lazy val big = ((1 to 10000).map(i => (1L, i.toLong)) ++
    (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong))).toDF("k", "payload")
  private lazy val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
    (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "tag")

  test("salted join returns exactly the plain-join result") {
    val plain = big.join(small, "k").orderBy("k", "payload", "tag").collect()
    val salted = Salting.saltedJoin(big, small, "k", factor = 8)
      .select(big.columns.map(col) :+ col("tag"): _*)
      .orderBy("k", "payload", "tag").collect()
    assert(salted.sameElements(plain))
  }

  test("salt spreads the hot key over the full factor range") {
    val salts = big.filter($"k" === 1L)
      .select(Salting.rowSalt(big, 8).as("s"))
      .distinct().as[Int].collect().sorted
    assert(salts.length == 8, s"only salts ${salts.mkString(",")}")
  }

  test("salt is deterministic across evaluations (retry-safe)") {
    val s1 = big.select(Salting.rowSalt(big, 8)).as[Int].collect()
    val s2 = big.select(Salting.rowSalt(big, 8)).as[Int].collect()
    assert(s1.sameElements(s2))
  }
}
