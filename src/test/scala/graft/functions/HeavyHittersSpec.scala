package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: item i appears ~N/i times — a few heavy items over a
    * long tail, the shape SpaceSaving exists for. */
  private def zipf(nItems: Int, n: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    val weights = (1 to nItems).map(1.0 / _)
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    (1 to n).map { _ =>
      val u = rnd.nextDouble()
      s"item${cum.indexWhere(u <= _) + 1}"
    }
  }

  test("buffer never exceeds capacity") {
    val agg = new SpaceSavingAgg(8)
    var b = agg.zero
    zipf(100, 2000, 1).foreach { it =>
      b = agg.reduce(b, it)
      assert(b.items.length <= 8)
    }
  }

  test("exact when capacity >= distinct items (no eviction ever)") {
    val agg = new SpaceSavingAgg(16)
    val stream = zipf(10, 5000, 2)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    assert(out.map(t => t._1 -> t._2).toMap == truth)
    assert(out.forall(_._3 == 0L)) // zero overestimation
  }

  test("under pressure: counts within n/capacity, heavy items present") {
    val cap = 16
    val stream = zipf(200, 10000, 3)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = new SpaceSavingAgg(cap)
    val out = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    val bound = stream.size.toLong / cap
    out.foreach { case (it, c, err) =>
      val t = truth(it)
      assert(c >= t, s"$it reported $c < true $t (never underestimates)")
      assert(c - t <= bound, s"$it overestimate ${c - t} > n/cap $bound")
      assert(err <= bound)
    }
    // guarantee: anything with true count > n/capacity is tracked
    val mustHave = truth.filter(_._2 > bound).keySet
    assert(mustHave.subsetOf(out.map(_._1).toSet),
      s"missing ${mustHave -- out.map(_._1).toSet}")
  }

  test("merged partial summaries keep both guarantees") {
    val cap = 16
    val stream = zipf(200, 12000, 4)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = new SpaceSavingAgg(cap)
    // four splits reduced independently then merged — the shuffle shape
    val merged = stream.grouped(3000)
      .map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    val out = agg.finish(merged)
    val bound = stream.size.toLong / cap
    out.foreach { case (it, c, _) =>
      assert(c >= truth(it))
      // merged error bound: sum of per-part mins ≤ n/cap overall still
      // holds for SpaceSaving merges (Agarwal et al. Thm 5.1)
      assert(c - truth(it) <= bound, s"$it over by ${c - truth(it)} > $bound")
    }
    val mustHave = truth.filter(_._2 > bound).keySet
    assert(mustHave.subsetOf(out.map(_._1).toSet))
  }

  test("udaf end-to-end: per-group exact top-1 on a low-card column") {
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "c"), ("g2", "d"), ("g2", "d"), ("g2", "d"))
      .toDF("g", "item")
    val hh = udaf(new SpaceSavingAgg(8))
    val top = df.groupBy(col("g")).agg(hh(col("item")).as("s"))
      .select(col("g"), col("s")(0).getField("_1").as("top"),
        col("s")(0).getField("_2").as("cnt"))
      .orderBy(col("g"))
      .as[(String, String, Long)].collect().toSeq
    assert(top == Seq(("g1", "a", 2L), ("g2", "d", 3L)))
  }
}
