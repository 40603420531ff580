package graft.functions

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class TopKAggregateSpec extends SparkSpec {

  private def direct(agg: TopKByScoreAgg,
                     rows: Seq[(Double, Long)]): Seq[(Double, Long)] =
    agg.finish(rows.foldLeft(agg.zero)(agg.reduce))

  test("buffer never exceeds k entries on any reduce path") {
    val agg = new TopKByScoreAgg(4)
    var b = agg.zero
    val rnd = new Random(7)
    (1 to 1000).foreach { i =>
      b = agg.reduce(b, (rnd.nextDouble() * 100, i.toLong))
      assert(b.scores.length <= 4 && b.ids.length == b.scores.length)
    }
  }

  test("merge of arbitrary splits equals the single-pass result") {
    val agg = new TopKByScoreAgg(5)
    val rnd = new Random(11)
    val rows = (1L to 300L).map(i => (rnd.nextInt(40).toDouble, i))
    val expected = direct(agg, rows)
    Seq(17, 100, 250).foreach { cut =>
      val (a, b) = rows.splitAt(cut)
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(ba, bb)) == expected)
      val ba2 = a.foldLeft(agg.zero)(agg.reduce)
      val bb2 = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bb2, ba2)) == expected)
    }
  }

  test("groups smaller than k return every member, score-desc ordered") {
    val agg = new TopKByScoreAgg(10)
    val rows = Seq((2.0, 2L), (9.0, 1L), (5.0, 3L))
    assert(direct(agg, rows) == Seq((9.0, 1L), (5.0, 3L), (2.0, 2L)))
  }

  test("ties on score break by smaller id") {
    val agg = new TopKByScoreAgg(2)
    assert(direct(agg, Seq((7.0, 9L), (7.0, 3L), (7.0, 7L))) ==
      Seq((7.0, 3L), (7.0, 7L)))
  }

  test("NaN scores are skipped") {
    val agg = new TopKByScoreAgg(3)
    assert(direct(agg, Seq((Double.NaN, 1L), (2.0, 2L))) == Seq((2.0, 2L)))
  }

  test("udaf end-to-end matches the row_number window formulation") {
    val topk = udaf(new TopKByScoreAgg(3))
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"))
    val viaAgg = ev.groupBy(col("event_type"))
      .agg(topk(col("value"), col("event_id")).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("event_type"), (col("p") + 1).as("rk"),
        col("t._1").as("value"), col("t._2").as("event_id"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val viaWindow = ev
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("value"), col("event_id"))
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }

  test("the aggregation partial-aggregates map-side (no group-wide sort)") {
    val topk = udaf(new TopKByScoreAgg(3))
    val plan = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(topk(col("value"), col("event_id")).as("top"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs twice: a partial before the exchange and a
    // final after — the window formulation would instead Sort the whole
    // group through the shuffle.
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }
}
