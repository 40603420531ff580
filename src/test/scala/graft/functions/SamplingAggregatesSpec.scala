package graft.functions

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SamplingAggregatesSpec extends SparkSpec {

  private def direct(agg: BottomKByHashAgg,
                     rows: Seq[(String, Long)]): Seq[Long] =
    agg.finish(rows.foldLeft(agg.zero)(agg.reduce))

  test("buffer never exceeds k entries on any reduce path") {
    val agg = new BottomKByHashAgg(4)
    var b = agg.zero
    val rnd = new Random(7)
    (1 to 1000).foreach { i =>
      b = agg.reduce(b, (f"${rnd.nextInt(100000)}%06d", i.toLong))
      assert(b.hashes.length <= 4 && b.ids.length == b.hashes.length)
    }
  }

  test("merge of arbitrary splits equals the single-pass result") {
    val agg = new BottomKByHashAgg(5)
    val rnd = new Random(11)
    val rows = (1L to 300L).map(i => (f"${rnd.nextInt(1000)}%04d", i))
    val expected = direct(agg, rows)
    // three random split points, merged pairwise in both associativity orders
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

  test("groups smaller than k return every member, hash-ordered") {
    val agg = new BottomKByHashAgg(10)
    val rows = Seq(("bb", 2L), ("aa", 1L), ("cc", 3L))
    assert(direct(agg, rows) == Seq(1L, 2L, 3L))
  }

  test("ties on hash break by id") {
    val agg = new BottomKByHashAgg(2)
    assert(direct(agg, Seq(("x", 9L), ("x", 3L), ("x", 7L))) == Seq(3L, 7L))
  }

  test("null hashes are skipped like built-in aggregates") {
    val agg = new BottomKByHashAgg(3)
    assert(direct(agg, Seq((null, 1L), ("a", 2L))) == Seq(2L))
  }

  test("udaf end-to-end matches the row_number window formulation") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), md5(col("doc_id").cast("string")).as("h"),
        col("doc_id"))
    val sampler = udaf(new BottomKByHashAgg(6))
    val viaAgg = docs.groupBy(col("lang"))
      .agg(sampler(col("h"), col("doc_id")).as("sample"))
      .select(col("lang"), explode(col("sample")).as("doc_id"))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val viaWindow = docs
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 6)
      .select(col("lang"), col("doc_id"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
  }
}
