package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int) =
    Chunking.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        TextAnalysis.tokens(col("text")), size, stride, Seq(col("doc_id")))
      .orderBy(col("chunk_id"))
      .select(col("chunk_id"), col("chunk"))
      .as[(Long, Seq[String])].collect().toSeq

  test("short doc (len <= size) yields exactly one full chunk") {
    val cs = chunksOf("a b c", size = 5, stride = 3)
    assert(cs == Seq((0L, Seq("a", "b", "c"))))
  }

  test("windows start every stride tokens and cover every token") {
    val toks = (1 to 10).map(i => s"t$i")
    val cs = chunksOf(toks.mkString(" "), size = 4, stride = 3)
    // len=10, size=4, stride=3 → ceil(6/3)+1 = 3 chunks... starts 1,4,7
    // last start 7 covers t7..t10 → but t10 is index 10 > 7+4-1=10 ok
    assert(cs.map(_._1) == Seq(0L, 1L, 2L))
    assert(cs(0)._2 == toks.slice(0, 4))
    assert(cs(1)._2 == toks.slice(3, 7))
    assert(cs(2)._2 == toks.slice(6, 10))
    assert(cs.flatMap(_._2).toSet == toks.toSet)
  }

  test("uncovered tail forces one extra (short) window") {
    val toks = (1 to 11).map(i => s"t$i")
    // len=11, size=4, stride=3 → ceil(7/3)+1 = 4 chunks; last = t10,t11
    val cs = chunksOf(toks.mkString(" "), size = 4, stride = 3)
    assert(cs.length == 4)
    assert(cs.last._2 == Seq("t10", "t11"))
    assert(cs.flatMap(_._2).toSet == toks.toSet)
  }

  test("overlap between consecutive windows is size - stride") {
    val toks = (1 to 50).map(i => s"t$i")
    val cs = chunksOf(toks.mkString(" "), size = 8, stride = 5)
    cs.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        assert(a.toSet.intersect(b.toSet).size == (if (b.size >= 3) 3 else b.size))
      case _ =>
    }
  }

  test("chunking is deterministic (re-run yields identical rows)") {
    val docs = Tables.documents(spark, sf)
    def run() = Chunking.chunkTokens(docs,
        TextAnalysis.tokens(col("text")), 32, 24, Seq(col("doc_id")))
      .select(col("doc_id"), col("chunk_id"),
        md5(concat_ws(" ", col("chunk"))).as("h"))
    assert(run().exceptAll(run()).isEmpty)
  }

  test("plan is shuffle-free (map-side explode only)") {
    val docs = Tables.documents(spark, sf)
    val df = Chunking.chunkTokens(docs, TextAnalysis.tokens(col("text")),
      32, 24, Seq(col("doc_id")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("stride must not exceed size") {
    intercept[IllegalArgumentException] {
      Chunking.nChunks(lit(10), size = 4, stride = 5)
    }
  }
}
