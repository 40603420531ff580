package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.DedupIndex

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again " +
    "and again for a very long while in the quiet green field today"

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))

  private def freshIndex(history: Seq[(Long, String)]): String = {
    val dir = tmpDir("dsidx")
    DedupIndex.writeIndex(docsDf(history), dir)
    dir
  }

  test("stream dedups each micro-batch against everything landed before it") {
    val inDir = tmpDir("ds-in")
    val outDir = tmpDir("ds-out") + "/t"
    val ckpt = tmpDir("ds-ckpt")
    val idx = freshIndex(Seq((100L, base))) // history: one landed doc

    val b1 = docsDf(Seq(
      (0L, base + " tail"),                       // near-dup of history → drop
      (1L, "completely different words about ships and stars and maps " +
        "sailing north under winter skies with careful quiet patience")))
    b1.write.mode("append").parquet(inDir)

    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = DedupStream.writer(stream, idx, outDir, ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).select("doc_id").as[Long]
        .collect().sorted.sameElements(Array(1L)))

      // batch 2: near-dup of the doc batch 1 just landed → dropped, because
      // the index was brought current between batches
      docsDf(Seq((2L, "completely different words about ships and stars " +
        "and maps sailing north under winter skies with careful quiet " +
        "patience end"))).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).select("doc_id").as[Long]
        .collect().sorted.sameElements(Array(1L)))
    } finally q.stop()
  }

  test("replayed micro-batch lands nothing twice and leaves the index consistent") {
    val outDir = tmpDir("ds-replay") + "/t"
    val idx = freshIndex(Seq((100L, base)))
    val batch = docsDf(Seq((0L, base + " x"), (1L, "unrelated fresh words " +
      "entirely new content speaking of rivers bridges and morning light")))
    DedupStream.landBatch(batch, idx, outDir)
    val landed1 = spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().sorted
    val sigs1 = spark.read.parquet(s"$idx/sigs").count()
    // same batch delivered again (crash before the offset committed)
    DedupStream.landBatch(batch, idx, outDir)
    val landed2 = spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().sorted
    assert(landed1.sameElements(landed2))
    assert(spark.read.parquet(s"$idx/sigs").count() == sigs1,
      "replay must not duplicate signatures")
  }

  test("crash window repaired: output landed but index append lost") {
    val outDir = tmpDir("ds-crash") + "/t"
    val idx = freshIndex(Seq((100L, base)))
    val doc = docsDf(Seq((1L, "unrelated fresh words entirely new content " +
      "speaking of rivers bridges and morning light")))
    // simulate the torn write: survivors landed, index append never ran
    doc.write.mode("append").parquet(outDir)
    assert(spark.read.parquet(s"$idx/sigs")
      .filter(col("doc_id") === 1L).count() == 0)
    // replay of the same batch must repair the index without re-landing
    DedupStream.landBatch(doc, idx, outDir)
    assert(spark.read.parquet(outDir).filter(col("doc_id") === 1L).count() == 1)
    assert(spark.read.parquet(s"$idx/sigs")
      .filter(col("doc_id") === 1L).count() == 1,
      "reconciliation must append the missing signature")
  }
}
