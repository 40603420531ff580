package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private val clean = "the quick brown fox jumps over the lazy dog again " +
    "and again for a very long while in the quiet green field today"
  private val leaky = "which model answers this exact benchmark question " +
    "correctly and with the best possible score overall in the test suite"

  private def docsDf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "text")
      .withColumn("n_chars", length($"text"))

  test("stream lands only quality, uncontaminated documents per micro-batch") {
    val inDir = tmpDir("corpus-in")
    val outDir = tmpDir("corpus-out") + "/t"
    val ckpt = tmpDir("corpus-ckpt")
    val eval_ = docsDf(Seq((1000L, "eval", leaky)))

    val batch1 = docsDf(Seq(
      (0L, "s0", clean),             // survives
      (1L, "s0", "!!! ??? ..."),     // quality fail
      (2L, "s1", leaky + " padded"))) // contaminated (shares eval 3-grams)
    batch1.write.mode("append").parquet(inDir)

    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", "2").parquet(inDir)
    val q = CorpusStream.writer(stream, eval_, outDir, ckpt).start()
    try {
      q.processAllAvailable()
      val landed1 = spark.read.parquet(outDir).select("doc_id")
        .as[Long].collect().sorted
      assert(landed1.sameElements(Array(0L)))

      // second drop: survivors append, schema/columns preserved
      docsDf(Seq((3L, "s2", clean + " fresh"))).write.mode("append")
        .parquet(inDir)
      q.processAllAvailable()
      val landed2 = spark.read.parquet(outDir)
      assert(landed2.select("doc_id").as[Long].collect().sorted
        .sameElements(Array(0L, 3L)))
      assert(landed2.columns.sorted
        .sameElements(Array("doc_id", "n_chars", "source", "text")))
    } finally q.stop()
  }

  test("micro-batch replay cannot duplicate landed survivors") {
    val outDir = tmpDir("corpus-replay") + "/t"
    val eval_ = docsDf(Seq((1000L, "eval", leaky)))
    val batch = docsDf(Seq((0L, "s0", clean), (1L, "s0", "!!!")))
    // same batch delivered twice (failure before the offset commit)
    CorpusStream.landBatch(batch, eval_, outDir, minQuality = 0.7)
    CorpusStream.landBatch(batch, eval_, outDir, minQuality = 0.7)
    val landed = spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect()
    assert(landed.sameElements(Array(0L)))
  }
}
