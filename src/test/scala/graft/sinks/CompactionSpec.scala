package graft.sinks

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def listParquet(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSeq

  test("compact merges many small files, preserves data, and is idempotent") {
    val dir = tmpDir("compact") + "/t"
    (0 until 1000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(20).write.parquet(dir)
    assert(listParquet(dir).size == 20)
    val expected = spark.read.parquet(dir).as[(Long, String)]
      .collect().sortBy(_._1)

    val bytes = listParquet(dir)
      .map(f => Files.size(Paths.get(dir).resolve(f))).sum
    // target ~ a third of the data -> 3 output files
    val (before, after) = Compaction.compact(spark, dir, bytes / 3 + 1)
    assert(before == 20 && after == 3, s"before=$before after=$after")
    assert(!Files.exists(Paths.get(dir + "._compacting")))
    val got = spark.read.parquet(dir).as[(Long, String)]
      .collect().sortBy(_._1)
    assert(got.sameElements(expected))

    // already at-or-under the target file count: no-op (1-byte target ->
    // byte-derived count >= current files)
    val (b2, a2) = Compaction.compact(spark, dir, 1L)
    assert(b2 == 3 && a2 == 3)
    assert(spark.read.parquet(dir).count() == 1000)
  }
}
