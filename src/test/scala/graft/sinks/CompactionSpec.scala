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
    assert(!Files.exists(Paths.get(dir + "._compacted")))
    assert(!Files.exists(Paths.get(dir + "._old")))
    val got = spark.read.parquet(dir).as[(Long, String)]
      .collect().sortBy(_._1)
    assert(got.sameElements(expected))

    // already at-or-under the target file count: no-op (1-byte target ->
    // byte-derived count >= current files)
    val (b2, a2) = Compaction.compact(spark, dir, 1L)
    assert(b2 == 3 && a2 == 3)
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("recover rolls back an uncommitted crash (live dir byte-identical)") {
    val dir = tmpDir("compact-rb") + "/t"
    (0 until 100).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .repartition(4).write.parquet(dir)
    val files = listParquet(dir).sorted
    // simulate a crash between the two renames, staging NOT committed
    // (no manifest): live renamed aside, staging half-written
    Files.move(Paths.get(dir), Paths.get(dir + "._old"))
    Files.createDirectory(Paths.get(dir + "._compacted"))
    Files.write(Paths.get(dir + "._compacted/part-junk.parquet"),
      Array[Byte](1, 2, 3))
    Compaction.recover(dir)
    assert(listParquet(dir).sorted.sameElements(files))
    assert(!Files.exists(Paths.get(dir + "._old")))
    assert(!Files.exists(Paths.get(dir + "._compacted")))
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("recover resumes a committed stage that never started its swap") {
    val dir = tmpDir("compact-resume") + "/t"
    (0 until 100).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .repartition(4).write.parquet(dir)
    val originals = listParquet(dir)
    spark.read.parquet(dir).repartition(1).write.parquet(dir + "._compacted")
    Files.write(Paths.get(dir + "._compacted/_graft_compacted_sources"),
      originals.mkString("\n").getBytes)
    // crash simulated right after the commit point, before ANY rename:
    // the committed data pass must be completed, not discarded
    Compaction.recover(dir)
    assert(!Files.exists(Paths.get(dir + "._old")))
    assert(!Files.exists(Paths.get(dir + "._compacted")))
    assert(listParquet(dir).size == 1)
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("recover rolls forward a committed crash and rescues late files") {
    val base = tmpDir("compact-rf")
    val dir = base + "/t"
    (0 until 100).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .repartition(4).write.parquet(dir)
    val originals = listParquet(dir)
    // build a real committed staging: compacted rewrite + manifest
    spark.read.parquet(dir).repartition(1).write
      .parquet(dir + "._compacted")
    Files.write(Paths.get(dir + "._compacted/_graft_compacted_sources"),
      originals.mkString("\n").getBytes)
    // crash simulated right after the first rename; one file landed late
    Files.move(Paths.get(dir), Paths.get(dir + "._old"))
    (100 until 110).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .repartition(1).write.mode("append").parquet(dir + "._old")
    Compaction.recover(dir)
    assert(!Files.exists(Paths.get(dir + "._old")))
    assert(!Files.exists(Paths.get(dir + "._compacted")))
    // compacted rows AND the late arrival both present, exactly once
    assert(spark.read.parquet(dir).select("id").as[Long].collect().sorted
      .sameElements(0L until 110L))
  }
}
