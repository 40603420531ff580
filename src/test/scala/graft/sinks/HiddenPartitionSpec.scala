package graft.sinks

import java.time.Instant

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hidden partitioning: transforms declared once at the table, applied by
  * every plain commit — a date-range or key-equality probe prunes files
  * with NO manual optimize pass, and the pruned read stays a superset
  * (row parity with the full scan under the exact predicate). */
class HiddenPartitionSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def tsDf(ids: Range) = ids.map { i =>
    val day = (i % 20) + 1
    (i.toLong, Instant.parse(f"2026-01-$day%02dT10:00:00Z"),
      s"u${i % 40}", i * 1.5)
  }.toDF("id", "ts", "key", "value")

  test("days(ts): plain commits cluster and a date probe prunes, no " +
      "optimize pass") {
    val dir = tmpDir("hp-days")
    ops.declarePartitioning(dir, Seq("days(ts)"), numFiles = 4)
    ops.commit(tsDf(0 until 400), dir)   // plain landings — the point
    ops.commit(tsDf(400 until 800), dir)
    val v = ops.versions(dir).last
    val all = ops.fastCount(spark, dir)
    assert(all == 800L)
    val (lo, hi) = (Instant.parse("2026-01-03T00:00:00Z"),
      Instant.parse("2026-01-03T23:59:59Z"))
    val kept = ops.prunedFiles(dir, v, "ts", lo, hi)
    val total = 8 // 4 range files per landing, 2 landings
    assert(kept.size < total,
      s"date probe kept ${kept.size} of $total files — no pruning")
    // superset guarantee: pruned read + exact predicate == full scan's
    val exact = ops.read(spark, dir)
      .filter(col("ts") >= lit(lo) && col("ts") <= lit(hi)).count()
    val pruned = ops.prunedRead(spark, dir, "ts", lo, hi)
      .filter(col("ts") >= lit(lo) && col("ts") <= lit(hi)).count()
    assert(pruned == exact && exact == 40L)
  }

  test("bucket(8,key): equality probes touch a file subset via the " +
      "derived bucket stat, and compaction re-derives it") {
    val dir = tmpDir("hp-bucket")
    ops.declarePartitioning(dir, Seq("bucket(8,key)"), numFiles = 8)
    ops.commit(tsDf(0 until 400), dir)
    val v = ops.versions(dir).last
    val files = ops.prunedFiles(dir, v, "id",
      Long.MinValue, Long.MaxValue) // unpruned baseline = all files
    val kept = ops.prunedFilesEq(spark, dir, v, "key", Seq("u7"))
    assert(kept.size < files.size,
      s"bucket probe kept ${kept.size} of ${files.size} files")
    val exact = ops.read(spark, dir).filter(col("key") === "u7").count()
    val viaPrune = ops.prunedReadIn(spark, dir, "key", Seq("u7"))
      .filter(col("key") === "u7").count()
    assert(viaPrune == exact && exact == 10L)
    // compact re-derives the DERIVED stat through the transform parser
    // (statColsOf carries 'bucket(8,key)' into the rewrite's stats scan)
    ops.commit(tsDf(400 until 480), dir)
    ops.compact(spark, dir, targetBytes = 1L << 30)
    val v2 = ops.versions(dir).last
    val exact2 = ops.read(spark, dir).filter(col("key") === "u7").count()
    val pruned2 = ops.prunedReadIn(spark, dir, "key", Seq("u7"))
      .filter(col("key") === "u7").count()
    assert(pruned2 == exact2 && exact2 == 12L)
    assert(ops.prunedFilesEq(spark, dir, v2, "key", Seq("u7")).nonEmpty)
  }

  test("truncate: string prefix and numeric floor both cluster and prune") {
    val dir = tmpDir("hp-trunc")
    ops.declarePartitioning(dir, Seq("truncate(100,id)"), numFiles = 4)
    ops.commit(tsDf(0 until 400), dir)
    val v = ops.versions(dir).last
    val kept = ops.prunedFiles(dir, v, "id", 150L, 180L)
    assert(kept.size < 4, s"numeric truncate kept ${kept.size} of 4")
    val got = ops.prunedRead(spark, dir, "id", 150L, 180L)
      .filter(col("id").between(150L, 180L)).count()
    assert(got == 31L)
    // string prefix clustering
    val dir2 = tmpDir("hp-truncs")
    ops.declarePartitioning(dir2, Seq("truncate(2,key)"), numFiles = 4)
    ops.commit(tsDf(0 until 400), dir2)
    val v2 = ops.versions(dir2).last
    val keptS = ops.prunedFiles(dir2, v2, "key", "u1", "u19")
    assert(keptS.size < 4, s"string truncate kept ${keptS.size} of 4")
    val gotS = ops.prunedRead(spark, dir2, "key", "u1", "u19")
      .filter(col("key") >= "u1" && col("key") <= "u19").count()
    assert(gotS == ops.read(spark, dir2)
      .filter(col("key") >= "u1" && col("key") <= "u19").count())
  }

  test("declaration is validated loudly; redeclare shapes FUTURE landings " +
      "only; absent source column fails the commit") {
    val dir = tmpDir("hp-decl")
    val e = intercept[IllegalArgumentException] {
      ops.declarePartitioning(dir, Seq("shards(4,id)"))
    }
    assert(e.getMessage.contains("not a partition transform"))
    intercept[IllegalArgumentException] {
      ops.declarePartitioning(dir, Seq("bucket(1,id)")) // n >= 2
    }
    ops.declarePartitioning(dir, Seq("days(ts)"), numFiles = 2)
    ops.commit(tsDf(0 until 100), dir)
    // partition evolution: new spec applies to the NEXT landing; the old
    // files keep their stats — pruning stays a superset either way
    ops.declarePartitioning(dir, Seq("bucket(4,key)"), numFiles = 4)
    ops.commit(tsDf(100 until 200), dir)
    val v = ops.versions(dir).last
    assert(ops.partitioningOf(dir).map(_.spec) == Seq("bucket(4,key)"))
    val exact = ops.read(spark, dir).filter(col("key") === "u3").count()
    assert(ops.prunedReadIn(spark, dir, "key", Seq("u3"))
      .filter(col("key") === "u3").count() == exact)
    // a transform over a column the batch doesn't carry is a loud error
    val e2 = intercept[IllegalArgumentException] {
      ops.commit(Seq((1L, "x")).toDF("id", "s"), dir)
    }
    assert(e2.getMessage.contains("absent from the batch"))
  }

  test("partition-spec evolution composes per file: after re-declaring " +
      "bucket(4) -> bucket(8), equality probes prune BOTH vintages, each " +
      "by its own spec") {
    val dir = tmpDir("hp-evolve")
    ops.declarePartitioning(dir, Seq("bucket(4,key)"), numFiles = 4)
    ops.commit(tsDf(0 until 400), dir)
    val oldVintage = ops.filesMeta(spark, dir)
      .select("file").as[String].collect().toSet
    ops.declarePartitioning(dir, Seq("bucket(8,key)"), numFiles = 8)
    ops.commit(tsDf(400 until 800), dir)
    val v = ops.versions(dir).last
    val all = ops.filesMeta(spark, dir).select("file").as[String]
      .collect().toSet
    val newVintage = all -- oldVintage
    assert(oldVintage.nonEmpty && newVintage.nonEmpty)
    val kept = ops.prunedFilesEq(spark, dir, v, "key", Seq("u7")).toSet
    // each vintage prunes by ITS spec — a probe that kept a whole
    // vintage would mean evolution silently disabled that era's index
    assert((oldVintage -- kept).nonEmpty,
      s"old-vintage files all kept (${oldVintage.size}) — the retired " +
        "bucket(4) spec no longer prunes")
    assert((newVintage -- kept).nonEmpty,
      s"new-vintage files all kept (${newVintage.size}) — the declared " +
        "bucket(8) spec does not prune")
    // correctness: superset guarantee across mixed vintages
    val exact = ops.read(spark, dir).filter(col("key") === "u7").count()
    assert(ops.prunedReadIn(spark, dir, "key", Seq("u7"))
      .filter(col("key") === "u7").count() == exact && exact > 0)
  }

  test("a batch may legitimately carry a '__bucket' column: exact bucket " +
      "clustering must not corrupt it (reserved-name regression)") {
    val dir = tmpDir("hp-bucket-name")
    ops.declarePartitioning(dir, Seq("bucket(4,key)"), numFiles = 4)
    // '__bucket' used to be the clustering key's hardcoded name:
    // withColumn REPLACED this column in place and the positional strip
    // then dropped 'value' — rows landed shifted/corrupted
    val df = (0 until 100).map(i =>
      (i.toLong, s"u${i % 10}", s"b$i", i * 1.5))
      .toDF("id", "key", "__bucket", "value")
    ops.commit(df, dir)
    val back = ops.read(spark, dir).orderBy("id").collect()
    assert(back.length == 100)
    assert(back(7).getString(2) == "b7" && back(7).getDouble(3) == 10.5,
      s"row 7 corrupted: ${back(7).mkString(",")}")
    // and the bucket index still prunes
    val v = ops.versions(dir).last
    assert(ops.prunedFilesEq(spark, dir, v, "key", Seq("u3")).size < 4)
  }
}
