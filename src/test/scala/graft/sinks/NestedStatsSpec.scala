package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** File-level stats pruning on NESTED leaves ("main.temp" — the raw
  * weather-document shape): the stats sidecar is dotted-path-keyed, so
  * min/max lines for struct members record, fold, and prune exactly like
  * top-level columns — including through the SQL scan, and through a
  * nested RENAME (the pushed filter carries the physical dotted path the
  * sidecar is keyed by). */
class NestedStatsSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  /** Four single-file commits with DISJOINT nested temp bands. */
  private def land(dir: String): Unit =
    (0 until 4).foreach { b =>
      ops.commit((0 until 100).map { i =>
        (b * 100L + i, (b * 100.0 + i, s"k${i % 5}"))
      }.toDF("id", "main").coalesce(1), dir)
    }

  test("writeStats on a nested leaf records per-file bounds; prunedFiles " +
      "and prunedRead skip disjoint files; fastMinMax folds") {
    val dir = tmpDir("nstats")
    land(dir)
    val head = ops.versions(dir).last
    ops.writeStats(spark, dir, head, Seq("main._1"))
    val all = ops.prunedFiles(dir, head, "main._1",
      Double.MinValue, Double.MaxValue)
    assert(all.size == 4, s"fixture: ${all.size} files")
    val kept = ops.prunedFiles(dir, head, "main._1", 0.0, 99.0)
    assert(kept.size == 1,
      s"nested-leaf pruning kept ${kept.size} of 4 disjoint files")
    assert(ops.prunedRead(spark, dir, "main._1", 0.0, 99.0)
      .filter(col("main._1").between(0.0, 99.0)).count() == 100L)
    // the sidecar fold serves metadata-only extremes for the leaf too
    assert(ops.fastMinMax(dir, "main._1").exists { case (t, lo, hi) =>
      t == "num" && BigDecimal(lo) == 0 && BigDecimal(hi) == 399
    }, s"fastMinMax on a nested leaf: ${ops.fastMinMax(dir, "main._1")}")
  }

  test("MIN/MAX of a nested leaf serve from the sidecar: a pushed " +
      "aggregate scan opens zero data files; missing stats decline to " +
      "the real scan") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    val dir = tmpDir("nstats-agg") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    spark.range(0, 10).select(col("id"),
        struct((col("id") * 1.5).as("temp"), lit("a").as("kind")).as("main"))
      .createOrReplaceTempView("nstats_agg_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM nstats_agg_src")
    def q() = spark.sql(
      s"SELECT MIN(main.temp) AS lo, MAX(main.temp) AS hi FROM graft.`$dir`")
    // no stats yet: the aggregate declines to the scan path — still right
    val noStats = q()
    assert(noStats.head() == org.apache.spark.sql.Row(0.0, 13.5))
    assert(!noStats.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      "an unstated leaf must not fake a metadata answer")
    ops.writeStats(spark, dir, 1, Seq("main.temp"))
    val served = q()
    assert(served.head() == org.apache.spark.sql.Row(0.0, 13.5))
    assert(served.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      "nested MIN/MAX with recorded leaf stats must serve from the " +
        "sidecar (zero files opened):\n" +
        served.queryExecution.executedPlan.toString)
  }

  test("TopN pushdown admits by a NESTED sort key: ORDER BY main.temp " +
      "LIMIT n opens one band file once the leaf is ANALYZE-proven " +
      "null-free; without the proof it declines") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    val dir = tmpDir("nstats-topn") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    (0 until 4).foreach { b =>
      spark.range(0, 100).select((col("id") + b * 100L).as("id"),
          struct((col("id") + b * 100.0).as("temp"),
            lit("k").as("kind")).as("main"))
        .coalesce(1).createOrReplaceTempView(s"nstats_topn_b$b")
      spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM nstats_topn_b$b")
    }
    def top3() = spark.sql(s"SELECT main.temp FROM graft.`$dir` " +
      "ORDER BY main.temp LIMIT 3").collect().map(_.getDouble(0)).toSeq
    // the leaf is nullable and unproven: admission must decline (a NULL
    // parent struct could hide outside every bound)
    graft.sql.GraftCatalog.lastTopNAdmit = (0, 0)
    assert(top3() == Seq(0.0, 1.0, 2.0))
    assert(graft.sql.GraftCatalog.lastTopNAdmit == ((0, 0)),
      "an unproven nested key must not admit a TopN cover")
    // ANALYZE proves zero nulls on the dotted path (incl. null structs)
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("main.temp"))
    graft.sql.GraftCatalog.lastTopNAdmit = (0, 0)
    assert(top3() == Seq(0.0, 1.0, 2.0))
    assert(graft.sql.GraftCatalog.lastTopNAdmit == ((4, 1)),
      s"expected a 1-file nested ASC cover: " +
        s"${graft.sql.GraftCatalog.lastTopNAdmit}")
  }

  test("the SQL scan prunes files on a nested predicate, including " +
      "through a nested RENAME (physical dotted key)") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    val dir = tmpDir("nstats-sql") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    (0 until 4).foreach { b =>
      spark.range(0, 100).select((col("id") + b * 100L).as("id"),
          struct((col("id") + b * 100.0).as("temp"),
            lit(s"k$b").as("kind")).as("main"))
        .coalesce(1).createOrReplaceTempView(s"nstats_sql_b$b")
      spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM nstats_sql_b$b")
    }
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN main.temp TO reading")
    val head = ops.versions(dir).last
    ops.writeStats(spark, dir, head, Seq("main.temp")) // PHYSICAL path
    val n = spark.sql(s"SELECT COUNT(*) FROM graft.`$dir` " +
      "WHERE main.reading BETWEEN 100.0 AND 199.0").head().getLong(0)
    assert(n == 100L)
    val (total, kept) = graft.sql.GraftCatalog.lastScanPrune
    assert(total == 4 && kept == 1,
      s"nested predicate through the renamed member kept $kept of $total " +
        "files — manifest pruning lost the physical dotted key")
  }
}
