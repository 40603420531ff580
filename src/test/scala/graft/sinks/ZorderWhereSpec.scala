package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scoped multi-key clustering (`zorderWhere`): only the files a range
  * scope admits through the stats layer rewrite — z-ordered on the
  * cluster columns — while out-of-scope files survive at their original
  * paths; degenerate scopes refuse exactly like compactWhere. */
class ZorderWhereSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  /** Three ts-bands, each landed arrival-ordered over the FULL (x, y)
    * grid in two files — so before clustering every band file may
    * contain any (x, y). */
  private def land(dir: String): Unit =
    (0 until 3).foreach { band =>
      ops.commit((0 until 1000).map { i =>
        (band * 1000L + i, (i % 50).toLong, (i / 20 % 50).toLong,
          s"b$band-$i")
      }.toDF("ts", "x", "y", "payload").repartition(2), dir)
    }

  test("only the scoped band rewrites, z-ordered: out-of-scope files " +
      "survive at their paths, pruning improves on BOTH z-columns") {
    val dir = tmpDir("zw")
    land(dir)
    val v0 = ops.versions(dir).last
    ops.writeStats(spark, dir, v0, Seq("ts"))
    val before = ops.read(spark, dir).collect().toSet
    val all0 = ops.prunedFiles(dir, v0, "ts", Long.MinValue, Long.MaxValue)
    val band0 = ops.prunedFiles(dir, v0, "ts", 0L, 999L).toSet
    assert(all0.size == 6 && band0.size == 2,
      s"fixture shape: ${all0.size} files, band0 ${band0.size}")
    // size the output by bytes, like every compaction: ~8 z-files
    val bandBytes = band0.toSeq.map(f => new java.io.File(f).length).sum
    val v1 = ops.zorderWhere(spark, dir, Seq(("ts", 0L, 999L)),
      Seq("x", "y"), targetBytes = math.max(1L, bandBytes / 8))
    // rows byte-identical (a rewrite preserves every row)
    assert(ops.read(spark, dir).collect().toSet == before)
    val after = ops.prunedFiles(dir, v1, "ts", Long.MinValue, Long.MaxValue)
    val kept = all0.toSet -- band0
    assert(kept.subsetOf(after.toSet),
      "out-of-scope files must survive at their original paths")
    val zFiles = (after.toSet -- kept).toSeq
    assert(zFiles.size >= 4, s"z-rewrite produced ${zFiles.size} files")
    // pruning improvement WITHIN the scope, on EACH z-column: a probe on
    // the bottom quarter of either dimension must skip z-files (the
    // arrival-ordered landing couldn't skip any)
    for (c <- Seq("x", "y")) {
      val admit = ops.prunedFiles(dir, v1, c, 0L, 11L).toSet
      val zAdmit = zFiles.count(admit)
      assert(zAdmit < zFiles.size,
        s"probe on '$c' kept $zAdmit of ${zFiles.size} z-files — " +
          "multi-key clustering did not improve pruning on this column")
      // superset guarantee: the pruned read still recovers the slice
      assert(ops.prunedRead(spark, dir, c, 0L, 11L)
        .filter(col(c).between(0L, 11L)).count() ==
        ops.read(spark, dir).filter(col(c).between(0L, 11L)).count())
    }
  }

  test("in-scope delete debt materializes; history stays intact") {
    val dir = tmpDir("zw-del")
    land(dir)
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("ts"))
    ops.deleteWhere(spark, dir, col("ts") < 10L) // vector on band-0 files
    val before = ops.read(spark, dir).collect().toSet
    assert(before.size == 2990)
    val v = ops.zorderWhere(spark, dir, Seq(("ts", 0L, 999L)),
      Seq("x", "y"), targetBytes = 1L << 20)
    assert(ops.read(spark, dir).collect().toSet == before)
    val h = ops.history(spark, dir).filter(col("version") === v).head()
    assert(h.getAs[Long]("n_delete_files") == 0L,
      "the scoped rewrite must materialize the vector it superseded")
    // the pre-rewrite snapshot still time-travels with its delete applied
    assert(ops.read(spark, dir, Some(v - 1)).collect().toSet == before)
  }

  test("CALL zorder_where resolves LOGICAL names (post-rename) to the " +
      "physical paths the stats carry") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    val dir = tmpDir("zw-sql") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(ts BIGINT, x BIGINT, y BIGINT, payload STRING)")
    (0 until 2).foreach { band =>
      spark.range(0, 500).select((col("id") + band * 500L).as("ts"),
          (col("id") % 50).as("x"), (col("id") / 10 % 50).as("y"),
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("p"), col("id"))
            .as("payload"))
        .coalesce(1)
        .createOrReplaceTempView(s"zw_sql_b$band")
      spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM zw_sql_b$band")
    }
    val v0 = ops.versions(dir).last
    ops.writeStats(spark, dir, v0, Seq("ts"))
    // rename the scope column AND a cluster column: the CALL takes the
    // NEW logical names; stats/files stay keyed by the physical ones
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN ts TO event_ts")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN x TO dim_x")
    val before = ops.read(spark, dir).count()
    val band0 = ops.prunedFiles(dir, v0, "ts", 0L, 499L)
    val bandBytes = band0.map(f => new java.io.File(f).length).sum
    spark.sql(s"CALL graft.zorder_where('$dir', 'event_ts', '0', '499', " +
      s"'dim_x,y', '${math.max(1L, bandBytes / 4)}')")
    assert(ops.read(spark, dir).count() == before)
    // the z-files carry stats for the PHYSICAL cluster columns, and a
    // narrow probe on the renamed dimension skips some of them (the
    // out-of-scope band has no x stats and is always kept — superset)
    val head = ops.versions(dir).last
    val all = ops.prunedFiles(dir, head, "ts", Long.MinValue, Long.MaxValue)
    assert(all.size >= 4, s"z-rewrite produced ${all.size - 1} files")
    val admit = ops.prunedFiles(dir, head, "x", 0L, 5L)
    assert(admit.size < all.size,
      s"post-rename zorder_where kept ${admit.size} of ${all.size} — " +
        "the logical→physical translation missed")
  }

  test("degenerate scopes refuse loudly, exactly like compactWhere") {
    val dir = tmpDir("zw-refuse")
    land(dir)
    // no stats on the scope column yet → a full-table rewrite in disguise
    val e1 = intercept[IllegalArgumentException] {
      ops.zorderWhere(spark, dir, Seq(("ts", 0L, 999L)), Seq("x", "y"),
        targetBytes = 1L << 20)
    }
    assert(e1.getMessage.contains("no range stats") &&
      e1.getMessage.contains("zorderWhere"))
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("ts"))
    // type-family mismatch against the recorded stats
    val e2 = intercept[IllegalArgumentException] {
      ops.zorderWhere(spark, dir, Seq(("ts", "a", "z")), Seq("x", "y"),
        targetBytes = 1L << 20)
    }
    assert(e2.getMessage.contains("mismatched probe"))
    // empty inputs
    intercept[IllegalArgumentException] {
      ops.zorderWhere(spark, dir, Seq.empty, Seq("x"), 1L << 20)
    }
    intercept[IllegalArgumentException] {
      ops.zorderWhere(spark, dir, Seq(("ts", 0L, 999L)), Seq.empty,
        1L << 20)
    }
  }
}
