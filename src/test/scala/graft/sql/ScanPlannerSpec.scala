package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VersionedTable

/** The SQL scan's three planner contracts at scale:
  *  - aggregate pushdown — COUNT(*)/MIN/MAX served from the manifest
  *    sidecar as a one-row LocalScan, zero data files opened (the SQL
  *    twin of fastCount/fastMinMax, same refusal envelope);
  *  - statistics — exact sidecar row counts and real file bytes reach
  *    join planning, so a small graft table auto-broadcasts instead of
  *    sort-merging under the unknown-size default;
  *  - runtime (DPP) filtering — a join's dim-side key set re-prunes the
  *    fact file list at execution time through the same stats/bloom/
  *    bucket stack as static WHERE pruning. */
class ScanPlannerSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def register(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def planOf(df: DataFrame): String =
    df.queryExecution.sparkPlan.toString

  private def assertMetadataOnly(df: DataFrame): Unit = {
    val p = planOf(df)
    assert(p.contains("LocalTableScan") && !p.contains("BatchScan"),
      s"aggregate not served from the sidecar:\n$p")
  }

  private def assertScans(df: DataFrame): Unit = {
    val p = planOf(df)
    assert(p.contains("BatchScan"), s"expected a real scan:\n$p")
  }

  test("COUNT(*)/MIN/MAX fold the sidecar: LocalTableScan, exact values") {
    register()
    val dir = tmpDir("sp-agg")
    ops.commit((0 until 500).map(i =>
      (i.toLong, s"k${i % 7}", i * 1.5)).toDF("id", "k", "v"), dir)
    ops.commit((500 until 900).map(i =>
      (i.toLong, s"k${i % 7}", i * 1.5)).toDF("id", "k", "v"), dir)
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("id", "k", "v"))
    val q = spark.sql(s"SELECT count(*) AS n, min(id) AS mn, " +
      s"max(id) AS mx, min(k) AS ks, max(v) AS vx FROM graft.`$dir`")
    assertMetadataOnly(q)
    val r = q.collect()(0)
    assert(r.getLong(0) == 900L && r.getLong(1) == 0L &&
      r.getLong(2) == 899L && r.getString(3) == "k0" &&
      r.getDouble(4) == 899 * 1.5)
  }

  test("WHERE, GROUP BY, or an unsupported function falls back to a scan") {
    register()
    val dir = tmpDir("sp-fallback")
    ops.commit((0 until 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v"),
      dir)
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("id", "v"))
    val filtered =
      spark.sql(s"SELECT count(*) AS n FROM graft.`$dir` WHERE id < 10")
    assertScans(filtered)
    assert(filtered.collect()(0).getLong(0) == 10L)
    val summed = spark.sql(s"SELECT sum(v) AS s FROM graft.`$dir`")
    assertScans(summed)
    assert(summed.collect()(0).getDouble(0) == (0 until 100).map(_ * 2.0).sum)
    val grouped = spark.sql(
      s"SELECT id % 2 AS g, count(*) AS n FROM graft.`$dir` GROUP BY 1")
    assertScans(grouped)
    assert(grouped.collect().map(_.getLong(1)).sum == 100L)
  }

  test("typed bounds round-trip: timestamp and date min/max are exact") {
    register()
    val dir = tmpDir("sp-typed")
    val df = (1 to 60).map { i =>
      (i.toLong,
        java.sql.Timestamp.valueOf(
          f"2026-03-${(i % 28) + 1}%02d 10:30:${i % 60}%02d.$i%03d"),
        java.sql.Date.valueOf(f"2026-04-${(i % 28) + 1}%02d"))
    }.toDF("id", "ts", "d")
    ops.commit(df, dir)
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("id", "ts", "d"))
    val q = spark.sql(s"SELECT min(ts) AS a, max(ts) AS b, min(d) AS c, " +
      s"max(d) AS e FROM graft.`$dir`")
    assertMetadataOnly(q)
    val byScan = ops.read(spark, dir)
      .agg(min("ts"), max("ts"), min("d"), max("d")).collect()(0)
    assert(q.collect()(0) == byScan)
  }

  test("non-finite float extremes are `wild`, not null: metadata min/max " +
    "refuses and the scan path serves the Infinity") {
    register()
    val dir = tmpDir("sp-wild")
    ops.commit(Seq((1L, 1.5), (2L, Double.PositiveInfinity), (3L, -7.0))
      .toDF("id", "v"), dir)
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("id", "v"))
    // the sidecar cannot bound the +Inf extreme — fastMinMax must refuse
    // rather than answer from the OTHER files' bounds (max would be 1.5)
    assert(ops.fastMinMax(dir, "v").isEmpty)
    val q = spark.sql(s"SELECT max(v) AS mx FROM graft.`$dir`")
    assertScans(q)
    assert(q.collect()(0).getDouble(0).isPosInfinity)
    // id is untouched by the wild column — still metadata-served
    val idq = spark.sql(s"SELECT max(id) AS mx FROM graft.`$dir`")
    assertMetadataOnly(idq)
    assert(idq.collect()(0).getLong(0) == 3L)
  }

  test("COUNT(*) stays metadata-only under positional delete debt; " +
    "MIN/MAX declines to the (refusing) scan — the fastCount contract") {
    register()
    val dir = tmpDir("sp-mor")
    ops.commit((0 until 200).map(i => (i.toLong, i * 3.0)).toDF("id", "v"),
      dir)
    ops.deleteWhere(spark, dir, col("id") >= 150)
    val q = spark.sql(s"SELECT count(*) AS n FROM graft.`$dir`")
    assertMetadataOnly(q)
    assert(q.collect()(0).getLong(0) == 150L)
    // min/max can't trust bounds whose extremal row may be dead: the
    // aggregation declines, and the row-serving path refuses MOR debt
    val e = intercept[Exception] {
      spark.sql(s"SELECT max(v) AS mx FROM graft.`$dir`").collect()
    }
    assert(e.getMessage.contains("compact"))
  }

  test("empty snapshot serves count 0 and null extremes, no scan") {
    register()
    val dir = tmpDir("sp-empty")
    ops.commit(Seq.empty[(Long, String)].toDF("id", "k"), dir)
    val q = spark.sql(
      s"SELECT count(*) AS n, min(id) AS mn, max(k) AS mk FROM graft.`$dir`")
    assertMetadataOnly(q)
    val r = q.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("statistics: the scan reports exact sidecar rows and file bytes, " +
    "and a small graft table auto-broadcasts in a SQL join") {
    register()
    val dir = tmpDir("sp-stats")
    ops.commit((0 until 300).map(i => (i.toLong, s"u${i % 50}"))
      .toDF("id", "k"), dir)
    val scan = spark.sql(s"SELECT * FROM graft.`$dir`")
      .queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r.scan
      }.get
    val st = scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(st.numRows.getAsLong == 300L, "sidecar row count must be exact")
    assert(st.sizeInBytes.getAsLong > 0L &&
      st.sizeInBytes.getAsLong < (10L << 20))
    // join against a side big enough to never broadcast: without real
    // stats a v2 relation defaults to unknown/huge and this would plan
    // as a sort-merge join; with them the graft side broadcasts
    spark.range(0, 2000000).select(col("id"), (col("id") % 50).as("m"))
      .createOrReplaceTempView("sp_big")
    val j = spark.sql(
      s"SELECT count(*) AS n FROM sp_big b JOIN graft.`$dir` g ON b.id = g.id")
    assert(planOf(j).contains("BroadcastHashJoin"),
      s"small graft table did not broadcast:\n${planOf(j)}")
    assert(j.collect()(0).getLong(0) == 300L)
    // and the estimate is honest: shrink the threshold below the table's
    // size and the broadcast disappears
    withConf("spark.sql.autoBroadcastJoinThreshold", "64") {
      val nb = spark.sql(
        s"SELECT count(*) AS n FROM sp_big b JOIN graft.`$dir` g ON b.id = g.id")
      assert(!planOf(nb).contains("BroadcastHashJoin"),
        s"64-byte threshold still broadcast:\n${planOf(nb)}")
    }
  }

  test("runtime (DPP) filtering: the dim's join keys prune fact files " +
    "at execution through the declared bucket transform") {
    register()
    val dir = tmpDir("sp-dpp")
    ops.declarePartitioning(dir, Seq("bucket(8,k)"), numFiles = 8)
    ops.commit((0 until 4000).map(i => (i.toLong, s"u${i % 40}", i * 2.0))
      .toDF("id", "k", "v"), dir)
    // the dim must be a real source: a literal Seq constant-folds to a
    // LocalRelation, its filter pre-evaluates away, and PartitionPruning
    // sees no selective predicate to build a DPP subquery from
    val dimPath = tmpDir("sp-dpp-dim")
    Seq(("u7", 1), ("u13", 1), ("u21", 0)).toDF("k", "flag")
      .write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("sp_dim")
    withConf("spark.sql.optimizer.dynamicPartitionPruning.useStats",
      "false") {
      GraftCatalog.recordRuntimePrune(0, 0)
      val q = spark.sql(
        s"""SELECT g.k AS k, count(*) AS n
           |FROM graft.`$dir` g JOIN sp_dim d ON g.k = d.k
           |WHERE d.flag = 1 GROUP BY g.k ORDER BY k""".stripMargin)
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == Seq(("u13", 100L), ("u7", 100L)))
      val (before, after) = GraftCatalog.lastRuntimePrune
      assert(before > 0 && after < before,
        s"runtime filter pruned nothing: $before -> $after")
    }
  }

  test("storage-partitioned join: two co-bucketed graft tables join " +
    "with ZERO Exchange; a bucket-merging compact falls back loudly-free") {
    register()
    val a = tmpDir("spj-a")
    val bt = tmpDir("spj-b")
    ops.declarePartitioning(a, Seq("bucket(8,k)"), numFiles = 8)
    ops.declarePartitioning(bt, Seq("bucket(8,k)"), numFiles = 8)
    ops.commit((0 until 400).map(i => (s"u${i % 40}", i.toLong))
      .toDF("k", "v"), a)
    ops.commit((0 until 200).map(i => (s"u${i % 40}", i * 10.0))
      .toDF("k", "w"), bt)
    val sql =
      s"SELECT a.k AS k, a.v AS v, b.w AS w FROM graft.`$a` a " +
        s"JOIN graft.`$bt` b ON a.k = b.k"
    val expected = ops.read(spark, a).join(
      ops.read(spark, bt).withColumnRenamed("k", "k2"),
      col("k") === col("k2")).count()
    // EnsureRequirements inserts Exchanges AFTER sparkPlan, so the pin
    // must read the EXECUTED plan; broadcast is disabled or the small
    // sides would sidestep the shuffle question entirely
    def finalPlan(df: DataFrame): String = {
      assert(df.count() == expected)
      df.queryExecution.executedPlan.toString
    }
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      withConf("spark.sql.sources.v2.bucketing.enabled", "true") {
        withConf("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
          "true") {
          val plan = finalPlan(spark.sql(sql))
          assert(plan.contains("SortMergeJoin") ||
            plan.contains("ShuffledHashJoin"), plan)
          assert(!plan.contains("Exchange"),
            s"co-bucketed join still shuffles:\n$plan")
        }
        // a compact large enough to merge buckets breaks the per-file
        // single-bucket proof: the scan reports unknown partitioning,
        // the join shuffles as usual, and results stay correct
        ops.compact(spark, a, targetBytes = 1L << 30)
        val p2 = finalPlan(spark.sql(sql))
        assert(p2.contains("Exchange"),
          s"merged-bucket layout must not claim key grouping:\n$p2")
      }
      // with v2 bucketing off, nothing is reported or regrouped
      val p3 = finalPlan(spark.sql(sql))
      assert(p3.contains("Exchange"))
    }
  }

  test("#partitions metadata view: per-value files/rows/bytes folded " +
    "from the sidecar; exact bucket landings are never `mixed`") {
    register()
    val dir = tmpDir("sp-parts")
    ops.declarePartitioning(dir, Seq("bucket(4,k)"))
    ops.commit((0 until 400).map(i => (i.toLong, s"u${i % 20}"))
      .toDF("id", "k"), dir)
    val rows = spark.sql(s"SELECT * FROM graft.`$dir#partitions`")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rows.nonEmpty && rows.forall(_._1 == "bucket(4,k)"))
    assert(rows.map(_._4).sum == 400L, "sidecar rows must cover the table")
    assert(rows.forall(r => !r._2.startsWith("mixed")),
      s"exact bucket landing produced a straddling file: $rows")
    assert(rows.forall(_._5 > 0L))
    // a days table whose files straddle days reports mixed honestly
    val dd = tmpDir("sp-parts-days")
    ops.declarePartitioning(dd, Seq("days(ts)"), numFiles = 2)
    ops.commit((0 until 100).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2026-05-${(i % 10) + 1}%02d 08:00:00"))
    }.toDF("id", "ts"), dd)
    val drows = spark.sql(
      s"SELECT value, rows FROM graft.`$dd#partitions`").collect()
    assert(drows.map(_.getLong(1)).sum == 100L)
  }

  test("GROUP BY the bucket key over one bucketed table: the aggregate " +
    "rides the key-grouped layout with no shuffle") {
    register()
    val dir = tmpDir("sp-spjagg")
    ops.declarePartitioning(dir, Seq("bucket(8,k)"))
    ops.commit((0 until 800).map(i => (s"u${i % 40}", i.toLong))
      .toDF("k", "v"), dir)
    withConf("spark.sql.sources.v2.bucketing.enabled", "true") {
      val q = spark.sql(
        s"SELECT k, sum(v) AS s FROM graft.`$dir` GROUP BY k")
      assert(q.collect().length == 40)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"group-by on the bucket key still shuffled:\n$plan")
    }
  }

  test("column-level CBO stats: exact null counts + mergeable-HLL NDV " +
    "fold from the sidecar and reach the optimizer's attribute stats") {
    register()
    val dir = tmpDir("sp-colstats")
    // two commits so the NDV fold must MERGE per-file sketches (a sum of
    // per-file estimates would double-count k values shared across files)
    ops.commit((0 until 600).map(i => (i.toLong, s"k${i % 7}",
      if (i % 5 == 0) null else s"v$i")).toDF("id", "k", "v"), dir)
    ops.commit((600 until 1000).map(i => (i.toLong, s"k${i % 7}",
      if (i % 5 == 0) null else s"v$i")).toDF("id", "k", "v"), dir)
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("id", "k", "v"))
    val cs = ops.columnStatsOf(dir, ops.versions(dir).last)
    assert(cs("k")._1.contains(0L) && cs("v")._1.contains(200L),
      s"null counts must be exact: $cs")
    // HLL at lgK=12 is near-exact at these cardinalities
    assert(cs("k")._2.exists(n => n == 7L),
      s"k NDV must merge to 7 across files: $cs")
    assert(cs("id")._2.exists(n => math.abs(n - 1000L) <= 20),
      s"id NDV must be ~1000: $cs")
    withConf("spark.sql.cbo.enabled", "true") {
      val df = spark.sql(s"SELECT id, k, v FROM graft.`$dir`")
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1000)),
        s"exact row count lost: ${stats.rowCount}")
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.get("k").exists(_.distinctCount.exists(_ == BigInt(7))),
        s"k NDV must reach the optimizer: $byName")
      assert(byName.get("v").exists(_.nullCount.contains(BigInt(200))),
        s"v null count must reach the optimizer: $byName")
      // exact length stats: v = "v" + i over non-multiples of 5 →
      // 8 two-char + 72 three-char + 720 four-char = 3112/800 ≈ 3.9
      assert(byName.get("v").exists(s =>
        s.avgLen.contains(4L) && s.maxLen.contains(4L)),
        s"v avg/max length must reach the optimizer: $byName")
    }
    // the '#colstats' metadata view serves the same fold as data
    register()
    val view = spark.sql(s"SELECT * FROM graft.`$dir#colstats`")
      .collect().map(r => r.getString(0) ->
        ((r.get(1), r.get(2)))).toMap
    assert(view("k") == ((0L, 7L)), s"#colstats k row wrong: $view")
    assert(view("v")._1 == 200L, s"#colstats v nulls wrong: $view")
    // a snapshot with row-level delete debt reports NO column stats
    // (dead rows would inflate both ingredients)
    ops.deleteWhere(spark, dir, col("id") < 10)
    assert(ops.columnStatsOf(dir, ops.versions(dir).last).isEmpty,
      "delete debt must mute column stats")
    // plain landings don't pay the sketch cost (ANALYZE discipline)...
    val plain = tmpDir("sp-cbo-off")
    ops.declarePartitioning(plain, Seq("identity(k)"), 2)
    ops.commit((0 until 50).map(i => (i.toLong, s"k${i % 3}"))
      .toDF("id", "k"), plain)
    assert(ops.columnStatsOf(plain, ops.versions(plain).last).isEmpty,
      "per-landing commits must not record CBO sketches by default")
    // ...but stats.cbo=true opts a table into per-landing coverage
    val optin = tmpDir("sp-cbo-on")
    ops.setTableProperty(optin, "stats.cbo", "true")
    ops.declarePartitioning(optin, Seq("identity(k)"), 2)
    ops.commit((0 until 50).map(i => (i.toLong, s"k${i % 3}"))
      .toDF("id", "k"), optin)
    ops.commit((50 until 80).map(i => (i.toLong, s"k${i % 3}"))
      .toDF("id", "k"), optin)
    val on = ops.columnStatsOf(optin, ops.versions(optin).last)
    assert(on.get("k").exists(_._2.contains(3L)),
      s"opted-in landings must keep NDV coverage across commits: $on")
  }

  test("equi-height histograms: a range predicate on a skewed column " +
      "flips the join strategy — ndv + uniform interpolation cannot") {
    register()
    // BIG: 40k rows; 98% of x piles at 0, 2% spread uniformly to 1e6.
    // `x > 100000` truly keeps ~1.8% of rows; min/max interpolation says
    // 90%, and ndv knows nothing about WHERE the mass sits — only the
    // histogram prices this right.
    val big = tmpDir("sp-hist-big")
    ops.commit((0 until 40000).map { i =>
      val x = if (i % 50 == 0) (i % 40000) * 25.0 else 0.0
      (i.toLong, x, s"payload-$i")
    }.toDF("id", "x", "p"), big)
    ops.writeStats(spark, big, ops.versions(big).last, Seq("id", "x"))
    // the other side: large enough that IT never broadcasts
    val other = tmpDir("sp-hist-other")
    ops.commit((0 until 20000).map(i => (i.toLong, s"o-$i"))
      .toDF("id", "s"), other)
    ops.writeStats(spark, other, ops.versions(other).last, Seq("id"))
    val q =
      s"""SELECT b.id, o.s FROM graft.`$big` b
         |JOIN graft.`$other` o ON b.id = o.id
         |WHERE b.x > 100000.0""".stripMargin
    def filterEst(df: DataFrame): Option[BigInt] =
      df.queryExecution.optimizedPlan.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("100000") => f.stats.rowCount
      }.flatten
    withConf("spark.sql.cbo.enabled", "true") {
      withConf("spark.sql.autoBroadcastJoinThreshold", "65536") {
        withConf("spark.sql.statistics.histogram.enabled", "false") {
          val noHist = spark.sql(q)
          val est = filterEst(noHist)
          assert(est.forall(_ > BigInt(10000)),
            s"without a histogram the range estimate should stay big " +
              s"(uniform/unknown): $est")
          assert(planOf(noHist).contains("SortMergeJoin"),
            s"expected SMJ without histogram:\n${planOf(noHist)}")
        }
        withConf("spark.sql.statistics.histogram.enabled", "true") {
          val hist = spark.sql(q)
          val est = filterEst(hist)
          assert(est.exists(e => e > BigInt(0) && e < BigInt(5000)),
            s"the histogram must price the skewed range at ~1.8%: $est")
          assert(planOf(hist).contains("BroadcastHashJoin"),
            s"expected BHJ with histogram:\n${planOf(hist)}")
          // and the estimator never touched the answer: x = i*25 on
          // multiples of 50 → matches are i in {4050..19950 step 50}
          assert(hist.count() == 319L)
        }
      }
    }
  }

  // ---- LIMIT admission: `LIMIT n` over a bare snapshot read plans
  // only the minimal file cover the sidecar's exact per-file counts
  // prove sufficient — `show()` on a 100 TB table opens a handful of
  // files, and every unsound shape declines to the full list.

  /** 4 single-file commits of 100/50/20/5 rows. */
  private def limitTable(prefix: String): String = {
    val dir = tmpDir(prefix)
    Seq(100, 50, 20, 5).foldLeft(0) { (lo, n) =>
      ops.commit((lo until lo + n).map(i => (i.toLong, s"v$i"))
        .toDF("id", "s").coalesce(1), dir)
      lo + n
    }
    dir
  }

  test("LIMIT admits the minimal file cover from the rows sidecar") {
    register()
    val dir = limitTable("sp-limit")
    GraftCatalog.lastLimitAdmit = (0, 0)
    // 10 rows hide inside the single 100-row file
    assert(spark.sql(s"SELECT * FROM graft.`$dir` LIMIT 10").collect()
      .length == 10)
    assert(GraftCatalog.lastLimitAdmit == ((4, 1)),
      s"expected a 1-file cover: ${GraftCatalog.lastLimitAdmit}")
    // 120 rows need the two biggest files (100 + 50)
    assert(spark.sql(s"SELECT * FROM graft.`$dir` LIMIT 120").collect()
      .length == 120)
    assert(GraftCatalog.lastLimitAdmit == ((4, 2)),
      s"expected a 2-file cover: ${GraftCatalog.lastLimitAdmit}")
    // a limit past the table admits everything and serves everything
    assert(spark.sql(s"SELECT * FROM graft.`$dir` LIMIT 9999").collect()
      .length == 175)
    assert(GraftCatalog.lastLimitAdmit == ((4, 4)))
    // LIMIT 0 never reaches the scan (Spark folds the empty relation)
    assert(spark.sql(s"SELECT * FROM graft.`$dir` LIMIT 0").collect()
      .isEmpty)
  }

  test("LIMIT admission declines under filters and delete debt") {
    register()
    val dir = limitTable("sp-limit-decline")
    // a pushed data filter could discard rows inside admitted files
    // while dropped files held matches — admission must not fire
    GraftCatalog.lastLimitAdmit = (-1, -1)
    val filtered = spark.sql(
      s"SELECT * FROM graft.`$dir` WHERE id >= 170 LIMIT 10").collect()
    assert(filtered.length == 5, s"got ${filtered.length}")
    assert(GraftCatalog.lastLimitAdmit == ((-1, -1)),
      "admission must decline when a data filter is pushed")
    // row-level delete debt makes per-file live counts data-dependent;
    // the catalog row-read refuses MOR debt outright, so pin the
    // decline at the builder seam (belt-and-braces for any path that
    // constructs the builder without the refusal)
    ops.deleteWhere(spark, dir, col("id") < 99)
    val b = new PruningScanBuilder(spark, dir, ops.versions(dir).last,
      Seq.empty, ops.read(spark, dir).schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    assert(!b.pushLimit(10), "limit must not push under delete debt")
  }

  test("ORDER BY + LIMIT admits a range-stat cover in both directions") {
    register()
    val dir = limitTable("sp-topn") // 4 files: 0-99, 100-149, 150-169, 170-174
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("id", "s"))
    // ASC: the 100-row min-file alone covers 10; nothing else can reach
    // an id below its max
    GraftCatalog.lastTopNAdmit = (0, 0)
    val asc = spark.sql(
      s"SELECT id FROM graft.`$dir` ORDER BY id LIMIT 10").collect()
    assert(asc.map(_.getLong(0)).toSeq == (0L until 10L),
      s"wrong top rows: ${asc.mkString(",")}")
    assert(GraftCatalog.lastTopNAdmit == ((4, 1)),
      s"expected a 1-file ASC cover: ${GraftCatalog.lastTopNAdmit}")
    // DESC: the 5-row tail file can't cover 10 alone; it plus the next
    // newest can, and no other file's max reaches their enclosure
    val desc = spark.sql(
      s"SELECT id FROM graft.`$dir` ORDER BY id DESC LIMIT 10").collect()
    assert(desc.map(_.getLong(0)).toSeq == (174L to 165L by -1L),
      s"wrong tail rows: ${desc.mkString(",")}")
    assert(GraftCatalog.lastTopNAdmit == ((4, 2)),
      s"expected a 2-file DESC cover: ${GraftCatalog.lastTopNAdmit}")
    // secondary sort keys ride along — admission is by the primary key
    val multi = spark.sql(s"SELECT id FROM graft.`$dir` " +
      "ORDER BY id DESC, s ASC LIMIT 3").collect()
    assert(multi.map(_.getLong(0)).toSeq == Seq(174L, 173L, 172L))
  }

  test("TopN admission declines on nullable-unproved columns and " +
    "serves string orderings in UTF-8 byte order") {
    register()
    val dir = tmpDir("sp-topn-str")
    // s is nullable in the declared schema (Scala String) — without an
    // exact zero null count the proof fails and everything is admitted
    ops.commit(Seq((1L, "b x"), (2L, "a y")).toDF("id", "s").coalesce(1),
      dir)
    ops.commit(Seq((3L, "c z"), (4L, "d w")).toDF("id", "s").coalesce(1),
      dir)
    GraftCatalog.lastTopNAdmit = (-1, -1)
    val r0 = spark.sql(
      s"SELECT s FROM graft.`$dir` ORDER BY s LIMIT 1").collect()
    assert(r0.map(_.getString(0)).toSeq == Seq("a y"))
    assert(GraftCatalog.lastTopNAdmit == ((-1, -1)),
      "nullable column without a zero-null proof must decline")
    // ANALYZE writes exact null counts (0 here) — now the proof holds
    // and only the file whose range reaches 'a y' is admitted
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("s"))
    val r1 = spark.sql(
      s"SELECT s FROM graft.`$dir` ORDER BY s LIMIT 1").collect()
    assert(r1.map(_.getString(0)).toSeq == Seq("a y"))
    assert(GraftCatalog.lastTopNAdmit == ((2, 1)),
      s"expected a 1-file cover: ${GraftCatalog.lastTopNAdmit}")
  }

  test("histograms cover date and timestamp columns in catalyst-internal " +
      "units (days / micros), so literal comparisons price correctly") {
    register()
    val dir = tmpDir("sp-hist-time")
    ops.commit((0 until 300).map { i =>
      (i.toLong,
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(i % 100)),
        java.sql.Timestamp.valueOf(s"2024-01-01 00:0${i % 6}:00"))
    }.toDF("id", "d", "ts"), dir)
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("d", "ts"))
    val h = ops.histogramsOf(dir, ops.versions(dir).last)
    assert(h.contains("d") && h.contains("ts"), s"missing: ${h.keys}")
    // 2024-01-01 is day 19723 since the epoch
    assert(h("d")._1 == 19723.0 && h("d")._2 == 19822.0,
      s"date bounds must be DAYS: ${h("d")._1}..${h("d")._2}")
    // timestamps must be MICROS (~1.7e15 for 2024), not seconds
    assert(h("ts")._1 > 1.6e15 && h("ts")._2 < 1.8e15,
      s"timestamp bounds must be MICROS: ${h("ts")._1}..${h("ts")._2}")
  }

  test("TopN admission takes a declared-enforced NOT NULL as the " +
      "zero-null proof — no ANALYZE ever runs") {
    register()
    val dir = tmpDir("sp-topn-nn")
    // the DECLARATION supplies what the nullable-string test above needed
    // ANALYZE for: NOT NULL is commit-enforced (DefaultNotNullSpec), so
    // zero nulls holds by construction; clustered landings record the
    // range bounds at commit time — no write_stats call anywhere
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT NOT NULL, s STRING)")
    ops.commitClustered((0L until 100L).map(i => (i, s"r$i"))
      .toDF("id", "s"), dir, Seq("id"), Seq("id"), numFiles = 2)
    ops.commitClustered((100L until 200L).map(i => (i, s"r$i"))
      .toDF("id", "s"), dir, Seq("id"), Seq("id"), numFiles = 2)
    GraftCatalog.lastTopNAdmit = (-1, -1)
    val r = spark.sql(
      s"SELECT id FROM graft.`$dir` ORDER BY id LIMIT 5").collect()
    assert(r.map(_.getLong(0)).toSeq == (0L until 5L),
      s"wrong top rows: ${r.mkString(",")}")
    val (total, admitted) = GraftCatalog.lastTopNAdmit
    assert(total > 0 && admitted >= 1 && admitted < total,
      s"declared NOT NULL must admit a strict file cover with no " +
        s"ANALYZE: $total/$admitted")
  }

  test("a LIMIT-admitted scan opts out of runtime (DPP) filtering") {
    register()
    val dir = limitTable("sp-limit-dpp")
    // plan a limited scan directly through the builder seam and check
    // the runtime-filter contract: no filterable attributes
    val b = new PruningScanBuilder(spark, dir,
      ops.versions(dir).last, ops.read(spark, dir).inputFiles.toSeq
        .map(_.stripPrefix("file:")),
      ops.read(spark, dir).schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    assert(b.pushLimit(10), "bare-read limit must push")
    val scan = b.build()
    scan match {
      case s: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
        assert(s.filterAttributes().isEmpty,
          "limited scan must not offer runtime filtering")
      case other => fail(s"unexpected scan: $other")
    }
  }

  test("a '#changes=' slice never serves sidecar aggregates or " +
      "whole-snapshot statistics: COUNT(*) answers for the SLICE") {
    register()
    val dir = tmpDir("sp-slice-agg")
    ops.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), dir)       // v1: 2
    ops.commit(Seq((3L, "c")).toDF("id", "k"), dir)                  // v2: 1
    ops.commit(Seq((4L, "d"), (5L, "e")).toDF("id", "k"), dir)       // v3: 2
    ops.writeStats(spark, dir, 3, Seq("id", "k"))
    val q = spark.sql(
      s"SELECT count(*) AS n, min(id) AS mn, max(id) AS mx " +
        s"FROM graft.`$dir#changes=1..3`")
    // the sidecar fold describes the snapshot at v3 (5 rows, min 1);
    // the slice holds v2+v3's appends (3 rows, min 3) — so the agg must
    // DECLINE to the scan path and answer from the slice's files
    assertScans(q)
    val r = q.collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 5L,
      s"slice aggregate wrong: ${r.mkString(",")}")
    // statistics over the slice must not report the whole snapshot's rows
    val rel = spark.sql(s"SELECT * FROM graft.`$dir#changes=1..3`")
      .queryExecution.optimizedPlan.collectFirst {
        case s: DataSourceV2ScanRelation => s
      }.get
    rel.scan match {
      case s: SupportsReportStatistics =>
        val rows = s.estimateStatistics().numRows()
        assert(!rows.isPresent || rows.getAsLong == 3L,
          s"slice stats report snapshot rows: $rows")
      case _ => ()
    }
    // the whole-snapshot read still serves metadata-only
    assertMetadataOnly(
      spark.sql(s"SELECT count(*) AS n FROM graft.`$dir`"))
  }

  test("string extremes fold in UTF-8 order (Spark's collation), not " +
      "Java's UTF-16: supplementary-plane data gets the right MIN/MAX") {
    register()
    val dir = tmpDir("sp-utf8")
    // two files: one holds U+E000 (BMP private-use), one holds U+1F600
    // (supplementary). Java String order puts the surrogate pair FIRST;
    // UTF-8 byte order (what Spark's min/max wrote per file) puts it LAST.
    ops.commit(Seq((1L, "\uE000")).toDF("id", "s"), dir)
    ops.commit(Seq((2L, "\uD83D\uDE00")).toDF("id", "s"), dir)
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("s"))
    val q = spark.sql(s"SELECT min(s) AS mn, max(s) AS mx FROM graft.`$dir`")
    assertMetadataOnly(q)
    val r = q.collect()(0)
    val scanned = ops.read(spark, dir)
      .agg(min($"s"), max($"s")).collect()(0)
    assert(r.getString(0) == scanned.getString(0) &&
      r.getString(1) == scanned.getString(1),
      s"pushed extremes (${r.mkString(",")}) disagree with the scan " +
        s"(${scanned.mkString(",")})")
  }

  test("#colstats round-trips '+' and trailing-'%' string bounds " +
      "(regression: a second URL-decode corrupted or crashed the view)") {
    register()
    val dir = tmpDir("sp-colstats-esc")
    ops.commit(Seq((1L, "a+b"), (2L, "100%")).toDF("id", "s"), dir)
    ops.writeStats(spark, dir, ops.versions(dir).last, Seq("s"))
    val rows = spark.sql(
      s"SELECT min, max FROM graft.`$dir#colstats` WHERE column = 's'")
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "100%" && rows(0).getString(1) == "a+b",
      s"#colstats bounds wrong: ${rows(0).mkString(",")}")
  }

  private def withConf(key: String, value: String)(body: => Unit): Unit = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
