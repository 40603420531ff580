package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VersionedTable

/** The lake's SQL front door: catalog reads (head / VERSION AS OF /
  * TIMESTAMP AS OF) and CALL procedures must be the SAME operations as
  * the Scala API — same snapshots, same commit protocol, same refusals. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def register(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  test("SQL reads resolve snapshots: head, VERSION AS OF, TIMESTAMP AS OF") {
    register()
    val dir = tmpDir("gc-read")
    val v1 = ops.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), dir)
    ops.commit(Seq((3L, "c")).toDF("id", "k"), dir)
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 3)
    assert(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF $v1")
      .count() == 2)
    // any instant at/after the head commit resolves to the head (stamps
    // are millis; SQL hands micros — the seam under test)
    val ts = System.currentTimeMillis() + 60000L
    assert(spark.sql(s"SELECT * FROM graft.`$dir` " +
      s"TIMESTAMP AS OF timestamp_millis($ts)").count() == 3)
    // an instant before every stamp fails loudly, same as readAsOf
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir` " +
        "TIMESTAMP AS OF timestamp_millis(1000)").collect()
    }
    assert(e.getMessage.contains("no version at or before"))
  }

  test("catalog reads plan as native parquet scans with pushdown") {
    register()
    val dir = tmpDir("gc-plan")
    ops.commit(spark.range(0, 1000)
      .select(col("id"), (col("id") * 2).as("v")), dir)
    val df = spark.sql(s"SELECT id FROM graft.`$dir` WHERE id = 7")
    assert(df.as[Long].collect().toSeq == Seq(7L))
    // pre-AQE plan shows the DSv2 parquet scan with the filter pushed
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,7"),
      s"filter not pushed to the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint>"),
      s"column pruning lost:\n$plan")
  }

  test("CALL merge_into == Scala merge; the committed version comes back") {
    register()
    val dir = tmpDir("gc-merge")
    ops.commit(spark.range(0, 100)
      .select(col("id"), (col("id") * 2).as("payload")), dir)
    spark.range(0, 5)
      .select(col("id"), (col("id") * 100).as("payload"))
      .unionByName(spark.range(500, 505)
        .select(col("id"), (col("id") * 2).as("payload")))
      .createOrReplaceTempView("gc_merge_src")
    val res = spark.sql(
      s"CALL graft.merge_into('$dir', 'gc_merge_src', 'id')")
    assert(res.collect().map(_.getInt(0)).toSeq == Seq(2))
    val got = spark.sql(s"SELECT * FROM graft.`$dir`")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 105)
    assert((0L until 5L).forall(i => got(i) == i * 100))
    assert((5L until 100L).forall(i => got(i) == i * 2))
    assert((500L until 505L).forall(i => got(i) == i * 2))
  }

  test("CALL delete_where lands vectors; the MOR snapshot refuses a SQL " +
    "read until CALL compact materializes it") {
    register()
    val dir = tmpDir("gc-del")
    ops.commit(spark.range(0, 100)
      .select(col("id"), (col("id") * 2).as("payload")), dir)
    spark.sql(s"CALL graft.delete_where('$dir', 'id % 10 = 0')")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir`").collect()
    }
    assert(e.getMessage.contains("delete debt"),
      s"MOR snapshot served through SQL without the vectors: $e")
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 90)
    // Scala reader agrees at every step
    assert(ops.read(spark, dir).count() == 90)
  }

  test("CALL compact_where scopes the rewrite to the admitted slice and " +
    "types its bounds through the engine") {
    register()
    val dir = tmpDir("gc-cw")
    // three banded single-file landings + stats: the classic hot-window
    // maintenance shape
    Seq((0L, 100L), (100L, 200L), (200L, 300L)).foreach { case (lo, hi) =>
      ops.commit(spark.range(lo, hi)
        .select(col("id"), (col("id") * 2).as("payload"))
        .coalesce(1), dir)
    }
    val v0 = ops.versions(dir).last
    ops.writeStats(spark, dir, v0, Seq("id"))
    val before = ops.prunedFiles(dir, v0, "id", 0L, 300L)
    assert(before.size == 3)
    val band2 = ops.prunedFiles(dir, v0, "id", 200L, 299L).toSet
    assert(band2.size == 1)
    // bounds arrive as STRINGS; the procedure casts them to the column
    // type before admission (a raw string bound against a numeric
    // column would admit everything)
    val res = spark.sql(
      s"CALL graft.compact_where('$dir', 'id', '0', '99', '${1L << 30}')")
    assert(res.collect().map(_.getInt(0)).toSeq ==
      Seq(ops.versions(dir).last))
    val after = ops.prunedFiles(dir, ops.versions(dir).last,
      "id", 0L, 300L)
    // band 0 was one file already >= minInputFiles? no: 1 file, no debt
    // -> no-op; widen the scope across two bands and it packs them
    assert(after.toSet == before.toSet, "single-file scope must no-op")
    spark.sql(
      s"CALL graft.compact_where('$dir', 'id', '0', '199', '${1L << 30}')")
    val packed = ops.prunedFiles(dir, ops.versions(dir).last,
      "id", 0L, 300L)
    assert(packed.size == 2, s"expected band 0+1 packed: ${packed.size}")
    // the out-of-scope band-2 file survives at its ORIGINAL path
    assert(band2.subsetOf(packed.toSet), "out-of-scope band rewritten")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$dir`")
      .head().getLong(0) == 300L)
    // unknown column / uncastable bound refuse loudly
    intercept[Exception] {
      spark.sql(
        s"CALL graft.compact_where('$dir', 'id', 'zap', 'pow', '1024')")
        .collect()
    }
  }

  test("CALL apply_changes / optimize_zorder / rollback / write_stats " +
    "round-trip through SQL") {
    register()
    val dir = tmpDir("gc-maint")
    ops.commit(spark.range(0, 200)
      .select(col("id"), (col("id") * 2).as("payload")), dir)
    Seq((1L, 111L, "u"), (2L, 222L, "u"), (3L, 0L, "d"))
      .toDF("id", "payload", "op").createOrReplaceTempView("gc_changes")
    spark.sql(s"CALL graft.apply_changes('$dir', 'gc_changes', 'id', 'op')")
    val got = spark.sql(s"SELECT * FROM graft.`$dir`")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 111L && got(2L) == 222L && !got.contains(3L))
    spark.sql(s"CALL graft.optimize_zorder('$dir', 'id')")
    spark.sql(s"CALL graft.write_stats('$dir', 'id')")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 199)
    val before = ops.versions(dir).last
    val res = spark.sql(s"CALL graft.rollback('$dir', '1')")
    assert(res.collect().head.getInt(0) == before + 1)
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 200)
  }

  test("unknown procedures and missing tables fail loudly") {
    register()
    val e1 = intercept[Exception] {
      spark.sql("CALL graft.no_such_proc('x')").collect()
    }
    // Spark wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE; the
    // catalog's surface listing rides in the cause chain
    val msgs = Iterator.iterate(e1: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(msgs.contains("merge_into"),
      s"the error must list the known procedure surface:\n$msgs")
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`${tmpDir("gc-empty")}`").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("table"))
  }

  test("CREATE TABLE PARTITIONED BY declares hidden partitioning; " +
      "INSERT INTO lands clustered commits through it") {
    register()
    val dir = tmpDir("gc-ddl")
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, ts TIMESTAMP, k STRING, v DOUBLE) " +
      "PARTITIONED BY (days(ts), bucket(4, k)) " +
      "TBLPROPERTIES ('files' = '4')")
    assert(ops.partitioningOf(dir).map(_.spec) ==
      Seq("days(ts)", "bucket(4,k)"))
    // the declared-but-empty table resolves and scans empty
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 0)
    // INSERT INTO is a plain commit: constraints, OCC, stats and the
    // declared clustering all apply — v1 lands as version 1
    spark.range(0, 200).selectExpr("id",
      "timestamp_millis(1704067200000 + (id % 10) * 86400000) AS ts",
      "concat('k', id % 8) AS k", "id * 1.5 AS v")
      .createOrReplaceTempView("gc_ddl_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM gc_ddl_src")
    assert(ops.versions(dir) == Seq(1))
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 200)
    // re-create collides loudly; unsupported transforms fail loudly
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT)")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"))
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmpDir("gc-ddl2")}` " +
        "(id BIGINT, ts TIMESTAMP) PARTITIONED BY (hours(ts))")
    }
    assert(e2.getMessage.contains("unsupported partition transform"))
  }

  test("SQL WHERE prunes files at the manifest level: ranges, bucket " +
      "equality, and the superset guarantee") {
    register()
    val dir = tmpDir("gc-prune")
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, ts TIMESTAMP, k STRING, v DOUBLE) " +
      "PARTITIONED BY (days(ts), bucket(4, k)) " +
      "TBLPROPERTIES ('files' = '8')")
    def src(lo: Int, hi: Int) = spark.range(lo, hi).selectExpr("id",
      "timestamp_millis(1704067200000 + (id % 10) * 86400000) AS ts",
      "concat('k', id % 8) AS k", "id * 1.5 AS v")
    src(0, 400).createOrReplaceTempView("gc_prune_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM gc_prune_src")
    src(400, 800).createOrReplaceTempView("gc_prune_src2")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM gc_prune_src2")
    // a one-day window touches a file subset; rows match the unpruned scan
    val n = spark.sql(s"SELECT COUNT(*) FROM graft.`$dir` " +
      "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' " +
      "AND ts < TIMESTAMP '2024-01-04 00:00:00'").head().getLong(0)
    val (total, kept) = GraftCatalog.lastScanPrune
    assert(n == 80L, s"window row count wrong: $n")
    assert(kept < total && total == 16,
      s"date WHERE kept $kept of $total files — SQL pruning inert")
    // untranslatable predicates prune nothing and lose nothing
    val nOr = spark.sql(s"SELECT COUNT(*) FROM graft.`$dir` " +
      "WHERE k = 'k3' OR k = 'k5'").head().getLong(0)
    assert(nOr == 200L, s"OR predicate row count wrong: $nOr")
    // bucket equality wants a bucket-FIRST layout (on the composite table
    // above, files spanning a day boundary carry the full bucket range):
    // WHERE k = ... / k IN (...) admit a file subset via the derived
    // transform stat, with zero per-key index
    val bdir = tmpDir("gc-prune-b")
    spark.sql(s"CREATE TABLE graft.`$bdir` " +
      "(id BIGINT, ts TIMESTAMP, k STRING, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('files' = '8')")
    spark.sql(s"INSERT INTO graft.`$bdir` SELECT * FROM gc_prune_src")
    val nk = spark.sql(s"SELECT COUNT(*) FROM graft.`$bdir` WHERE k = 'k3'")
      .head().getLong(0)
    val (totalK, keptK) = GraftCatalog.lastScanPrune
    assert(nk == 50L, s"bucket row count wrong: $nk")
    assert(keptK < totalK,
      s"bucket WHERE kept $keptK of $totalK files")
    val nIn = spark.sql(s"SELECT COUNT(*) FROM graft.`$bdir` " +
      "WHERE k IN ('k3', 'k5')").head().getLong(0)
    val (totalI, keptI) = GraftCatalog.lastScanPrune
    assert(nIn == 100L, s"IN row count wrong: $nIn")
    assert(keptI < totalI, s"IN probe kept $keptI of $totalI files")
  }

  test("ALTER TABLE ADD COLUMNS evolves the declared schema: old files " +
      "serve typed nulls, new landings carry the column") {
    register()
    val dir = tmpDir("gc-alter")
    ops.commit(spark.range(0, 50)
      .select(col("id"), (col("id") * 2).as("v")), dir)
    // Scala-created table (no declaration): ALTER infers from the head
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (note STRING)")
    val head = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(head.schema.fieldNames.toSeq == Seq("id", "v", "note"))
    assert(head.where(col("note").isNull).count() == 50)
    spark.range(50, 60).select(col("id"), (col("id") * 2).as("v"),
      concat(lit("n"), col("id").cast("string")).as("note"))
      .createOrReplaceTempView("gc_alter_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM gc_alter_src")
    assert(spark.sql(s"SELECT COUNT(note) FROM graft.`$dir`")
      .head().getLong(0) == 10)
    // DROP projects the column away without touching files
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN note")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`")
      .schema.fieldNames.toSeq == Seq("id", "v"))
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 60)
  }

  test("ALTER TABLE refusals: non-nullable add without a default, " +
      "partition anchors, the last column (renames are now metadata-only " +
      "legal — RenameWidenSpec)") {
    register()
    val dir = tmpDir("gc-alter-no")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, k STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    // NOT NULL with no default cannot cover already-landed history;
    // WITH a non-null default it is legal (DefaultNotNullSpec)
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (c BIGINT NOT NULL)")
    }
    assert(e1.getMessage.contains("non-null DEFAULT"))
    // RENAME COLUMN is supported since the column-id indirection landed —
    // including on a partition-anchored column (transforms anchor the
    // PHYSICAL name); the partition-drop refusal keys on it regardless
    // of the current logical spelling
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN k TO kk")
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN kk")
    }
    assert(e3.getMessage.contains("partitioning"))
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN id")
    val e4 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN kk")
    }
    assert(e4.getMessage.contains("partitioning") ||
      e4.getMessage.contains("last column"))
  }

  test("ref fragments address tags, branches and metadata views; " +
      "procedures create them") {
    register()
    val dir = tmpDir("gc-refs")
    ops.commit(spark.range(0, 40)
      .select(col("id"), (col("id") * 2).as("v")), dir)
    spark.sql(s"CALL graft.create_tag('$dir', 'audit-1', 'head')")
    ops.commit(spark.range(40, 100)
      .select(col("id"), (col("id") * 2).as("v")), dir)
    // the tag pins v1 while the head moved on
    assert(spark.sql(s"SELECT * FROM graft.`$dir#tag=audit-1`")
      .count() == 40)
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 100)
    val eTag = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir#tag=audit-1` VERSION AS OF 2")
        .collect()
    }
    assert(eTag.getMessage.contains("pins a version"))
    // branch: fork, land, read both lineages, pinned version on the fork
    spark.sql(s"CALL graft.create_branch('$dir', 'exp', 'head')")
    spark.range(100, 120).select(col("id"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("gc_refs_src")
    spark.sql(s"INSERT INTO graft.`$dir#branch=exp` " +
      "SELECT * FROM gc_refs_src")
    assert(spark.sql(s"SELECT * FROM graft.`$dir#branch=exp`")
      .count() == 120)
    assert(spark.sql(
      s"SELECT * FROM graft.`$dir#branch=exp` VERSION AS OF 1").count() == 100)
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 100)
    val eBr = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir#branch=nope`").collect()
    }
    assert(eBr.getMessage.contains("no live branch"))
    // metadata views: history rows = versions, files rows = head files
    val hist = spark.sql(
      s"SELECT version, n_files FROM graft.`$dir#history`")
    assert(hist.count() == 2)
    val files = spark.sql(s"SELECT * FROM graft.`$dir#files`")
    assert(files.columns.toSeq ==
      Seq("file", "size_bytes", "n_deleted"))
    // a manifest lists the snapshot's FULL live file set, so the head
    // inventory matches the newest history row's n_files
    assert(files.count() ==
      hist.orderBy(col("version").desc).head().getLong(1))
    // fast-forward publishes the branch into the parent
    val ff = spark.sql(s"CALL graft.fast_forward('$dir', 'exp')")
    assert(ff.collect().head.getInt(0) == 3)
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 120)
  }

  test("native DELETE FROM lands positional vectors for translatable AND " +
      "expression predicates") {
    register()
    val dir = tmpDir("gc-delfrom")
    ops.commit(spark.range(0, 100)
      .select(col("id"), (col("id") * 2).as("v")), dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 90")
    // same MOR contract as CALL delete_where: SQL reads refuse until
    // compaction materializes; the Scala reader serves the vectors
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir`").collect()
    }
    assert(ops.read(spark, dir).count() == 90)
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 90)
    // compound conditions: IN ∪ range → ids {0,1,2} ∪ {0..5} = 6 rows
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id IN (0, 1, 2) OR v <= 10")
    assert(ops.read(spark, dir).count() == 84)
    // an arithmetic condition has no source-filter form — the DML
    // strategy routes it through the scanning deleteWhere instead:
    // live ids 6..89, id%10=3 → {13,23,…,83} = 8 rows
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id % 10 = 3")
    assert(ops.read(spark, dir).count() == 76)
    // bare DELETE FROM is the empty conjunction: every row
    spark.sql(s"DELETE FROM graft.`$dir`")
    assert(ops.read(spark, dir).count() == 0)
  }

  test("native UPDATE is one merge-on-read commit: delete vector plus " +
      "updated copies, untouched rows never rewritten") {
    register()
    val dir = tmpDir("gc-upd")
    ops.commit(spark.range(0, 100).select(col("id"),
      (col("id") * 2).as("v"), lit("x").as("k")), dir)
    spark.sql(
      s"UPDATE graft.`$dir` SET v = v + 1000, k = 'y' WHERE id % 10 = 0")
    // ONE new version carries the whole statement
    assert(ops.versions(dir) == Seq(1, 2))
    // merge-on-read: the Scala reader serves it, the SQL read refuses
    // until compaction (same contract as DELETE)
    val got = ops.read(spark, dir)
    assert(got.count() == 100)
    assert(got.filter(col("k") === "y").count() == 10)
    assert(got.filter(col("id") === 40)
      .select(col("v")).head().getLong(0) == 1080)
    assert(got.filter(col("id") === 41)
      .select(col("v")).head().getLong(0) == 82)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir`").collect()
    }
    // a no-match UPDATE publishes nothing
    spark.sql(s"UPDATE graft.`$dir` SET v = 0 WHERE id > 100000")
    assert(ops.versions(dir) == Seq(1, 2))
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')")
    assert(spark.sql(s"SELECT SUM(v) FROM graft.`$dir`").head().getLong(0) ==
      (0L until 100L).map(i => if (i % 10 == 0) i * 2 + 1000 else i * 2).sum)
  }

  test("native MERGE INTO upsert routes to the engine's file-scoped " +
      "merge; unsupported clause shapes refuse loudly") {
    register()
    val dir = tmpDir("gc-mrg")
    ops.commit(spark.range(0, 100)
      .select(col("id"), (col("id") * 2).as("payload")), dir)
    spark.range(0, 5).select(col("id"), (col("id") * 100).as("payload"))
      .unionByName(spark.range(500, 505)
        .select(col("id"), (col("id") * 2).as("payload")))
      .createOrReplaceTempView("gc_mrg_src")
    spark.sql(s"MERGE INTO graft.`$dir` t USING gc_mrg_src s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    val got = spark.sql(s"SELECT * FROM graft.`$dir`")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 105)
    assert((0L until 5L).forall(i => got(i) == i * 100))
    assert((5L until 100L).forall(i => got(i) == i * 2))
    assert((500L until 505L).forall(i => got(i) == i * 2))
    // the explicit column-aligned spelling matches too
    spark.range(0, 3).select(col("id"), lit(7L).as("payload"))
      .createOrReplaceTempView("gc_mrg_src2")
    spark.sql(s"MERGE INTO graft.`$dir` t USING gc_mrg_src2 s " +
      "ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET t.id = s.id, t.payload = s.payload " +
      "WHEN NOT MATCHED THEN INSERT (id, payload) VALUES (s.id, s.payload)")
    assert(spark.sql(s"SELECT * FROM graft.`$dir` WHERE payload = 7")
      .count() == 3)
    // WHEN MATCHED DELETE routes through the general full-clause merge
    // since round 9 (MergeFullSpec pins its semantics)
    spark.sql(s"MERGE INTO graft.`$dir` t USING gc_mrg_src2 s " +
      "ON t.id = s.id WHEN MATCHED THEN DELETE")
    assert(spark.sql(s"SELECT * FROM graft.`$dir` WHERE id < 3").count() == 0)
    // clause shapes with no engine equivalent (non-equality ON) refuse
    // rather than silently approximating
    val e = intercept[Exception] {
      spark.sql(s"MERGE INTO graft.`$dir` t USING gc_mrg_src s " +
        "ON t.id < s.id WHEN MATCHED THEN DELETE")
    }
    assert(e.getMessage.contains("MERGE INTO"))
  }

  test("CALL promote / vacuum_orphans drive write-audit-publish from SQL") {
    register()
    val staging = tmpDir("gc-wap-stage")
    val prod = tmpDir("gc-wap-prod")
    ops.commit(spark.range(0, 30)
      .select(col("id"), (col("id") * 2).as("v")), prod)
    ops.commit(spark.range(30, 50)
      .select(col("id"), (col("id") * 2).as("v")), staging)
    val res = spark.sql(
      s"CALL graft.promote('$staging', '$prod', 'append')")
    assert(res.collect().head.getInt(0) == 2)
    assert(spark.sql(s"SELECT * FROM graft.`$prod`").count() == 50)
    // nothing is orphaned by a zero-copy promotion
    val rm = spark.sql(s"CALL graft.vacuum_orphans('$prod', '0')")
    assert(rm.collect().head.getInt(0) == 0)
    assert(rm.schema.fieldNames.toSeq == Seq("removed"))
    assert(spark.sql(s"SELECT * FROM graft.`$prod`").count() == 50)
  }

  test("INSERT OVERWRITE truncates to a fresh snapshot; INSERT into a " +
      "MOR table works while SELECT refuses") {
    register()
    val dir = tmpDir("gc-ow")
    ops.commit(spark.range(0, 50).select(col("id"),
      (col("id") * 2).as("v")), dir)
    spark.range(100, 120).select(col("id"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("gc_ow_src")
    spark.sql(s"INSERT OVERWRITE graft.`$dir` SELECT * FROM gc_ow_src")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 20)
    // the overwrite is a LOGICAL overwrite: v1 still reads in full
    assert(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1")
      .count() == 50)
    // land delete debt: reads refuse, appends keep working (an insert
    // never serves rows, so there is nothing to corrupt)
    ops.deleteWhere(spark, dir, col("id") < 105L)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir`").collect()
    }
    assert(e.getMessage.contains("delete debt"))
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM gc_ow_src")
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 35)
  }

  test("CALL write_blooms builds point-lookup skipping from SQL (the " +
    "post-widening rebuild path the ALTER refusal names)") {
    register()
    val dir = tmpDir("gc-blooms")
    ops.commitClustered(spark.range(0, 4000)
      .select((col("id") * 7919 % 4000).as("k"), col("id").as("v")),
      dir, zCols = Seq("v"), statCols = Seq("v"), numFiles = 8)
    spark.sql(s"CALL graft.write_blooms('$dir', 'k', '${1 << 16}')")
    val v = ops.versions(dir).last
    val kept = ops.prunedFilesEq(spark, dir, v, "k", Seq(42L))
    val all = ops.filesMeta(spark, dir).count()
    assert(kept.size < all,
      s"bloom probe kept ${kept.size} of $all files — write_blooms inert")
    assert(ops.prunedReadIn(spark, dir, "k", Seq(42L))
      .filter(col("k") === 42L).count() ==
      ops.read(spark, dir).filter(col("k") === 42L).count())
  }

  test("DML through a #branch= fragment mutates the branch lineage " +
    "only: UPDATE, DELETE and MERGE leave the parent untouched") {
    register()
    val dir = tmpDir("gc-branch-dml")
    ops.commit(spark.range(0, 20).select(col("id"), (col("id") * 2).as("v")),
      dir)
    spark.sql(s"CALL graft.create_branch('$dir', 'work', 'head')")
    val bd = ops.resolveBranch(dir, "work")
    val parentVersions = ops.versions(dir)
    // UPDATE on the branch
    spark.sql(s"UPDATE graft.`$dir#branch=work` SET v = v + 100 " +
      "WHERE id < 3")
    // DELETE on the branch (translatable predicate -> SupportsDelete path)
    spark.sql(s"DELETE FROM graft.`$dir#branch=work` WHERE id = 10")
    // MERGE on the branch
    spark.range(18, 22).select(col("id"), lit(-1L).as("v"))
      .createOrReplaceTempView("gc_bdml_src")
    spark.sql(s"MERGE INTO graft.`$dir#branch=work` t USING gc_bdml_src s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    // parent lineage: not one new version, not one changed row
    assert(ops.versions(dir) == parentVersions,
      "branch DML landed a commit on the parent")
    val parent = ops.read(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(parent.size == 20 && (0L until 20L).forall(i => parent(i) == i * 2))
    // branch lineage carries all three mutations
    ops.compactIfDebt(spark, bd)
    val branch = ops.read(spark, bd).as[(Long, Long)].collect().toMap
    assert((0L until 3L).forall(i => branch(i) == i * 2 + 100),
      "branch UPDATE missing")
    assert(!branch.contains(10L), "branch DELETE missing")
    assert((18L to 21L).forall(branch(_) == -1L), "branch MERGE missing")
    assert(branch.size == 21)
  }

  test("CALL minhash_dedup lands the same survivors as the Scala " +
    "MinHash-LSH pipeline; results live in the lake, not the driver") {
    register()
    import graft.ext.DedupOps
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("gc_mh_docs")
    val out = tmpDir("gc-mh") + "/out"
    val res = spark.sql(
      s"CALL graft.minhash_dedup('gc_mh_docs', '$out', '3', '0.5')")
    assert(res.collect().map(_.getInt(0)).toSeq == Seq(1))
    val landed = spark.sql(s"SELECT doc_id FROM graft.`$out`")
      .as[Long].collect().toSet
    val verified = DedupOps.verifyJaccard(
      DedupOps.minhashCandidates(DedupOps.minhashSignatures(docs, 3)),
      docs, 3).filter(col("jaccard") >= 0.5)
    val dropIds = verified.select("id_b").distinct()
      .as[Long].collect().toSet
    val expect = docs.select("doc_id").as[Long].collect().toSet -- dropIds
    assert(landed == expect,
      s"survivors differ: extra=${(landed -- expect).size} " +
        s"missing=${(expect -- landed).size}")
    assert(dropIds.nonEmpty, "test corpus has no near-dups — inert test")
  }

  test("'#changes=A..B' serves the appended slice read-only; refusals " +
    "mirror readChanges") {
    register()
    val dir = tmpDir("gc-changes")
    ops.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), dir)
    ops.commit(Seq((3L, "c")).toDF("id", "k"), dir)
    ops.commit(Seq((4L, "d"), (5L, "e")).toDF("id", "k"), dir)
    // the slice: rows of v2+v3, never v1's
    val got = spark.sql(s"SELECT id FROM graft.`$dir#changes=1..3`")
      .as[Long].collect().toSet
    assert(got == Set(3L, 4L, 5L))
    // empty range
    assert(spark.sql(s"SELECT * FROM graft.`$dir#changes=2..2`")
      .count() == 0)
    // AS OF cannot re-pin a pinned range
    val asOf = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir#changes=1..3` VERSION AS OF 2")
        .collect()
    }
    assert(asOf.getMessage.contains("pins both endpoints"))
    // the handle is read-only: INSERT must refuse rather than land on
    // some surprise lineage
    val ins = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir#changes=1..3` VALUES (9, 'z')")
    }
    assert(ins.getMessage.toLowerCase.contains("read-only") ||
      ins.getMessage.toLowerCase.contains("does not support"))
    // malformed range refuses loudly instead of degrading to a head read
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir#changes=1..`").collect()
    }
    assert(bad.getMessage.contains("malformed changes fragment"))
    // non-append lineage refuses with the Scala API's message
    val dir2 = tmpDir("gc-changes-ow")
    ops.commit(Seq((1L, "a")).toDF("id", "k"), dir2)
    ops.commit(Seq((2L, "b")).toDF("id", "k"), dir2, append = false)
    val ow = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir2#changes=1..2`").collect()
    }
    assert(ow.getMessage.contains("pure appends"))
  }

  test("CALL change_feed lands the keyed i/u/d diff as a table") {
    register()
    val dir = tmpDir("gc-cdf")
    val out = tmpDir("gc-cdf-out") + "/feed"
    ops.commit(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"), dir)
    ops.commit(Seq((1L, 10.0), (2L, 25.0), (4L, 40.0)).toDF("id", "v"), dir,
      append = false) // update 2, delete 3, insert 4 — across an overwrite
    spark.sql(s"CALL graft.change_feed('$dir', '$out', 'id', '1', '2')")
    val feed = spark.sql(s"SELECT id, v, op FROM graft.`$out`")
      .as[(Long, Double, String)].collect().toSet
    assert(feed == Set((2L, 25.0, "u"), (3L, 30.0, "d"), (4L, 40.0, "i")),
      s"feed mismatch: $feed")
  }

  test("'#segments' exposes the metadata layout: pointer counts, " +
    "payload entries, covers") {
    register()
    val dir = tmpDir("gc-segments")
    ops.commitClustered(
      spark.range(0, 100).selectExpr("id", "id % 5 AS k"),
      dir, zCols = Seq("id"), statCols = Seq("id"), numFiles = 2)
    ops.commit(spark.range(100, 150).selectExpr("id", "id % 5 AS k"), dir)
    val segs = spark.sql(s"SELECT * FROM graft.`$dir#segments`")
      .as[(String, String, Long, Long, String)].collect()
    val manifest = segs.filter(_._1 == "manifest").filter(_._2 != "(inline)")
    assert(manifest.length == 2, s"expected 2 manifest pointers: ${segs.toSeq}")
    // 2 clustered files + however many part-files the plain append wrote
    assert(manifest.map(_._3).sum >= 3 && manifest.forall(_._3 >= 1),
      s"pointer entries wrong: ${manifest.toSeq}")
    // the clustered commit's pointer recorded an id cover
    assert(segs.exists(r => r._1 == "manifest" && r._5.contains("id:[")),
      s"clustered segment must carry a cover: ${segs.toSeq}")
    assert(segs.exists(_._1 == "sidecar"))
  }

  test("warehouse root: bare names resolve under it; SHOW NAMESPACES / " +
    "SHOW TABLES enumerate; CTAS + DROP TABLE complete the lifecycle") {
    val wh = tmpDir("gc-wh")
    spark.conf.set("spark.sql.catalog.gwh", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwh.warehouse", wh)
    spark.sql("CREATE NAMESPACE gwh.db")
    assert(spark.sql("SHOW NAMESPACES IN gwh").as[String].collect()
      .toSeq == Seq("db"))
    // a bare qualified name is a real name, not a cwd-relative path
    spark.sql("CREATE TABLE gwh.db.t (id BIGINT, k STRING)")
    spark.sql("INSERT INTO gwh.db.t VALUES (1, 'a'), (2, 'b')")
    assert(ops.versions(s"$wh/db/t").nonEmpty,
      "bare name must land under the warehouse root")
    assert(spark.sql("SELECT * FROM gwh.db.t").count() == 2)
    // CTAS goes through createTable + append (+ dropTable on failure)
    spark.sql("CREATE TABLE gwh.db.t2 AS SELECT id * 10 AS id FROM gwh.db.t")
    assert(spark.sql("SELECT sum(id) FROM gwh.db.t2").head().getLong(0) == 30L)
    assert(spark.sql("SHOW TABLES IN gwh.db").select("tableName")
      .as[String].collect().toSeq.sorted == Seq("t", "t2"))
    // namespaces never surface tables and vice versa
    assert(spark.sql("SHOW NAMESPACES IN gwh.db").count() == 0)
    spark.sql("DROP TABLE gwh.db.t2")
    assert(spark.sql("SHOW TABLES IN gwh.db").count() == 1)
    assert(ops.versions(s"$wh/db/t2").isEmpty &&
      !ops.isDirectory(s"$wh/db/t2"), "DROP TABLE must purge the directory")
    // a non-empty namespace refuses a plain drop; CASCADE purges
    assertThrows[Exception](spark.sql("DROP NAMESPACE gwh.db"))
    spark.sql("DROP NAMESPACE gwh.db CASCADE")
    assert(spark.sql("SHOW NAMESPACES IN gwh").count() == 0)
  }

  test("REPLACE TABLE AS SELECT: one atomic logical-overwrite snapshot; " +
    "surviving columns stay time-travelable, re-typed ones never " +
    "resurrect old bytes") {
    register()
    val dir = tmpDir("gc-rtas") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` AS " +
      "SELECT * FROM VALUES (1, 'a', 10.0), (2, 'b', 20.0) AS t(id, k, v)")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 2)
    // REPLACE: id survives (same type), k is dropped, v re-types to
    // STRING (fresh column), n is new
    spark.sql(s"REPLACE TABLE graft.`$dir` AS " +
      "SELECT * FROM VALUES (7, 'x7', 70), (8, 'x8', 80) AS t(id, v, n)")
    val now = spark.sql(s"SELECT id, v, n FROM graft.`$dir` ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(now == Seq((7, "x7", 70), (8, "x8", 80)))
    // history survives the replace: v1 is still pinned-readable, its
    // surviving column serves old values, the re-typed one serves NULL
    // (fresh physical name — old bytes are unreachable by construction)
    val v1 = spark.sql(s"SELECT id, v FROM graft.`$dir` VERSION AS OF 1 " +
      "ORDER BY id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(v1 == Seq((1, null), (2, null)),
      s"re-typed column must NOT resurrect the old doubles: $v1")
    // CREATE OR REPLACE on an absent table is a plain create
    val dir2 = tmpDir("gc-cor") + "/t"
    spark.sql(s"CREATE OR REPLACE TABLE graft.`$dir2` AS SELECT 1 AS one")
    assert(spark.sql(s"SELECT one FROM graft.`$dir2`").head().getInt(0) == 1)
    // REPLACE of a missing table refuses
    assertThrows[Exception](spark.sql(
      s"REPLACE TABLE graft.`${tmpDir("gc-norep")}/absent` AS SELECT 1 AS x"))
  }

  test("staged CTAS carries PARTITIONED BY and TBLPROPERTIES: the CTAS " +
    "batch lands transform-clustered and the properties persist") {
    register()
    val dir = tmpDir("gc-ctas-part") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "PARTITIONED BY (bucket(4, id)) " +
      "TBLPROPERTIES ('files' = '4', 'compact.auto.files' = '32') AS " +
      "SELECT id, CAST(id % 7 AS STRING) AS k FROM RANGE(0, 1000)")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`")
      .head().getLong(0) == 1000L)
    // the declaration took: partitioning + the durable property
    assert(ops.partitioningOf(dir).map(_.spec) == Seq("bucket(4,id)"))
    assert(ops.tableProperties(dir).get("compact.auto.files")
      .contains("32"))
    // and the CTAS batch itself clustered by it: a bucket EQUALITY
    // probe prunes files (DERIVED stats recorded at the staged landing)
    val v = ops.versions(dir).last
    val all = ops.prunedFiles(dir, v, "id", Long.MinValue, Long.MaxValue)
    val kept = ops.prunedFilesEq(spark, dir, v, "id", Seq(7L))
    assert(kept.size < all.size,
      s"CTAS landing must cluster by the declared bucket: " +
        s"${kept.size}/${all.size} files for one key")
    // INSERTs keep flowing through the same declaration
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (2000, 'x')")
    assert(spark.sql(s"SELECT k FROM graft.`$dir` WHERE id = 2000")
      .head().getString(0) == "x")
  }

  test("staged-create abort purges exactly the engine's artifacts; a " +
    "pre-existing directory's other children survive") {
    register()
    val parent = tmpDir("gc-stage-abort")
    val backendIo = graft.sinks.TableIO.local
    backendIo.writeLines(s"$parent/bystander.txt", Seq("keep me"))
    val cat = new GraftCatalog
    cat.initialize("graft",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    val info = new org.apache.spark.sql.connector.catalog.TableInfo.Builder()
      .withColumns(Array(org.apache.spark.sql.connector.catalog.Column
        .create("id", org.apache.spark.sql.types.LongType)))
      .withProperties(java.util.Collections.emptyMap())
      .withPartitions(Array.empty).build()
    val staged = cat.stageCreate(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], parent), info)
    // abort before any write: nothing to clean, bystander intact
    staged.abortStagedChanges()
    assert(backendIo.readLines(s"$parent/bystander.txt") == Seq("keep me"))
    assert(!backendIo.exists(s"$parent/manifests"))
  }

  test("CALL declare_partitioning / delete_tag / drop_branch complete " +
    "the lifecycle surface from SQL") {
    register()
    val dir = tmpDir("gc-lifecycle")
    ops.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), dir)
    // declare-then-land: the next INSERT clusters by the new spec
    spark.sql(
      s"CALL graft.declare_partitioning('$dir', 'bucket(4,id)', '4')")
    assert(ops.partitioningOf(dir).map(_.spec) == Seq("bucket(4,id)"))
    spark.sql(s"CALL graft.create_tag('$dir', 'keep', '1')")
    assert(ops.tags(dir).contains("keep"))
    spark.sql(s"CALL graft.delete_tag('$dir', 'keep')")
    assert(!ops.tags(dir).contains("keep"))
    spark.sql(s"CALL graft.create_branch('$dir', 'exp', '1')")
    assert(ops.branches(dir).contains("exp"))
    spark.sql(s"CALL graft.drop_branch('$dir', 'exp')")
    assert(!ops.branches(dir).contains("exp"))
  }

  test("TRUNCATE TABLE publishes one empty overwrite snapshot - no " +
    "delete vectors, history time-travelable, rollback undoes it") {
    register()
    val dir = tmpDir("gc-trunc")
    ops.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), dir)
    spark.sql(s"TRUNCATE TABLE graft.`$dir`")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 0)
    // the truncate is a snapshot, not a merge-on-read debt bomb
    assert(ops.versions(dir) == Seq(1, 2))
    assert(ops.fastCount(spark, dir) == 0L,
      "an empty overwrite must leave the metadata path clean")
    assert(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1")
      .count() == 2, "prior versions stay time-travelable")
    ops.rollback(dir, 1)
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 2)
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES routes to the durable store; " +
    "SHOW TBLPROPERTIES serves it; maintenance knobs become SQL-settable") {
    register()
    val dir = tmpDir("gc-props")
    ops.commit(Seq((1L, "a")).toDF("id", "k"), dir)
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES " +
      "('compact.auto.files' = '64', 'owner.team' = 'ingest')")
    assert(ops.tableProperties(dir) ==
      Map("compact.auto.files" -> "64", "owner.team" -> "ingest"))
    val shown = spark.sql(s"SHOW TBLPROPERTIES graft.`$dir`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("compact.auto.files").contains("64") &&
      shown.get("owner.team").contains("ingest"), s"SHOW served $shown")
    spark.sql(s"ALTER TABLE graft.`$dir` UNSET TBLPROPERTIES ('owner.team')")
    assert(ops.tableProperties(dir) == Map("compact.auto.files" -> "64"))
    // a property-only ALTER must not pin a declared schema on a
    // Scala-created table as a side effect
    assert(ops.declaredSchema(dir).isEmpty,
      "SET TBLPROPERTIES silently declared a schema")
  }

  test("native DML works on warehouse-managed bare names: UPDATE / " +
    "DELETE / MERGE resolve through the root like any path table") {
    val wh = tmpDir("gc-wh-dml")
    spark.conf.set("spark.sql.catalog.gwhdml", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwhdml.warehouse", wh)
    spark.sql("CREATE TABLE gwhdml.db.t AS " +
      "SELECT id, CAST(id * 2 AS DOUBLE) AS v FROM RANGE(0, 100)")
    spark.sql("UPDATE gwhdml.db.t SET v = 0.0 WHERE id < 10")
    spark.sql("DELETE FROM gwhdml.db.t WHERE id >= 90")
    // the UPDATE+DELETE land merge-on-read debt; a catalog read refuses
    // until CALL compact materializes (the documented contract)
    spark.sql(s"CALL gwhdml.compact('$wh/db/t', '${1L << 30}')")
    assert(spark.sql("SELECT sum(v) FROM gwhdml.db.t WHERE id < 10")
      .head().getDouble(0) == 0.0)
    assert(spark.sql("SELECT count(*) FROM gwhdml.db.t")
      .head().getLong(0) == 90L)
    spark.sql("SELECT id, CAST(-1.0 AS DOUBLE) AS v FROM RANGE(95, 105)")
      .createOrReplaceTempView("gc_wh_dml_src")
    spark.sql("MERGE INTO gwhdml.db.t t USING gc_wh_dml_src s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT count(*) FROM gwhdml.db.t")
      .head().getLong(0) == 100L)
    assert(spark.sql("SELECT sum(v) FROM gwhdml.db.t WHERE id >= 95")
      .head().getDouble(0) == -10.0)
  }

  test("external path-addressed tables: resolvable but never enumerated, " +
    "never purged") {
    register()
    val dir = tmpDir("gc-ext")
    ops.commit(Seq((1L, "a")).toDF("id", "k"), dir)
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 1)
    // no warehouse: nothing to enumerate
    assert(spark.sql("SHOW TABLES IN graft").count() == 0)
    val e = intercept[Exception](spark.sql(s"DROP TABLE graft.`$dir`"))
    assert(e.getMessage.contains("external"),
      s"external drop must refuse with the ownership message: ${e.getMessage}")
    // the refusal left the table intact
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() == 1)
  }
}
