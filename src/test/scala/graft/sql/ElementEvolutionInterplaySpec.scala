package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VersionedTable

/** Adversarial interplay probes for the round-13 element-struct surface:
  * RENAME/DROP/DEFAULT/NOT NULL inside array element (and map value)
  * structs composed with the engine's REWRITE paths — compaction, COW
  * UPDATE, keyed MERGE — and with each other. The round-12 twin of this
  * spec (NestedDefaultInterplaySpec) caught a real silent-data-loss
  * path; these probes ask the same questions one level down, where the
  * rewrite carries REPEATED groups forward under the declared physical
  * schema pin. */
class ElementEvolutionInterplaySpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def register(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def filesOf(dir: String): Set[String] =
    spark.sql(s"SELECT file FROM graft.`$dir#files`")
      .as[String].collect().toSet

  test("compaction carries RENAMED + re-ADDed element members forward " +
      "losslessly: stored values survive, dropped bytes stay dead, the " +
      "rewrite sheds retired element bytes") {
    register()
    val dir = tmpDir("eei-compact") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "weather ARRAY<STRUCT<cond: STRING, n: INT>>)")
    // several small commits so compaction has work
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO graft.`$dir` SELECT ${i}L, " +
        s"array(named_struct('cond', 'c$i', 'n', $i))")
    }
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "RENAME COLUMN weather.element.cond TO sky")
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN weather.element.n")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (weather.element.n " +
      "INT)") // re-add: fresh physical name, old bytes must stay dead
    spark.sql(s"INSERT INTO graft.`$dir` SELECT 100L, " +
      "array(named_struct('sky', 'cx', 'n', 42))")
    val before = filesOf(dir)
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')").collect()
    assert(filesOf(dir) != before, "compaction should have rewritten")
    // the renamed member's values survived the rewrite; the dropped
    // member's bytes did NOT resurrect through it (the rewrite carries
    // the DECLARED physical shape — the re-added n is NULL for old rows)
    val got = spark.sql("SELECT id, weather[0].sky, weather[0].n " +
      s"FROM graft.`$dir` ORDER BY id").collect()
    assert(got.map(_.getString(1)).toSeq ==
      Seq("c0", "c1", "c2", "c3", "cx"),
      s"renamed element member lost through compaction: ${got.toSeq}")
    assert(got.take(4).forall(_.isNullAt(2)),
      "compaction resurrected dropped element bytes through the re-add")
    assert(got.last.getInt(2) == 42)
    // post-compaction inserts still land under the fixed physical names
    spark.sql(s"INSERT INTO graft.`$dir` SELECT 101L, " +
      "array(named_struct('sky', 'cy', 'n', 43))")
    assert(spark.sql(s"SELECT SUM(weather[0].n) FROM graft.`$dir`")
      .head().getLong(0) == 85L)
  }

  test("an element DEFAULT survives compaction: the rewrite materializes " +
      "stored NULLs (faithful carry, engine-exempt from the write gate) " +
      "and the read keeps serving the default per element") {
    register()
    val dir = tmpDir("eei-default-compact") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "weather ARRAY<STRUCT<cond: STRING>>)")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO graft.`$dir` SELECT ${i}L, " +
        s"array(named_struct('cond', 'c$i'), " +
        "CAST(NULL AS STRUCT<cond: STRING>))")
    }
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(weather.element.score INT DEFAULT 7)")
    val before = filesOf(dir)
    // the rewrite stores NULL in the defaulted member for carried rows —
    // the engine-exempt faithful carry; a USER batch doing the same
    // refuses (pinned in DefaultNotNullSpec)
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')").collect()
    assert(filesOf(dir) != before, "compaction should have rewritten")
    val got = spark.sql(s"SELECT id, weather FROM graft.`$dir` ORDER BY id")
      .collect()
    got.foreach { r =>
      val arr = r.getSeq[org.apache.spark.sql.Row](1)
      assert(arr.head.getInt(1) == 7,
        s"compacted pre-ADD element must keep serving the default: $arr")
      assert(arr(1) == null, s"NULL element must survive the rewrite: $arr")
    }
    // and a post-compaction user insert with stored values distinguishes
    spark.sql(s"INSERT INTO graft.`$dir` SELECT 100L, " +
      "array(named_struct('cond', 'cx', 'score', 9))")
    assert(spark.sql(s"SELECT SUM(weather[0].score) FROM graft.`$dir`")
      .head().getLong(0) == 7L * 3 + 9L)
  }

  test("COW UPDATE on a table with element NOT NULL carries untouched " +
      "rows forward through the engine exemption; the declaration still " +
      "gates user writes afterward") {
    register()
    val dir = tmpDir("eei-cow-nn") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE, " +
      "weather ARRAY<STRUCT<cond: STRING, n: INT>>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, 1.0, array(named_struct('cond', 'a', 'n', 1))), " +
      "(2, 2.0, array(CAST(NULL AS STRUCT<cond: STRING, n: INT>))), " +
      "(3, 3.0, NULL)")
    spark.sql(s"CALL graft.set_not_null('$dir', 'weather.element.cond')")
    // the UPDATE lands merge-on-read; compaction is the ENGINE rewrite
    // that carries all three rows forward — the rewritten batch must
    // pass the commit gate (row 2's NULL element and row 3's NULL array
    // are null parents, vacuously fine)
    spark.sql(s"UPDATE graft.`$dir` SET v = v + 10.0 WHERE id = 1")
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')").collect()
    val got = spark.sql(s"SELECT id, v FROM graft.`$dir` ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 11.0), (2L, 2.0), (3L, 3.0)))
    // the declaration still gates USER writes — through Spark's own
    // write-side AssertNotNull (the declared schema reports the member
    // non-nullable) or, for doors Spark doesn't guard (the Scala
    // commit, pinned in DefaultNotNullSpec), the engine's commit fold
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir` VALUES (4, 4.0, " +
        "array(named_struct('cond', CAST(NULL AS STRING), 'n', 9)))")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("weather.element.cond") ||
        m.contains("NOT_NULL_ASSERT_VIOLATION")),
      msgs(e).mkString(" | "))
  }

  test("keyed MERGE (CALL merge_into) composes with element rename + " +
      "default: upserts land stored values, carried rows keep serving " +
      "the default under the renamed member") {
    register()
    val dir = tmpDir("eei-merge") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "weather ARRAY<STRUCT<cond: STRING>>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, array(named_struct('cond', 'a'))), " +
      "(2, array(named_struct('cond', 'b')))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "RENAME COLUMN weather.element.cond TO sky")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(weather.element.q INT DEFAULT 5)")
    // upsert key 2 (stored q) + insert key 3 through the keyed merge
    spark.sql("SELECT * FROM VALUES " +
      "(2L, array(named_struct('sky', 'B', 'q', 8))), " +
      "(3L, array(named_struct('sky', 'c', 'q', 9))) AS t(id, weather)")
      .createOrReplaceTempView("eei_merge_src")
    spark.sql(s"MERGE INTO graft.`$dir` t USING eei_merge_src s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    val got = spark.sql("SELECT id, weather[0].sky, weather[0].q " +
      s"FROM graft.`$dir` ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, "a", 5), (2L, "B", 8), (3L, "c", 9)),
      s"merge over renamed+defaulted elements diverged: ${got.toSeq}")
  }

  test("FULL-clause MERGE (conditional WHEN MATCHED DELETE + NOT " +
      "MATCHED INSERT) composes with element rename: clause conditions " +
      "and insert values conform positionally to the physical shape") {
    register()
    val dir = tmpDir("eei-merge-full") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE, " +
      "weather ARRAY<STRUCT<cond: STRING>>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, 1.0, array(named_struct('cond', 'a'))), " +
      "(2, 2.0, array(named_struct('cond', 'b')))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "RENAME COLUMN weather.element.cond TO sky")
    spark.sql("SELECT * FROM VALUES " +
      "(1L, 9.0D, array(named_struct('sky', 'A'))), " +
      "(3L, 3.0D, array(named_struct('sky', 'c'))) " +
      "AS t(id, v, weather)").createOrReplaceTempView("eei_mf_src")
    // conditional clauses force the FULL merge path (not the upsert
    // shape): matched id=1 deletes, not-matched id=3 inserts with its
    // element struct conforming to the physical member name
    spark.sql(s"MERGE INTO graft.`$dir` t USING eei_mf_src s " +
      "ON t.id = s.id " +
      "WHEN MATCHED AND s.v > 5.0 THEN DELETE " +
      "WHEN NOT MATCHED AND s.v > 0.0 THEN INSERT *")
    val got = spark.sql("SELECT id, weather[0].sky " +
      s"FROM graft.`$dir` ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((2L, "b"), (3L, "c")),
      s"full merge over renamed elements diverged: ${got.toSeq}")
  }

  test("UPDATE with a condition on a RENAMED nested member resolves by " +
      "ordinal against the physical files (the byName re-anchor keeps " +
      "GetStructField ordinals)") {
    register()
    val dir = tmpDir("eei-upd-nested") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, 1.0, named_struct('temp', 5.0, 'kind', 'a')), " +
      "(2, 2.0, named_struct('temp', 50.0, 'kind', 'b'))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "RENAME COLUMN main.temp TO temperature")
    spark.sql(
      s"UPDATE graft.`$dir` SET v = v + 100.0 WHERE main.temperature > 10")
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')").collect()
    val got = spark.sql(s"SELECT id, v FROM graft.`$dir` ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 1.0), (2L, 102.0)),
      s"renamed-nested-member UPDATE condition missed: ${got.toSeq}")
  }

  test("a cdf feed over an element-evolution boundary serves both " +
      "vintages (stored values — the physical-log convention), and the " +
      "declared-table run plans with zero footer probes") {
    register()
    val dir = tmpDir("eei-cdf") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "weather ARRAY<STRUCT<cond: STRING>>)")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT 1L, " +
      "array(named_struct('cond', 'a'))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "RENAME COLUMN weather.element.cond TO sky")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(weather.element.q INT DEFAULT 5)")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT 2L, " +
      "array(named_struct('sky', 'b', 'q', 8))")
    graft.sources.TableStreamSource.vintageProbes.set(0)
    val feed = graft.sources.TableStreamSource.cdfSlice(
      spark, dir, "id", 0, 2, fresh = true)
    assert(graft.sources.TableStreamSource.vintageProbes.get() == 0L,
      "declared-table cdf run must fold its schema from the declaration")
    // the feed serves the DECLARED physical shape: the renamed member
    // under its (stable) physical name, the defaulted member as STORED
    // values — NULL for the pre-ADD transition (the physical-log
    // convention: change feeds never substitute)
    val rows = feed.orderBy("id").collect()
    assert(rows.length == 2)
    val w1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    val w2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
    assert(w1.head.getString(0) == "a" && w1.head.isNullAt(1),
      s"pre-evolution transition must serve stored values: $w1")
    assert(w2.head.getString(0) == "b" && w2.head.getInt(1) == 8,
      s"post-evolution transition must serve stored values: $w2")
  }

  test("nested-leaf TopN + whole-chain NOT NULL + a defaulted leaf: " +
      "admission bounds come from SERVED values, so the order is the " +
      "served order even for pre-ADD files") {
    register()
    val dir = tmpDir("eei-topn") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<ts: BIGINT>)")
    // two clustered landings (bounds land per commit), then evolve:
    // ADD a defaulted NOT NULL leaf and declare the chain
    ops.commitClustered(
      spark.range(0, 50).select(col("id"),
        struct((col("id") + 1000).as("ts")).as("main")),
      dir, Seq("id"), Seq("main.ts"), numFiles = 1)
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(main.score BIGINT NOT NULL DEFAULT 999)")
    spark.sql(s"CALL graft.set_not_null('$dir', 'main.ts')")
    spark.sql(s"CALL graft.set_not_null('$dir', 'main')")
    // post-ADD landing stores real scores BELOW the default
    spark.sql(s"INSERT INTO graft.`$dir` SELECT id, " +
      "named_struct('ts', id + 2000, 'score', id) AS main " +
      "FROM range(50, 100)")
    spark.sql(s"CALL graft.write_stats('$dir', 'main.score')").collect()
    // ORDER BY the defaulted member: the sidecar bounds were written
    // from SERVED values, so the pre-ADD file's bound is 999 and the
    // top-3 smallest scores come from the post-ADD file
    val got = spark.sql(s"SELECT main.score FROM graft.`$dir` " +
      "ORDER BY main.score LIMIT 3").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(50L, 51L, 52L),
      s"TopN over a defaulted member must order SERVED values: " +
        s"${got.toSeq}")
  }
}
