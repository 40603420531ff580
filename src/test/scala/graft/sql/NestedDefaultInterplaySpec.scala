package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VersionedTable

/** Adversarial interplay probes for nested existence defaults
  * ([[NestedDefaults]]): every other evolution/maintenance feature the
  * default could collide with, pinned. The hazards each test hunts:
  * a rename detaching the default from its member, a drop-then-re-add
  * resurrecting it, a rewrite (MERGE / compaction) turning substituted
  * values back into nulls, and pruning dropping files whose SERVED
  * values match a predicate their STORED values don't. */
class NestedDefaultInterplaySpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def register(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def filesOf(dir: String): Set[String] =
    spark.sql(s"SELECT file FROM graft.`$dir#files`")
      .as[String].collect().toSet

  test("the default survives RENAME of the member AND of its parent " +
      "struct (metadata rides the field; physical paths never move)") {
    register()
    val dir = tmpDir("ndi-ren") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<temp: DOUBLE>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh BIGINT DEFAULT 50)")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN main.rh TO humidity")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN main TO obs")
    assert(spark.sql(s"SELECT obs.humidity FROM graft.`$dir`")
      .head().getLong(0) == 50L,
      "the default must follow the member through both renames")
    // post-rename writes land under the fixed physical name and still
    // gate explicit NULLs
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(2, named_struct('temp', 2.0, 'humidity', 60L))")
    assert(scala.util.Try(spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(3, named_struct('temp', 3.0, 'humidity', CAST(NULL AS BIGINT)))"))
      .isFailure, "the NULL gate must follow the rename too")
    assert(spark.sql(s"SELECT SUM(obs.humidity) FROM graft.`$dir`")
      .head().getLong(0) == 110L)
  }

  test("DROP of a defaulted member retires default and bytes together; " +
      "a re-added same-name member starts clean (no resurrection)") {
    register()
    val dir = tmpDir("ndi-drop") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<temp: DOUBLE>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh BIGINT DEFAULT 50)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(2, named_struct('temp', 2.0, 'rh', 60L))")
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN main.rh")
    // re-add WITHOUT a default: all history (including the vintage that
    // stored 60 under the RETIRED physical name) serves typed nulls
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (main.rh BIGINT)")
    val got = spark.sql(s"SELECT id, main.rh FROM graft.`$dir`")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> None, 2L -> None),
      s"re-added member must serve nulls, not the dropped default or " +
        s"the retired bytes — got $got")
  }

  test("keyed MERGE (CALL merge_into) on a defaulted table: upserts " +
      "store their values; unmatched pre-evolution rows carried through " +
      "the COW rewrite keep serving the default") {
    register()
    val dir = tmpDir("ndi-merge") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<temp: DOUBLE>)")
    spark.range(0, 20).select(col("id"),
        struct((col("id") * 1.0).as("temp")).as("main"))
      .createOrReplaceTempView("ndi_merge_base")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM ndi_merge_base")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh BIGINT DEFAULT 50)")
    // upsert half the rows with STORED rh through the keyed-merge door:
    // the COW rewrite carries unmatched pre-evolution rows of touched
    // files forward — the vintage-mix the schema pin exists for
    spark.range(0, 10).select(col("id"),
        struct(lit(-1.0).as("temp"), lit(77L).as("rh")).as("main"))
      .createOrReplaceTempView("ndi_merge_src")
    spark.sql(s"CALL graft.merge_into('$dir', 'ndi_merge_src', 'id')")
      .collect()
    val got = spark.sql(s"SELECT id, main.temp, main.rh FROM graft.`$dir`")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    assert(got.size == 20)
    assert((0L until 10L).forall(i => got(i) == ((-1.0, 77L))),
      s"upserted rows must serve their stored values: " +
        s"${got.toSeq.sortBy(_._1).take(3)}")
    assert((10L until 20L).forall(i => got(i) == ((i * 1.0, 50L))),
      "pre-evolution rows carried by the rewrite must keep the default")
  }

  test("compaction of a defaulted table: rewritten files keep serving " +
      "the default, filters on the member still find those rows") {
    register()
    val dir = tmpDir("ndi-compact") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<temp: DOUBLE>)")
    // several small pre-evolution commits so compaction has work
    for (i <- 0 until 3)
      spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
        s"($i, named_struct('temp', $i.5))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh BIGINT DEFAULT 50)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(3, named_struct('temp', 3.5, 'rh', 60L))")
    val before = filesOf(dir)
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')").collect()
    assert(filesOf(dir) != before, "compaction should have rewritten")
    val got = spark.sql(s"SELECT id, main.rh FROM graft.`$dir`")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 50L, 1L -> 50L, 2L -> 50L, 3L -> 60L),
      s"post-compaction reads must still substitute: $got")
    // the predicate the row-group-stats hazard would break: stored
    // values in the compacted file may be NULL, served values are 50
    assert(spark.sql(
      s"SELECT COUNT(*) FROM graft.`$dir` WHERE main.rh = 50")
      .head().getLong(0) == 3L,
      "filters must see SERVED values through the compacted file")
    // and ANALYZE over the compacted lineage describes served values
    spark.sql(s"CALL graft.write_stats('$dir', 'main.rh')").collect()
    val mm = spark.sql(
      s"SELECT MIN(main.rh) AS lo, MAX(main.rh) AS hi FROM graft.`$dir`")
      .head()
    assert(mm.getLong(0) == 50L && mm.getLong(1) == 60L)
  }

  test("filter withholding is path-precise: predicates on a NON-defaulted " +
      "member of a defaulted struct still push to parquet") {
    register()
    val dir = tmpDir("ndi-push") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<temp: DOUBLE>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0)), (2, named_struct('temp', 2.0))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh BIGINT DEFAULT 50)")
    def planOf(sql: String): String = {
      val df = spark.sql(sql)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // stored == served for main.temp: the row-group filter stays pushed
    val safe = planOf(
      s"SELECT id FROM graft.`$dir` WHERE main.temp = 2.0")
    assert(safe.contains("PushedFilters: [") &&
      safe.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("temp"),
      s"non-defaulted member predicate must push to parquet:\n$safe")
    // stored != served for main.rh: withheld from row-group pruning
    val held = planOf(
      s"SELECT id FROM graft.`$dir` WHERE main.rh = 50")
    assert(held.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
      .trim.isEmpty,
      s"defaulted member predicate must be withheld from parquet:\n$held")
    // ...and both return served-value-correct rows
    assert(spark.sql(s"SELECT id FROM graft.`$dir` WHERE main.rh = 50")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("ORDER BY a defaulted member LIMIT n returns served-value order " +
      "(defaults rank among stored values)") {
    register()
    val dir = tmpDir("ndi-topn") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<temp: DOUBLE>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0)), (2, named_struct('temp', 2.0))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh BIGINT DEFAULT 50)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(3, named_struct('temp', 3.0, 'rh', 40L)), " +
      "(4, named_struct('temp', 4.0, 'rh', 60L))")
    spark.sql(s"CALL graft.write_stats('$dir', 'main.rh')").collect()
    // ascending: stored 40 first, then the two substituted 50s, then 60
    assert(spark.sql(s"SELECT id FROM graft.`$dir` " +
      "ORDER BY main.rh, id LIMIT 3")
      .as[Long].collect().toSeq == Seq(3L, 1L, 2L),
      "TopN over the defaulted member must rank SERVED values")
    assert(spark.sql(s"SELECT id FROM graft.`$dir` " +
      "ORDER BY main.rh DESC, id LIMIT 1")
      .as[Long].collect().toSeq == Seq(4L))
  }

  test("SQL DELETE/UPDATE WHERE on a defaulted member see SERVED " +
      "values — DML and SELECT agree on the same rows") {
    register()
    val dir = tmpDir("ndi-dml") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<temp: DOUBLE>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0)), (2, named_struct('temp', 2.0))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh BIGINT DEFAULT 50)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(3, named_struct('temp', 3.0, 'rh', 60L))")
    // SELECT sees 1,2 at rh=50 (substituted); DELETE must remove the
    // SAME rows, not evaluate over stored values (where 1,2 are NULL)
    assert(spark.sql(
      s"SELECT id FROM graft.`$dir` WHERE main.rh = 50 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    spark.sql(s"DELETE FROM graft.`$dir` WHERE main.rh = 50")
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')").collect()
    assert(spark.sql(s"SELECT id FROM graft.`$dir`")
      .as[Long].collect().toSeq == Seq(3L),
      "DELETE must erase exactly the rows SELECT showed at rh=50")
    // UPDATE's predicate AND assignment expressions read served values
    val dir2 = tmpDir("ndi-dml2") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir2` " +
      "(id BIGINT, main STRUCT<temp: DOUBLE>)")
    spark.sql(s"INSERT INTO graft.`$dir2` VALUES " +
      "(1, named_struct('temp', 1.0))")
    spark.sql(s"ALTER TABLE graft.`$dir2` " +
      "ADD COLUMNS (main.rh BIGINT DEFAULT 50)")
    spark.sql(s"UPDATE graft.`$dir2` SET main = " +
      "named_struct('temp', main.temp, 'rh', main.rh + 1) " +
      "WHERE main.rh = 50")
    spark.sql(s"CALL graft.compact('$dir2', '${1L << 30}')").collect()
    assert(spark.sql(s"SELECT main.rh FROM graft.`$dir2`")
      .head().getLong(0) == 51L,
      "UPDATE reading main.rh must see the default (50), like SELECT")
  }

  test("two defaulted members at different depths; a query reading one " +
      "rebuilds only its pruned shape") {
    register()
    val dir = tmpDir("ndi-deep") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "a STRUCT<x: DOUBLE, inner: STRUCT<y: DOUBLE>>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('x', 1.0, 'inner', named_struct('y', 2.0))), " +
      "(2, named_struct('x', 1.0, 'inner', CAST(NULL AS " +
      "STRUCT<y: DOUBLE>)))")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(a.p INT DEFAULT 1, a.inner.q INT DEFAULT 2)")
    val got = spark.sql(
      s"SELECT id, a.p, a.inner.q FROM graft.`$dir` ORDER BY id")
      .collect()
    assert(got(0).getInt(1) == 1 && got(0).getInt(2) == 2)
    // NULL INNER parent: q stays null under it, p still serves
    assert(got(1).getInt(1) == 1 && got(1).isNullAt(2),
      "a NULL intermediate struct must not fabricate its members")
    // reading ONLY the deep member works through the pruned rebuild
    assert(spark.sql(s"SELECT a.inner.q FROM graft.`$dir` WHERE id = 1")
      .head().getInt(0) == 2)
  }

  test("an agg view over a DEFAULTED nested member must never serve a " +
      "stored-value fold to a catalog query that reads served values") {
    register()
    val tmp = tmpDir("ndi-mview")
    val dir = s"$tmp/t"
    val view = s"$tmp/v"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<kind: STRING>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('kind', 'a')), (2, named_struct('kind', 'a')), " +
      "(3, named_struct('kind', 'b')), (4, NULL)")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(main.score BIGINT DEFAULT 7)")
    spark.sql(s"CALL graft.create_agg_view('$dir', '$view', " +
      "'kind=main.kind', 's=sum(main.score);n=count(1)')").collect()
    // the VIEW's own contents fold SERVED values (the refresh
    // substitutes defaults before building partials) — a user reading
    // the rollup directly must agree with GROUP BY over the source
    val viewRows = graft.sinks.VersionedTable.read(spark, view)
      .collect().map(r => (Option(r.getString(0)).orNull,
        if (r.isNullAt(1)) -1L else r.getLong(1))).sortBy(x =>
        Option(x._1).getOrElse(""))
    assert(viewRows.toSeq == Seq((null, -1L), ("a", 14L), ("b", 7L)),
      s"the view must fold SERVED values: ${viewRows.toSeq}")
    // the catalog door's truth: defaults substitute — kind 'a' sums 14,
    // 'b' sums 7, the NULL-parent row groups under NULL kind with NULL
    // score
    val q = spark.sql("SELECT main.kind AS kind, SUM(main.score) AS s " +
      s"FROM graft.`$dir` GROUP BY main.kind ORDER BY kind NULLS FIRST")
    val got = q.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == Seq((null, -1L), ("a", 14L), ("b", 7L)),
      s"catalog aggregate over a defaulted member diverged (a view " +
        s"rewrite serving STORED-value folds?): ${got.toSeq}")
    // and the transparent rewrite FIRES on the defaulted source — the
    // rule order guarantees the mview rule sees the bare scan before the
    // substitution Project wraps it, and the served-value fold makes the
    // replacement value-identical
    assert(q.queryExecution.executedPlan.toString.contains(s"$view/data"),
      "the mview rewrite must fire on a defaulted source:\n" +
        q.queryExecution.executedPlan.toString.take(1200))
  }
}
