package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VersionedTable

/** Column-id indirection: ALTER TABLE RENAME COLUMN and safe type
  * widening are METADATA-ONLY — zero files rewrite, old snapshots stay
  * correct, and the drop-then-re-add resurrection hazard is structurally
  * impossible (a re-added column addresses a fresh physical name). */
class RenameWidenSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def register(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def filesOf(dir: String): Set[String] =
    spark.sql(s"SELECT file FROM graft.`$dir#files`")
      .as[String].collect().toSet

  test("RENAME COLUMN is metadata-only: old files serve the new name, " +
    "no file rewrites, inserts land under the fixed physical name") {
    register()
    val dir = tmpDir("rw-ren") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE)")
    spark.range(0, 10).select(col("id"), (col("id") * 2.0).as("v"))
      .createOrReplaceTempView("rw_ren_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_ren_src")
    val before = filesOf(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN v TO amount")
    // metadata-only: the file inventory is byte-identical
    assert(filesOf(dir) == before, "RENAME rewrote files")
    // old files serve the new logical name
    val got = spark.sql(s"SELECT id, amount FROM graft.`$dir`")
      .as[(Long, Double)].collect().toMap
    assert(got.size == 10 && (0L until 10L).forall(i => got(i) == i * 2.0))
    // the old name is gone
    assert(scala.util.Try(
      spark.sql(s"SELECT v FROM graft.`$dir`").collect()).isFailure)
    // a post-rename insert lands under the SAME physical name, so both
    // vintages serve through one schema
    spark.range(10, 15).select(col("id"), (col("id") * 2.0).as("amount"))
      .createOrReplaceTempView("rw_ren_src2")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_ren_src2")
    assert(spark.sql(s"SELECT SUM(amount) FROM graft.`$dir`")
      .head().getDouble(0) == (0 until 15).map(_ * 2.0).sum)
    // predicate pushdown + filtering still work through the mapping
    assert(spark.sql(
      s"SELECT id FROM graft.`$dir` WHERE amount = 8.0")
      .as[Long].collect().toSeq == Seq(4L))
  }

  test("ALTER COLUMN TYPE widens int -> long and float -> double; old " +
    "narrow files promote per file; out-of-int-range values land") {
    register()
    val dir = tmpDir("rw-wide") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (k INT, x FLOAT)")
    spark.range(0, 5).select(col("id").cast("int").as("k"),
        (col("id") * 1.5).cast("float").as("x"))
      .createOrReplaceTempView("rw_wide_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_wide_src")
    val before = filesOf(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN k TYPE BIGINT")
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN x TYPE DOUBLE")
    assert(filesOf(dir) == before, "widening rewrote files")
    val sc = spark.sql(s"SELECT * FROM graft.`$dir`").schema
    assert(sc("k").dataType.simpleString == "bigint")
    assert(sc("x").dataType.simpleString == "double")
    // beyond-int-range rows only a genuine long column can carry
    Seq((10000000000L, 2.25d)).toDF("k", "x")
      .createOrReplaceTempView("rw_wide_src2")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_wide_src2")
    val got = spark.sql(s"SELECT k, x FROM graft.`$dir`")
      .as[(Long, Double)].collect().toMap
    assert(got.size == 6)
    assert(got(10000000000L) == 2.25)
    assert(got(3L) == 4.5) // float 4.5 is exact; promotes cleanly
    // range-stats pruning still applies across vintages (num tag is
    // type-agnostic), and the filter is exact
    assert(spark.sql(s"SELECT k FROM graft.`$dir` WHERE k > 100")
      .as[Long].collect().toSeq == Seq(10000000000L))
  }

  test("rename composes with widen; DML (UPDATE/DELETE/MERGE) resolves " +
    "through the mapping") {
    register()
    val dir = tmpDir("rw-dml") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE)")
    spark.range(0, 10).select(col("id"), lit(1.0).as("v"))
      .createOrReplaceTempView("rw_dml_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_dml_src")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN v TO score")
    spark.sql(s"UPDATE graft.`$dir` SET score = score + 10.0 WHERE id < 3")
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE score > 10.5 AND id = 0")
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')")
    spark.range(8, 12).select(col("id"), lit(7.0).as("score"))
      .createOrReplaceTempView("rw_dml_merge")
    spark.sql(s"MERGE INTO graft.`$dir` t USING rw_dml_merge s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    val got = spark.sql(s"SELECT id, score FROM graft.`$dir`")
      .as[(Long, Double)].collect().toMap
    assert(!got.contains(0L), "DELETE through the mapping missed")
    assert(got(1L) == 11.0 && got(2L) == 11.0,
      "UPDATE through the mapping missed")
    assert((8L to 11L).forall(got(_) == 7.0),
      "MERGE through the mapping missed")
    assert(got.size == 11)
  }

  test("DROP then re-ADD the same name serves typed nulls, never the " +
    "dropped column's stale bytes") {
    register()
    val dir = tmpDir("rw-readd") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, note STRING)")
    spark.range(0, 4).select(col("id"), concat(lit("old-"), col("id")).as("note"))
      .createOrReplaceTempView("rw_readd_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_readd_src")
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN note")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (note STRING)")
    // the re-added column addresses a FRESH physical name: pre-existing
    // files must serve NULL, not the retired bytes still in the files
    assert(spark.sql(s"SELECT COUNT(note) FROM graft.`$dir`")
      .head().getLong(0) == 0L,
      "re-added column resurrected dropped values")
    Seq((100L, "new")).toDF("id", "note")
      .createOrReplaceTempView("rw_readd_src2")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_readd_src2")
    val notes = spark.sql(s"SELECT note FROM graft.`$dir` WHERE note IS NOT NULL")
      .as[String].collect().toSeq
    assert(notes == Seq("new"))
  }

  test("unsound ALTERs refuse loudly: narrowing, re-type, rename onto an " +
    "existing name, bad AFTER anchor, widening a bucket-anchored column") {
    register()
    val dir = tmpDir("rw-refuse") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, k INT, j INT, " +
      "s STRING) PARTITIONED BY (bucket(4, k))")
    def refuses(sql: String, frag: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(frag)),
        s"expected failure containing '$frag', got: ${msgs(e).mkString(" | ")}")
    }
    // narrowing / re-typing refuses in Spark's own analyzer (canUpCast
    // gate) before the catalog sees it — still loud, different voice
    refuses(s"ALTER TABLE graft.`$dir` ALTER COLUMN id TYPE INT",
      "NOT_SUPPORTED_CHANGE_COLUMN")
    refuses(s"ALTER TABLE graft.`$dir` ALTER COLUMN s TYPE BIGINT",
      "NOT_SUPPORTED_CHANGE_COLUMN")
    // int -> double upcasts for Spark but is NOT in the engine's parquet
    // promotion allowlist — the catalog's own refusal fires
    refuses(s"ALTER TABLE graft.`$dir` ALTER COLUMN j TYPE DOUBLE",
      "safe widenings")
    refuses(s"ALTER TABLE graft.`$dir` RENAME COLUMN s TO id",
      "already exists")
    // repositioning is supported — but an AFTER anchor must exist
    // (Spark's analyzer pre-resolves the position and refuses first)
    refuses(s"ALTER TABLE graft.`$dir` ADD COLUMNS (z INT AFTER nope)",
      "FIELD_NOT_FOUND")
    refuses(s"ALTER TABLE graft.`$dir` ALTER COLUMN k TYPE BIGINT",
      "bucket transform")
  }

  test("nested evolution is metadata-only: ADD + RENAME inside a struct, " +
    "pre-evolution files serve typed nulls and the new names") {
    register()
    val dir = tmpDir("rw-nested") + "/t"
    // the reference's raw-document shape: a struct column an API can grow
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, pressure: BIGINT>)")
    spark.range(0, 6).select(col("id"),
        struct((col("id") * 1.5).as("temp"), (col("id") + 1000).as("pressure"))
          .as("main"))
      .createOrReplaceTempView("rw_nested_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_nested_src")
    val before = filesOf(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (main.humidity BIGINT)")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN main.temp TO temperature")
    assert(filesOf(dir) == before, "nested evolution rewrote files")
    // pre-evolution files: new member reads as typed NULL, renamed member
    // serves its values under the new logical name
    val old = spark.sql(s"SELECT id, main.temperature, main.humidity " +
      s"FROM graft.`$dir`").collect()
    assert(old.length == 6)
    assert(old.forall(_.isNullAt(2)), "pre-evolution rows must serve NULL")
    assert(old.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      .forall { case (i, t) => t == i * 1.5 })
    // post-evolution insert lands under the FIXED physical names; both
    // vintages serve through one schema, filters resolve
    spark.range(6, 9).select(col("id"),
        struct((col("id") * 1.5).as("temperature"),
          (col("id") + 1000).as("pressure"),
          (col("id") * 10).as("humidity")).as("main"))
      .createOrReplaceTempView("rw_nested_src2")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_nested_src2")
    val agg = spark.sql(s"SELECT COUNT(*) AS n, SUM(main.humidity) AS h, " +
      s"SUM(main.temperature) AS t FROM graft.`$dir`").head()
    assert(agg.getLong(0) == 9)
    assert(agg.getLong(1) == (6 to 8).map(_ * 10L).sum)
    assert(agg.getDouble(2) == (0 to 8).map(_ * 1.5).sum)
    assert(spark.sql(s"SELECT id FROM graft.`$dir` " +
      "WHERE main.humidity = 70").as[Long].collect().toSeq == Seq(7L))
    // the old nested name is gone
    assert(scala.util.Try(spark.sql(
      s"SELECT main.temp FROM graft.`$dir`").collect()).isFailure)
  }

  test("nested DROP then re-ADD serves typed nulls, never the dropped " +
    "member's stale bytes; evolution composes with a parent rename") {
    register()
    val dir = tmpDir("rw-nested-readd") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, note: STRING>)")
    spark.range(0, 4).select(col("id"),
        struct((col("id") * 2.0).as("temp"),
          concat(lit("old-"), col("id")).as("note")).as("main"))
      .createOrReplaceTempView("rw_nreadd_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_nreadd_src")
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN main.note")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (main.note STRING)")
    // resurrection hazard: the re-added member must address a FRESH
    // physical name inside the struct, so old files serve NULL
    assert(spark.sql(s"SELECT COUNT(main.note) FROM graft.`$dir`")
      .head().getLong(0) == 0L,
      "re-added struct member resurrected dropped bytes")
    // rename the PARENT struct; nested physical paths anchor to the
    // parent's PHYSICAL name, so the mapping survives
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN main TO doc")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (doc.extra BIGINT)")
    Seq((100L, (9.0, "new", 7L))).toDF("id", "doc")
      .createOrReplaceTempView("rw_nreadd_src2")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_nreadd_src2")
    val got = spark.sql(s"SELECT doc.note, doc.extra FROM graft.`$dir` " +
      "WHERE doc.note IS NOT NULL").collect()
    assert(got.length == 1 && got.head.getString(0) == "new" &&
      got.head.getLong(1) == 7L)
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$dir` " +
      "WHERE doc.extra IS NULL").head().getLong(0) == 4L)
  }

  test("nested ALTER COLUMN TYPE widens a struct member metadata-only; " +
    "old narrow files promote per file") {
    register()
    val dir = tmpDir("rw-nwiden") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<k: INT, x: FLOAT>)")
    spark.range(0, 5).select(col("id"),
        struct(col("id").cast("int").as("k"),
          (col("id") * 1.5).cast("float").as("x")).as("main"))
      .createOrReplaceTempView("rw_nwiden_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_nwiden_src")
    val before = filesOf(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN main.k TYPE BIGINT")
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN main.x TYPE DOUBLE")
    assert(filesOf(dir) == before, "nested widening rewrote files")
    val mt = spark.sql(s"SELECT * FROM graft.`$dir`").schema("main")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(mt("k").dataType.simpleString == "bigint" &&
      mt("x").dataType.simpleString == "double")
    // beyond-int-range members only a genuine long member can carry
    Seq((100L, (10000000000L, 2.25d))).toDF("id", "main")
      .createOrReplaceTempView("rw_nwiden_src2")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_nwiden_src2")
    val got = spark.sql(s"SELECT main.k, main.x FROM graft.`$dir`")
      .as[(Long, Double)].collect().toMap
    assert(got.size == 6 && got(10000000000L) == 2.25 && got(3L) == 4.5)
    assert(spark.sql(s"SELECT id FROM graft.`$dir` WHERE main.k > 100")
      .as[Long].collect().toSeq == Seq(100L))
  }

  test("nested evolution refusals: DEFAULT/NOT NULL on a nested add, " +
    "rename collision, array elements, nested widen, last member") {
    register()
    val dir = tmpDir("rw-nested-refuse") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, pressure: BIGINT>, " +
      "tags ARRAY<STRUCT<k: STRING>>, lone STRUCT<only: BIGINT>, " +
      "kprops MAP<STRUCT<k: STRING>, INT>)")
    def refuses(sql: String, frag: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(frag)),
        s"expected failure containing '$frag', got: ${msgs(e).mkString(" | ")}")
    }
    // nested ADD ... DEFAULT is SUPPORTED since round 12 (engine-side
    // existence defaults — DefaultNotNullSpec covers it); NOT NULL and
    // element-struct defaults keep refusing
    refuses(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(main.rh BIGINT NOT NULL)", "NOT NULL")
    refuses(s"ALTER TABLE graft.`$dir` RENAME COLUMN main.temp TO pressure",
      "already exists")
    refuses(s"ALTER TABLE graft.`$dir` ADD COLUMNS (main.temp STRING)",
      "already exists")
    // element members evolve fully, but dropping the LAST element member
    // refuses like any struct's, and map KEY structs never evolve —
    // keys are identity-bearing
    refuses(s"ALTER TABLE graft.`$dir` DROP COLUMN tags.element.k",
      "last member")
    refuses(s"ALTER TABLE graft.`$dir` RENAME COLUMN kprops.key.k TO j",
      "no evolvable struct")
    refuses(s"ALTER TABLE graft.`$dir` DROP COLUMN kprops.key.k",
      "no evolvable struct")
    // nested widening exists, but only within the engine's parquet
    // promotion allowlist — bigint→double is not in it
    refuses(s"ALTER TABLE graft.`$dir` ALTER COLUMN main.pressure TYPE " +
      "DOUBLE", "safe widenings")
    refuses(s"ALTER TABLE graft.`$dir` DROP COLUMN lone.only",
      "last member")
  }

  test("a filter on a RENAMED nested field still pushes to parquet under " +
    "its physical path, and nested pruning drops unused members") {
    register()
    val dir = tmpDir("rw-npush") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    spark.range(0, 10).select(col("id"),
        struct((col("id") * 1.5).as("temp"), lit("a").as("kind")).as("main"))
      .createOrReplaceTempView("rw_npush_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_npush_src")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN main.temp TO temperature")
    val df = spark.sql(
      s"SELECT id FROM graft.`$dir` WHERE main.temperature = 3.0")
    assert(df.as[Long].collect().toSeq == Seq(2L))
    val plan = df.queryExecution.executedPlan.toString
    // row-group skipping needs the filter under the PHYSICAL member name
    // (what the files carry) — without the dataType translation it names
    // a column no file has and silently stops pruning
    assert(plan.contains("EqualTo(main.temp,3.0)"),
      s"renamed-nested filter not pushed under its physical path:\n$plan")
    // nested schema pruning survives the mapping: the untouched member
    // must not be read
    assert(plan.contains("main:struct<temp:double>") &&
      !plan.contains("kind:string"),
      s"nested pruning lost through the mapping:\n$plan")
    // and the residual Filter upstream uses the plan's own (logical) attrs
    assert(plan.contains("main#") && plan.contains(".temperature"),
      s"residual filter must stay in logical terms:\n$plan")
  }

  test("RENAME/DROP of a column a CHECK constraint references refuses " +
    "up front — the anchor discipline, not a bricked table") {
    register()
    val dir = tmpDir("rw-canchor") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    spark.range(0, 3).select(col("id"), (col("id") + 1.0).as("v"),
        struct(lit(1.0).as("temp"), lit("a").as("kind")).as("main"))
      .createOrReplaceTempView("rw_canchor_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_canchor_src")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD CONSTRAINT c_v CHECK (v > 0)")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD CONSTRAINT c_t CHECK (main.temp > 0)")
    def refuses(sql: String, frag: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(frag)),
        s"expected failure containing '$frag', got: ${msgs(e).mkString(" | ")}")
    }
    // without the refusal, each of these leaves a constraint no future
    // commit can resolve — every INSERT fails until dropConstraint
    refuses(s"ALTER TABLE graft.`$dir` RENAME COLUMN v TO amount", "c_v")
    refuses(s"ALTER TABLE graft.`$dir` DROP COLUMN v", "c_v")
    refuses(s"ALTER TABLE graft.`$dir` RENAME COLUMN main.temp TO r", "c_t")
    refuses(s"ALTER TABLE graft.`$dir` DROP COLUMN main.temp", "c_t")
    // renaming the PREFIX (the struct itself) breaks 'main.temp' too
    refuses(s"ALTER TABLE graft.`$dir` RENAME COLUMN main TO doc", "c_t")
    // an unreferenced column stays freely evolvable
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN main.kind TO k")
    // and after dropping the constraints, evolution proceeds + commits land
    spark.sql(s"ALTER TABLE graft.`$dir` DROP CONSTRAINT c_v")
    spark.sql(s"ALTER TABLE graft.`$dir` DROP CONSTRAINT c_t")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN v TO amount")
    spark.range(3, 5).select(col("id"), (col("id") + 1.0).as("amount"),
        struct(lit(2.0).as("temp"), lit("b").as("k")).as("main"))
      .createOrReplaceTempView("rw_canchor_src2")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_canchor_src2")
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$dir`")
      .head().getLong(0) == 5L)
  }

  test("CREATE TABLE refuses ref fragments (branch/tag/metadata views)") {
    register()
    val dir = tmpDir("rw-frag") + "/t"
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$dir#branch=b` (id BIGINT)")
    }
    assert(e.getMessage.contains("base table"))
  }

  test("array/map element-struct members ADD and widen metadata-only: " +
    "pre-evolution files serve typed nulls / promoted values") {
    register()
    val dir = tmpDir("rw-elem") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "weather ARRAY<STRUCT<k: STRING, n: INT>>, " +
      "props MAP<STRING, STRUCT<v: INT>>)")
    spark.range(0, 4).select(col("id"),
        array(struct(concat(lit("c"), col("id")).as("k"),
          col("id").cast("int").as("n"))).as("weather"),
        map(lit("a"), struct(col("id").cast("int").as("v"))).as("props"))
      .createOrReplaceTempView("rw_elem_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_elem_src")
    val before = filesOf(dir)
    // ADD a member to the array's element struct and the map's value
    // struct; widen existing members of BOTH — all metadata-only
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(weather.element.score DOUBLE, props.value.w BIGINT)")
    spark.sql(
      s"ALTER TABLE graft.`$dir` ALTER COLUMN weather.element.n TYPE BIGINT")
    spark.sql(
      s"ALTER TABLE graft.`$dir` ALTER COLUMN props.value.v TYPE BIGINT")
    assert(filesOf(dir) == before, "element evolution rewrote files")
    // pre-evolution files: missing members serve typed nulls, the
    // widened member promotes per file
    val old = spark.sql("SELECT id, weather[0].score, weather[0].n, " +
      s"element_at(props, 'a').w, element_at(props, 'a').v " +
      s"FROM graft.`$dir` ORDER BY id")
      .collect()
    assert(old.length == 4 && old.forall(r => r.isNullAt(1) && r.isNullAt(3)))
    assert(old.map(_.getLong(2)).toSeq == Seq(0L, 1L, 2L, 3L))
    // map VALUE member widened: old int values promote per file
    assert(old.map(_.getLong(4)).toSeq == Seq(0L, 1L, 2L, 3L))
    // post-evolution insert carries the full element shape, including a
    // beyond-int value only a genuine long member can hold
    spark.sql(s"INSERT INTO graft.`$dir` SELECT 100L, " +
      "array(named_struct('k', 'cx', 'n', 10000000000L, 'score', 0.5)), " +
      "map('a', named_struct('v', 7, 'w', 8L))")
    val got = spark.sql("SELECT weather[0].n, weather[0].score, " +
      s"element_at(props, 'a').w FROM graft.`$dir` WHERE id = 100")
      .head()
    assert(got.getLong(0) == 10000000000L && got.getDouble(1) == 0.5 &&
      got.getLong(2) == 8L)
    // both vintages aggregate through one schema
    assert(spark.sql(s"SELECT SUM(weather[0].n) FROM graft.`$dir`")
      .head().getLong(0) == 6L + 10000000000L)
  }

  test("element-struct RENAME/DROP are metadata-only: old files serve " +
    "the new names, drop-then-re-add serves typed nulls, never the " +
    "dropped element bytes") {
    register()
    val dir = tmpDir("rw-elem-ren") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "weather ARRAY<STRUCT<cond: STRING, n: INT>>, " +
      "props MAP<STRING, STRUCT<v: INT, w: INT>>)")
    spark.range(0, 4).select(col("id"),
        array(struct(concat(lit("c"), col("id")).as("cond"),
          col("id").cast("int").as("n"))).as("weather"),
        map(lit("a"), struct(col("id").cast("int").as("v"),
          (col("id") * 10).cast("int").as("w"))).as("props"))
      .createOrReplaceTempView("rw_elemren_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_elemren_src")
    val before = filesOf(dir)
    spark.sql(
      s"ALTER TABLE graft.`$dir` RENAME COLUMN weather.element.cond TO sky")
    spark.sql(
      s"ALTER TABLE graft.`$dir` RENAME COLUMN props.value.v TO score")
    assert(filesOf(dir) == before, "element RENAME rewrote files")
    // pre-rename files serve their values under the NEW logical names
    val old = spark.sql("SELECT id, weather[0].sky, " +
      s"element_at(props, 'a').score FROM graft.`$dir` ORDER BY id")
      .collect()
    assert(old.length == 4)
    assert(old.map(_.getString(1)).toSeq == Seq("c0", "c1", "c2", "c3"))
    assert(old.map(_.getInt(2)).toSeq == Seq(0, 1, 2, 3))
    // the old element-member names are gone
    assert(scala.util.Try(spark.sql(
      s"SELECT weather[0].cond FROM graft.`$dir`").collect()).isFailure)
    // DROP an element member, then re-ADD the same name: the re-added
    // member addresses a FRESH physical name inside the element struct,
    // so pre-drop files must serve NULL, not the retired bytes they
    // still carry
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN props.value.w")
    assert(filesOf(dir) == before, "element DROP rewrote files")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS (props.value.w INT)")
    assert(spark.sql(
      s"SELECT COUNT(element_at(props, 'a').w) FROM graft.`$dir`")
      .head().getLong(0) == 0L,
      "re-added element member resurrected dropped bytes")
    // a post-evolution insert lands under the FIXED physical names: both
    // vintages serve through one schema, renamed + re-added members
    // resolve across files
    spark.sql(s"INSERT INTO graft.`$dir` SELECT 100L, " +
      "array(named_struct('sky', 'cx', 'n', 9)), " +
      "map('a', named_struct('score', 7, 'w', 8))")
    val agg = spark.sql("SELECT COUNT(*), SUM(weather[0].n), " +
      "SUM(element_at(props, 'a').score), " +
      s"SUM(element_at(props, 'a').w) FROM graft.`$dir`").head()
    assert(agg.getLong(0) == 5L)
    assert(agg.getLong(1) == (0 + 1 + 2 + 3 + 9).toLong)
    assert(agg.getLong(2) == (0 + 1 + 2 + 3 + 7).toLong)
    assert(agg.getLong(3) == 8L, "old files must serve NULL for the " +
      "re-added member; the new file serves its stored 8")
    // nested pruning through the element mapping: a query touching only
    // the renamed member reads exactly its PHYSICAL member from parquet
    val df = spark.sql(s"SELECT weather[0].sky AS s FROM graft.`$dir`")
    assert(df.as[String].collect().toSet == Set("c0", "c1", "c2", "c3", "cx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cond") && !plan.contains("sky:"),
      s"element pruning must request the physical member name:\n$plan")
  }

  test("ADD COLUMN FIRST/AFTER and ALTER COLUMN FIRST/AFTER are " +
    "metadata-only: declared order changes, files resolve by name, " +
    "positional INSERT targets the new order — nested and element " +
    "members reorder within their struct") {
    register()
    val dir = tmpDir("rw-pos") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE, " +
      "main STRUCT<a: BIGINT, b: STRING>, " +
      "tags ARRAY<STRUCT<k: STRING, n: INT>>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 1.5, " +
      "named_struct('a', 10L, 'b', 'x'), " +
      "array(named_struct('k', 'p', 'n', 7)))")
    val before = filesOf(dir)
    // ADD ... FIRST + AFTER, top-level and nested incl. element structs
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(flag INT FIRST, main.c INT AFTER a, tags.element.w INT FIRST)")
    // ALTER ... FIRST/AFTER, top-level and nested
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN v AFTER main")
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN main.b FIRST")
    assert(filesOf(dir) == before, "repositioning rewrote files")
    val sc = spark.table(s"graft.`$dir`").schema
    assert(sc.fieldNames.toSeq == Seq("flag", "id", "main", "v", "tags"),
      s"declared order: ${sc.fieldNames.toSeq}")
    assert(sc("main").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("b", "a", "c"))
    assert(sc("tags").dataType.asInstanceOf[
        org.apache.spark.sql.types.ArrayType].elementType.asInstanceOf[
        org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("w", "k", "n"))
    // old files serve by NAME through the new declared order
    val old = spark.sql("SELECT id, v, main.a, main.b, tags[0].k, " +
      s"tags[0].n, flag, main.c, tags[0].w FROM graft.`$dir`").head()
    assert(old.getLong(0) == 1L && old.getDouble(1) == 1.5 &&
      old.getLong(2) == 10L && old.getString(3) == "x" &&
      old.getString(4) == "p" && old.getInt(5) == 7)
    assert(old.isNullAt(6) && old.isNullAt(7) && old.isNullAt(8),
      "pre-ADD files must serve typed nulls for the new members")
    // a positional INSERT targets the NEW declared order
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (9, 2L, " +
      "named_struct('b', 'y', 'a', 20L, 'c', 3), 2.5, " +
      "array(named_struct('w', 4, 'k', 'q', 'n', 8)))")
    val got = spark.sql("SELECT id, flag, v, main.a, main.b, main.c, " +
      s"tags[0].w FROM graft.`$dir` WHERE id = 2").head()
    assert(got.getInt(1) == 9 && got.getDouble(2) == 2.5 &&
      got.getLong(3) == 20L && got.getString(4) == "y" &&
      got.getInt(5) == 3 && got.getInt(6) == 4,
      s"post-reposition insert mislanded: $got")
    // filters + aggregates resolve across both vintages
    assert(spark.sql(s"SELECT SUM(main.a) FROM graft.`$dir`")
      .head().getLong(0) == 30L)
    assert(spark.sql(
      s"SELECT id FROM graft.`$dir` WHERE main.b = 'y'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("ALTER COLUMN ... COMMENT lands on the declared schema at any " +
    "depth, metadata-only") {
    register()
    val dir = tmpDir("rw-comment") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<a: BIGINT>, tags ARRAY<STRUCT<k: STRING>>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, " +
      "named_struct('a', 1L), array(named_struct('k', 'x')))")
    val before = filesOf(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN id " +
      "COMMENT 'the key'")
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN main.a " +
      "COMMENT 'a nested note'")
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN tags.element.k " +
      "COMMENT 'an element note'")
    assert(filesOf(dir) == before, "COMMENT rewrote files")
    val sc = spark.table(s"graft.`$dir`").schema
    assert(sc("id").getComment().contains("the key"))
    assert(sc("main").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]("a").getComment()
      .contains("a nested note"))
    assert(sc("tags").dataType.asInstanceOf[
        org.apache.spark.sql.types.ArrayType].elementType.asInstanceOf[
        org.apache.spark.sql.types.StructType]("k").getComment()
      .contains("an element note"))
    // values untouched
    assert(spark.sql(s"SELECT main.a FROM graft.`$dir`")
      .head().getLong(0) == 1L)
  }

  test("manifest stats pruning follows the physical name after a rename") {
    register()
    val dir = tmpDir("rw-prune") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, grp BIGINT) " +
      "PARTITIONED BY (identity(grp)) TBLPROPERTIES ('files' = '4')")
    spark.range(0, 400)
      .select(col("id"), (col("id") % 4).as("grp"))
      .createOrReplaceTempView("rw_prune_src")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT * FROM rw_prune_src")
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN grp TO bucket_no")
    val n = spark.sql(
      s"SELECT COUNT(*) FROM graft.`$dir` WHERE bucket_no = 2")
      .head().getLong(0)
    assert(n == 100)
    val (total, kept) = GraftCatalog.lastScanPrune
    assert(kept < total,
      s"renamed-column probe kept $kept of $total files — manifest " +
        "pruning lost the physical mapping")
  }
}
