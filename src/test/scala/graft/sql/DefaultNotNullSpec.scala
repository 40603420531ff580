package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VersionedTable

/** ADD COLUMN DEFAULT (metadata-only initial values through Spark's own
  * EXISTS_DEFAULT/CURRENT_DEFAULT machinery), declared NOT NULL with
  * commit-time enforcement in the constraint fold, SET/DROP NOT NULL,
  * and the SQL constraint DDL front door (ADD/DROP CONSTRAINT CHECK). */
class DefaultNotNullSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def register(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  test("ADD COLUMN DEFAULT: history serves the default metadata-only; " +
      "new writes distinguish stored values, defaults, explicit NULLs") {
    register()
    val dir = tmpDir("dn-default")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, k STRING)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 'a'), (2, 'b')")
    val vBefore = ops.versions(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN score INT DEFAULT 7")
    // metadata-only: no commit happened, no file moved
    assert(ops.versions(dir) == vBefore,
      "ADD COLUMN DEFAULT must not rewrite or commit anything")
    def rows() = spark.sql(s"SELECT id, score FROM graft.`$dir`")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .sortBy(_._1).toSeq
    assert(rows() == Seq(1L -> Some(7), 2L -> Some(7)),
      s"pre-ADD rows must serve the declared default, got ${rows()}")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (3, 'c', 42)")
    spark.sql(s"INSERT INTO graft.`$dir` (id, k) VALUES (4, 'd')")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (5, 'e', NULL)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (6, 'f', DEFAULT)")
    assert(rows() == Seq(1L -> Some(7), 2L -> Some(7), 3L -> Some(42),
      4L -> Some(7), 5L -> None, 6L -> Some(7)),
      s"got ${rows()}: stored values and explicit NULLs must win in " +
        "files that carry the column; only missing columns serve the " +
        "default")
  }

  test("NESTED ADD COLUMN DEFAULT: the engine substitutes where Spark's " +
      "EXISTS_DEFAULT cannot — history serves it, parents stay null, " +
      "appends storing NULL refuse, pre-ADD snapshots are immutable") {
    register()
    val dir = tmpDir("dn-nested")
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<temp: DOUBLE, kind: STRING>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.5, 'kind', 'a')), " +
      "(2, named_struct('temp', 2.5, 'kind', 'b')), " +
      "(3, NULL)") // null PARENT: the member must stay null under it
    val vBefore = ops.versions(dir)
    val filesBefore = spark.sql(s"SELECT file FROM graft.`$dir#files`")
      .collect().map(_.getString(0)).toSet
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh BIGINT DEFAULT 50)")
    assert(ops.versions(dir) == vBefore &&
      spark.sql(s"SELECT file FROM graft.`$dir#files`")
        .collect().map(_.getString(0)).toSet == filesBefore,
      "nested ADD DEFAULT must be metadata-only")
    def rows() = spark.sql(s"SELECT id, main.rh FROM graft.`$dir`")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1).toSeq
    assert(rows() == Seq(1L -> Some(50L), 2L -> Some(50L), 3L -> None),
      s"history must serve the default under non-null parents, got " +
        s"${rows()}")
    // post-ADD writes store real values...
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(4, named_struct('temp', 4.5, 'kind', 'd', 'rh', 77L)), " +
      "(5, NULL)")
    assert(rows() == Seq(1L -> Some(50L), 2L -> Some(50L), 3L -> None,
      4L -> Some(77L), 5L -> None))
    // ...and an append storing NULL in the defaulted member under a
    // non-null parent REFUSES: per-file it would be indistinguishable
    // from an absent member and silently read back as 50
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
        "(6, named_struct('temp', 6.5, 'kind', 'f', 'rh', " +
        "CAST(NULL AS BIGINT)))")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("nested DEFAULT")),
      s"expected the nested-DEFAULT gate, got: ${msgs(e).mkString(" | ")}")
    assert(rows().size == 5, "the refused batch must land nothing")
    // filters see SUBSTITUTED values: pre-ADD rows match rh = 50
    assert(spark.sql(
      s"SELECT id FROM graft.`$dir` WHERE main.rh = 50 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    // history immutability: the pre-ADD snapshot's FILES are untouched
    // (pinned above) and its rows serve unchanged originals; the member
    // itself serves the default there too — schema (and its declared
    // defaults) travels with the HEAD, data with the version, exactly
    // the engine's top-level EXISTS_DEFAULT time-travel convention
    val v0 = vBefore.last
    val old = spark.sql(s"SELECT id, main.temp, main.rh " +
      s"FROM graft.`$dir` VERSION AS OF $v0 WHERE id = 1").head()
    assert(old.getDouble(1) == 1.5 && old.getLong(2) == 50L,
      s"pre-ADD snapshot must serve original values + the default, got $old")
    // ANALYZE writes SERVED-value lines: sidecar MIN/MAX includes the
    // default of pre-ADD rows, not just stored values
    spark.sql(s"CALL graft.write_stats('$dir', 'main.rh')").collect()
    val mm = spark.sql(
      s"SELECT MIN(main.rh) AS lo, MAX(main.rh) AS hi FROM graft.`$dir`")
      .head()
    assert(mm.getLong(0) == 50L && mm.getLong(1) == 77L,
      s"sidecar-served extremes must describe served values, got $mm")
    // widening the defaulted member re-casts the default at read
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(main.grade INT DEFAULT 3)")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ALTER COLUMN main.grade TYPE BIGINT")
    assert(spark.sql(s"SELECT main.grade FROM graft.`$dir` WHERE id = 1")
      .head().getLong(0) == 3L)
  }

  test("nested DEFAULT refusals: struct-typed defaults, DEFAULT NULL") {
    register()
    val dir = tmpDir("dn-nested-refuse")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE>, tags ARRAY<STRUCT<k: STRING>>)")
    def refuses(sql: String, frag: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(frag)),
        s"expected failure containing '$frag', got: " +
          msgs(e).mkString(" | "))
    }
    refuses(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(main.rh BIGINT DEFAULT NULL)", "absent-default")
    refuses(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(tags.element.w STRUCT<a: INT> DEFAULT named_struct('a', 1))",
      "atomic-typed")
    // the existence half is immutable once declared
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(main.sc INT DEFAULT 1)")
    refuses(s"ALTER TABLE graft.`$dir` ALTER COLUMN main.sc SET DEFAULT 2",
      "existence defaults are immutable")
    refuses(s"ALTER TABLE graft.`$dir` ALTER COLUMN main.sc DROP DEFAULT",
      "existence defaults are immutable")
  }

  test("ADD COLUMN NOT NULL needs a non-null DEFAULT") {
    register()
    val dir = tmpDir("dn-add-nn")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1)")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN c INT NOT NULL")
    }
    assert(e.getMessage.contains("non-null DEFAULT"), e.getMessage)
    spark.sql(
      s"ALTER TABLE graft.`$dir` ADD COLUMN c INT NOT NULL DEFAULT 3")
    assert(spark.sql(s"SELECT c FROM graft.`$dir`")
      .collect().map(_.getInt(0)).toSeq == Seq(3))
    assert(!spark.table(s"graft.`$dir`").schema("c").nullable,
      "the added column must declare NOT NULL")
  }

  test("declared NOT NULL is commit-enforced in the constraint fold, " +
      "not advisory") {
    register()
    val dir = tmpDir("dn-enforce")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT NOT NULL, k STRING)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 'a')")
    // the engine-side backstop: a Scala commit (which bypasses Spark's
    // write-side AssertNotNull) lands nulls → the commit itself refuses
    val e = intercept[Exception] {
      ops.commit(Seq(Some(2L), None).toDF("id")
        .withColumn("k", lit("x")), dir)
    }
    assert(e.getMessage.contains("NOT NULL id"), e.getMessage)
    assert(spark.table(s"graft.`$dir`").count() == 1,
      "the violating commit must publish nothing")
    // a batch that doesn't carry the column at all refuses loudly too
    val e2 = intercept[Exception] {
      ops.commit(Seq("y").toDF("k"), dir)
    }
    assert(e2.getMessage.contains("carries no column"), e2.getMessage)
  }

  test("SET NOT NULL is born-true or refused; DROP NOT NULL is " +
      "metadata-only") {
    register()
    val dir = tmpDir("dn-setnn")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, s STRING)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 'a'), (2, NULL)")
    // Spark's analyzer hard-blocks nullable→non-nullable ALTER COLUMN
    // (CheckAnalysis, no catalog capability opts out), so the SQL front
    // door is CALL set_not_null — same born-true-or-refused discipline
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.set_not_null('$dir', 's')")
    }
    assert(e.getMessage.contains("SET NOT NULL"), e.getMessage)
    spark.sql(s"CALL graft.set_not_null('$dir', 'id')")
    assert(!spark.table(s"graft.`$dir`").schema("id").nullable)
    // and the declaration is enforced from then on
    val e2 = intercept[Exception] {
      ops.commit(Seq(Option.empty[Long]).toDF("id")
        .withColumn("s", lit("z")), dir)
    }
    assert(e2.getMessage.contains("NOT NULL id"), e2.getMessage)
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN id DROP NOT NULL")
    assert(spark.table(s"graft.`$dir`").schema("id").nullable)
    ops.commit(Seq(Option.empty[Long]).toDF("id")
      .withColumn("s", lit("z")), dir) // legal again
    assert(spark.table(s"graft.`$dir`").count() == 3)
  }

  test("a TYPED null default (CAST(NULL AS INT)) never covers a declared " +
      "NOT NULL — the cover check evaluates, it does not string-match") {
    register()
    val dir = tmpDir("dn-typednull")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT)")
    // DEFAULT NULL on a nullable add is legal; catalyst renders the
    // stored EXISTS_DEFAULT as `CAST(NULL AS INT)` — not the bare string
    // "NULL" a naive check would compare against
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN score INT DEFAULT NULL")
    spark.sql(s"CALL graft.set_not_null('$dir', 'score')") // empty: legal
    // a batch NOT carrying the column would serve the default — NULL —
    // for every row of a NOT NULL column; the commit must refuse
    val e = intercept[Exception] {
      ops.commit(Seq(1L).toDF("id"), dir)
    }
    assert(e.getMessage.contains("non-null default"), e.getMessage)
    // and a batch carrying real values still lands
    ops.commit(Seq((2L, 5)).toDF("id", "score"), dir)
    assert(spark.table(s"graft.`$dir`").count() == 1)
  }

  test("ALTER COLUMN SET/DROP DEFAULT changes FUTURE inserts only — " +
      "the history contract (EXISTS_DEFAULT) is immutable") {
    register()
    val dir = tmpDir("dn-setdflt")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1)")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMN score INT DEFAULT 7")
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN score SET DEFAULT 9")
    def scoreOf(id: Long): Option[Int] = {
      val r = spark.sql(s"SELECT score FROM graft.`$dir` WHERE id = $id")
        .head()
      if (r.isNullAt(0)) None else Some(r.getInt(0))
    }
    // pre-ADD history still serves the ORIGINAL initial value: SET
    // DEFAULT must never metadata-rewrite the past
    assert(scoreOf(1) == Some(7),
      "SET DEFAULT must not change what already-landed rows read")
    spark.sql(s"INSERT INTO graft.`$dir` (id) VALUES (2)")
    assert(scoreOf(2) == Some(9), "future omitted inserts take the new default")
    // born-valid or refused: non-foldable and type-garbage decline
    assert(scala.util.Try(spark.sql(
      s"ALTER TABLE graft.`$dir` ALTER COLUMN score SET DEFAULT id"))
      .isFailure, "a non-constant default must refuse")
    // DROP DEFAULT: future omitted inserts become NULL; history intact
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN score DROP DEFAULT")
    spark.sql(s"INSERT INTO graft.`$dir` (id) VALUES (3)")
    assert(scoreOf(3).isEmpty, "after DROP DEFAULT an omitted column is NULL")
    assert(scoreOf(1) == Some(7) && scoreOf(2) == Some(9),
      "DROP DEFAULT must not change what already-landed rows read")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT CHECK is the SQL front door of " +
      "commit-enforced constraints") {
    register()
    val dir = tmpDir("dn-constraint")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 10.0), (2, 20.0)")
    // born-broken declaration refuses (scans the live table once)
    val e0 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` " +
        "ADD CONSTRAINT v_big CHECK (v > 15.0)")
    }
    assert(e0.getMessage.contains("existing row"), e0.getMessage)
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD CONSTRAINT v_pos CHECK (v > 0.0)")
    assert(ops.constraints(dir) == Map("v_pos" -> "v > 0.0"),
      s"got ${ops.constraints(dir)}")
    // every commit validates — SQL inserts and Scala commits alike
    val e1 = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir` VALUES (3, -1.0)")
    }
    assert(e1.getMessage.contains("v_pos") ||
      e1.getCause != null && e1.getCause.getMessage.contains("v_pos"),
      e1.getMessage)
    assert(spark.table(s"graft.`$dir`").count() == 2)
    // DROP CONSTRAINT re-opens the gate; IF EXISTS tolerates absence
    spark.sql(s"ALTER TABLE graft.`$dir` DROP CONSTRAINT v_pos")
    spark.sql(
      s"ALTER TABLE graft.`$dir` DROP CONSTRAINT IF EXISTS v_pos")
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` DROP CONSTRAINT v_pos")
    }
    assert(e2.getMessage.contains("no constraint"), e2.getMessage)
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (3, -1.0)")
    assert(spark.table(s"graft.`$dir`").count() == 3)
  }

  test("nested NOT NULL: ADD … NOT NULL DEFAULT covers history " +
      "metadata-only; enforcement is parent-null-guarded at commit") {
    register()
    val dir = tmpDir("dn-nested-nn")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    // history: one row with a live struct, one with a NULL parent
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.5, 'kind', 'a')), (2, NULL)")
    val filesBefore = spark.sql(s"SELECT file FROM graft.`$dir#files`")
      .collect().map(_.getString(0)).toSet
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh BIGINT NOT NULL DEFAULT 50)")
    assert(spark.sql(s"SELECT file FROM graft.`$dir#files`")
      .collect().map(_.getString(0)).toSet == filesBefore,
      "nested NOT NULL DEFAULT add must be metadata-only")
    // the declaration landed on the member
    val mt = spark.table(s"graft.`$dir`").schema("main")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(!mt("rh").nullable, "member must declare NOT NULL")
    // history serves the default under a non-null parent, NULL parents
    // stay NULL (the member only exists where the parent does)
    val got = spark.sql(s"SELECT id, main.rh FROM graft.`$dir` ORDER BY id")
      .collect()
    assert(got(0).getLong(1) == 50L && got(1).isNullAt(1))
    // an un-NOT-NULLed ADD without DEFAULT still refuses
    val e0 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` " +
        "ADD COLUMNS (main.xx BIGINT NOT NULL)")
    }
    assert(e0.getMessage.contains("non-null DEFAULT"), e0.getMessage)
    // commit enforcement (defaulted member → the defaults gate): a
    // stored NULL under a non-null parent refuses; a NULL parent lands
    val e1 = intercept[Exception] {
      ops.commit(spark.sql("SELECT 3L AS id, named_struct(" +
        "'temp', 2.0D, 'kind', 'b', 'rh', CAST(NULL AS BIGINT)) AS main"),
        dir)
    }
    assert(e1.getMessage.contains("main.rh"), e1.getMessage)
    ops.commit(spark.sql(
      "SELECT 4L AS id, CAST(NULL AS STRUCT<temp: DOUBLE, kind: STRING, " +
        "rh: BIGINT>) AS main"), dir)
    assert(spark.table(s"graft.`$dir`").count() == 3)
  }

  test("nested SET NOT NULL is born-valid over SERVED values or " +
      "refused; enforcement and DROP NOT NULL follow; element members " +
      "enforce through forall") {
    register()
    val dir = tmpDir("dn-nested-setnn")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>, " +
      "weather ARRAY<STRUCT<cond: STRING, n: INT>>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0, 'kind', 'a'), " +
      "array(named_struct('cond', 'ok', 'n', 1))), " +
      "(2, named_struct('temp', 2.0, 'kind', CAST(NULL AS STRING)), " +
      "array(named_struct('cond', 'ok', 'n', 2))), " +
      "(3, NULL, NULL)")
    // born-broken: row 2 has kind NULL under a non-null parent
    val e0 = intercept[Exception] {
      spark.sql(s"CALL graft.set_not_null('$dir', 'main.kind')")
    }
    assert(e0.getMessage.contains("SET NOT NULL"), e0.getMessage)
    // temp is non-null wherever main is (row 3's NULL parent passes —
    // the member constraint applies where the parent exists)
    spark.sql(s"CALL graft.set_not_null('$dir', 'main.temp')")
    val mt = spark.table(s"graft.`$dir`").schema("main")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(!mt("temp").nullable)
    // enforced from then on: NULL temp under a live parent refuses…
    val e1 = intercept[Exception] {
      ops.commit(spark.sql("SELECT 5L AS id, named_struct(" +
        "'temp', CAST(NULL AS DOUBLE), 'kind', 'x') AS main, " +
        "CAST(NULL AS ARRAY<STRUCT<cond: STRING, n: INT>>) AS weather"),
        dir)
    }
    assert(e1.getMessage.contains("nested NOT NULL main.temp"),
      e1.getMessage)
    // …a NULL parent still lands (vacuous), and DROP NOT NULL relaxes
    ops.commit(spark.sql("SELECT 6L AS id, " +
      "CAST(NULL AS STRUCT<temp: DOUBLE, kind: STRING>) AS main, " +
      "CAST(NULL AS ARRAY<STRUCT<cond: STRING, n: INT>>) AS weather"),
      dir)
    spark.sql(
      s"ALTER TABLE graft.`$dir` ALTER COLUMN main.temp DROP NOT NULL")
    ops.commit(spark.sql("SELECT 7L AS id, named_struct(" +
      "'temp', CAST(NULL AS DOUBLE), 'kind', 'x') AS main, " +
      "CAST(NULL AS ARRAY<STRUCT<cond: STRING, n: INT>>) AS weather"),
      dir) // legal again
    // ELEMENT members: the declaration enforces per element via forall
    spark.sql(
      s"CALL graft.set_not_null('$dir', 'weather.element.cond')")
    val e2 = intercept[Exception] {
      ops.commit(spark.sql("SELECT 8L AS id, " +
        "CAST(NULL AS STRUCT<temp: DOUBLE, kind: STRING>) AS main, " +
        "array(named_struct('cond', CAST(NULL AS STRING), 'n', 9)) " +
          "AS weather"), dir)
    }
    assert(e2.getMessage.contains("nested NOT NULL weather.element.cond"),
      e2.getMessage)
    // a NULL element and a NULL array are null parents: both land
    ops.commit(spark.sql("SELECT 9L AS id, " +
      "CAST(NULL AS STRUCT<temp: DOUBLE, kind: STRING>) AS main, " +
      "array(CAST(NULL AS STRUCT<cond: STRING, n: INT>)) AS weather"),
      dir)
    assert(spark.table(s"graft.`$dir`").count() == 6)
  }

  test("ELEMENT-struct existence defaults: history serves the default " +
      "per element, NULL elements and NULL arrays stay NULL, the append " +
      "gate enforces per element, map VALUE members too") {
    register()
    val dir = tmpDir("dn-elem-default")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "weather ARRAY<STRUCT<cond: STRING, n: INT>>, " +
      "props MAP<STRING, STRUCT<v: INT>>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, array(named_struct('cond', 'a', 'n', 1), " +
      "named_struct('cond', 'b', 'n', 2)), " +
      "map('x', named_struct('v', 3))), " +
      "(2, array(named_struct('cond', 'c', 'n', 4), " +
      "CAST(NULL AS STRUCT<cond: STRING, n: INT>)), " +
      "map('x', CAST(NULL AS STRUCT<v: INT>))), " +
      "(3, NULL, NULL)")
    val filesBefore = spark.sql(s"SELECT file FROM graft.`$dir#files`")
      .collect().map(_.getString(0)).toSet
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(weather.element.score DOUBLE DEFAULT 0.5, props.value.w INT " +
      "DEFAULT 9)")
    assert(spark.sql(s"SELECT file FROM graft.`$dir#files`")
      .collect().map(_.getString(0)).toSet == filesBefore,
      "element DEFAULT add must be metadata-only")
    // history: non-null elements serve the default, NULL elements and
    // NULL arrays/maps stay NULL (a NULL element is a NULL parent)
    val got = spark.sql("SELECT id, weather, element_at(props, 'x').w " +
      s"FROM graft.`$dir` ORDER BY id").collect()
    val w1 = got(0).getSeq[org.apache.spark.sql.Row](1)
    assert(w1.map(_.getDouble(2)).toSeq == Seq(0.5, 0.5),
      s"pre-ADD elements must serve the default: $w1")
    assert(got(0).getInt(2) == 9, "map VALUE member must serve its default")
    val w2 = got(1).getSeq[org.apache.spark.sql.Row](1)
    assert(w2.head.getDouble(2) == 0.5 && w2(1) == null,
      s"a NULL element must stay NULL: $w2")
    assert(got(1).isNullAt(2), "a NULL map value must stay NULL")
    assert(got(2).isNullAt(1), "a NULL array must stay NULL")
    // the append gate: storing NULL in a defaulted ELEMENT member under
    // a non-null element refuses (indistinguishable from absent per
    // file); NULL elements land fine
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir` VALUES (4, " +
        "array(named_struct('cond', 'd', 'n', 5, 'score', " +
        "CAST(NULL AS DOUBLE))), map('x', named_struct('v', 1, 'w', 2)))")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("weather.element.score")),
      msgs(e).mkString(" | "))
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (5, " +
      "array(named_struct('cond', 'e', 'n', 6, 'score', 1.5), " +
      "CAST(NULL AS STRUCT<cond: STRING, n: INT, score: DOUBLE>)), " +
      "map('x', named_struct('v', 1, 'w', 2)))")
    // stored values serve; the defaults fill only where history lacks
    val post = spark.sql("SELECT weather[0].score, " +
      s"element_at(props, 'x').w FROM graft.`$dir` WHERE id = 5").head()
    assert(post.getDouble(0) == 1.5 && post.getInt(1) == 2)
    assert(spark.table(s"graft.`$dir`").count() == 4)
  }

  test("a whole-chain nested NOT NULL declaration is TopN pushdown's " +
      "zero-null proof — no ANALYZE needed on the dotted path") {
    register()
    val dir = tmpDir("dn-nested-topn")
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, main STRUCT<ts: BIGINT, kind: STRING>)")
    // clustered commits land RANGE BOUNDS for the dotted path with every
    // batch (cbo stays off — no null counts anywhere), the streaming-
    // landing shape where an ANALYZE-free zero-null proof matters
    ops.commitClustered(
      spark.range(0, 100).select(col("id"),
        struct(col("id").as("ts"), lit("a").as("kind")).as("main")),
      dir, Seq("id"), Seq("main.ts"), numFiles = 1)
    ops.commitClustered(
      spark.range(100, 200).select(col("id"),
        struct(col("id").as("ts"), lit("b").as("kind")).as("main")),
      dir, Seq("id"), Seq("main.ts"), numFiles = 1)
    // leaf-only declaration is NOT enough (a NULL parent nulls the path)
    spark.sql(s"CALL graft.set_not_null('$dir', 'main.ts')")
    GraftCatalog.lastTopNAdmit = (-1, -1)
    assert(spark.sql(s"SELECT main.ts FROM graft.`$dir` " +
      "ORDER BY main.ts LIMIT 3").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L))
    assert(GraftCatalog.lastTopNAdmit == ((-1, -1)),
      "leaf-only declaration must decline — a NULL parent nulls the path")
    // whole chain declared → the proof holds with zero ANALYZE
    spark.sql(s"CALL graft.set_not_null('$dir', 'main')")
    GraftCatalog.lastTopNAdmit = (-1, -1)
    assert(spark.sql(s"SELECT main.ts FROM graft.`$dir` " +
      "ORDER BY main.ts LIMIT 3").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L))
    assert(GraftCatalog.lastTopNAdmit == ((2, 1)),
      s"expected a 1-file cover: ${GraftCatalog.lastTopNAdmit}")
  }

  test("nested NOT NULL commit gate: a batch omitting the nullable " +
      "PARENT column passes vacuously (every row reads a NULL parent); " +
      "only a missing LEAF under a present parent chain refuses") {
    register()
    val dir = tmpDir("dn-absent-parent")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0, 'kind', 'a'))")
    spark.sql(s"CALL graft.set_not_null('$dir', 'main.kind')")
    // leaf absent under a PRESENT parent: refuse — rows with non-null
    // main would read NULL kind
    val e = intercept[Exception] {
      ops.commit(spark.sql(
        "SELECT 2L AS id, named_struct('temp', 2.0) AS main"), dir)
    }
    assert(e.getMessage.contains("carries no member"), e.getMessage)
    // the whole nullable parent column absent: every landed row reads a
    // NULL main, so main.kind is vacuously satisfied — the commit lands
    // (the same batch WITH a carried NULL main is accepted, and the two
    // must agree)
    ops.commit(spark.sql("SELECT 3L AS id"), dir)
    val served = spark.sql(
      s"SELECT id, main FROM graft.`$dir` WHERE id = 3").collect()
    assert(served.length == 1 && served(0).isNullAt(1),
      "the omitted parent must read back as NULL")
    assert(spark.table(s"graft.`$dir`").count() == 2)
  }

  test("set_not_null addresses a TOP-LEVEL column whose name contains " +
      "a literal dot via backtick quoting") {
    register()
    val dir = tmpDir("dn-dotted-name")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, `obs.raw` STRING)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 'x'), (2, 'y')")
    // unquoted 'obs.raw' parses as a nested path and must refuse loudly
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.set_not_null('$dir', 'obs.raw')")
    }
    assert(e.getMessage.toLowerCase.contains("obs"), e.getMessage)
    // backtick-quoted, the dotted NAME is one segment: declares, then
    // enforces
    spark.sql(s"CALL graft.set_not_null('$dir', '`obs.raw`')")
    assert(!spark.table(s"graft.`$dir`").schema("obs.raw").nullable)
    val e2 = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir` VALUES (3, NULL)")
    }
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
  }
}
