package graft.sql

import graft.SparkSpec
import graft.sinks.VersionedTable

/** Round-15 integrity probes on the DDL surface — each pins a fix for a
  * reviewer-found defect:
  *
  *  - CREATE TABLE with inline constraints must be ATOMIC: a refused
  *    constraint (NOT ENFORCED, non-CHECK, duplicate name) must leave NO
  *    half-created table behind, or the user's retried CREATE hits
  *    TableAlreadyExistsException with nothing to drop that they made.
  *  - `graft.nested.default.<path>` property keys must round-trip a
  *    nested member whose NAME contains a literal dot (backtick-quoted
  *    on emit, multipart-parsed on consume — the same convention
  *    set_not_null already honors).
  *  - The nested NOT NULL commit gate must refuse a user batch whose
  *    ANCESTOR on the declared path is carried with a structurally
  *    incompatible type — that is a schema violation, not a vacuous
  *    NULL parent, and silently skipping the gate would let it land.
  */
class DdlIntegritySpec extends SparkSpec {

  private val ops = VersionedTable

  private def register(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  test("a refused inline constraint leaves NO half-created table: the " +
      "statement fails atomically and a corrected retry succeeds") {
    register()
    val dir = tmpDir("ddl-atomic") + "/t"
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE, " +
        "CONSTRAINT pos CHECK (v >= 0) NOT ENFORCED)")
    }
    assert(e.getMessage.contains("NOT ENFORCED"), e.getMessage)
    // nothing of the table may survive the refusal
    assert(ops.declaredSchema(dir).isEmpty,
      "a refused CREATE must not leave a declared schema behind")
    assert(ops.constraints(dir).isEmpty)
    // the corrected retry must see a clean slate, not AlreadyExists
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE, " +
      "CONSTRAINT pos CHECK (v >= 0))")
    assert(ops.constraints(dir) == Map("pos" -> "v >= 0"))
    val e2 = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, -1.0)")
    }
    assert(e2.getMessage.contains("pos") || e2.getMessage.contains("CHECK"),
      e2.getMessage)
  }

  test("duplicate inline constraint NAMES refuse before anything is " +
      "created") {
    register()
    val dir = tmpDir("ddl-dup") + "/t"
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE, " +
        "CONSTRAINT c CHECK (v >= 0), CONSTRAINT c CHECK (id > 0))")
    }
    assert(e.getMessage.toLowerCase.contains("duplicate") ||
      e.getMessage.contains("already exists"), e.getMessage)
    assert(ops.declaredSchema(dir).isEmpty,
      "a refused CREATE must not leave a declared schema behind")
    assert(ops.constraints(dir).isEmpty,
      "a refused CREATE must not leave partial constraints behind")
  }

  test("nested-default property paths render/parse round-trip, dotted " +
      "and backticked member names included") {
    val cases = Seq(
      Seq("main", "rh"),
      Seq("main", "rh.pct"),             // literal dot in the NAME
      Seq("weather", "element", "q"),
      Seq("a.b", "c", "d.e.f"),          // dots at several depths
      Seq("odd`tick", "x"))              // literal backtick in the NAME
    cases.foreach { p =>
      val rendered = NestedDefaults.renderPropertyPath(p)
      assert(NestedDefaults.parsePropertyPath(rendered) == p,
        s"round-trip broke for $p via '$rendered'")
    }
    // plain dotted suffixes (what older emitted DDL carries) still split
    assert(NestedDefaults.parsePropertyPath("main.rh") == Seq("main", "rh"))
    intercept[IllegalArgumentException] {
      NestedDefaults.parsePropertyPath("main.`broken")
    }
  }

  test("SHOW CREATE round-trips a nested existence default on a member " +
      "whose NAME contains a literal dot") {
    register()
    val dir = tmpDir("ddl-dotted-nd") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.`rh.pct` INT DEFAULT 55)")
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$dir`")
      .collect().head.getString(0)
    assert(ddl.contains("graft.nested.default.main.`rh.pct`"),
      s"the dotted member must emit backtick-quoted: $ddl")
    val dir2 = tmpDir("ddl-dotted-nd2") + "/t"
    spark.sql(ddl.replace(dir, dir2))
    val decl2 = spark.table(s"graft.`$dir2`").schema
    val paths = NestedDefaults.paths(decl2).map(_._1)
    assert(paths == Seq(Seq("main", "rh.pct")),
      s"the re-created table must carry the default on the DOTTED " +
        s"member, not a mis-split path: $paths")
  }

  test("nested NOT NULL commit gate refuses a user batch carrying a " +
      "TYPE-INCOMPATIBLE ancestor — a wrong-typed parent is not a " +
      "vacuous NULL parent") {
    register()
    val dir = tmpDir("ddl-mismatch")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0, 'kind', 'a'))")
    spark.sql(s"CALL graft.set_not_null('$dir', 'main.kind')")
    // the batch CARRIES main — as a STRING, not the declared struct
    val e = intercept[Exception] {
      ops.commit(spark.sql("SELECT 2L AS id, 'oops' AS main"), dir)
    }
    assert(e.getMessage.contains("type-incompatible") ||
      e.getMessage.toLowerCase.contains("incompatible"), e.getMessage)
    assert(spark.table(s"graft.`$dir`").count() == 1,
      "the mismatched batch must not land")
  }
}
