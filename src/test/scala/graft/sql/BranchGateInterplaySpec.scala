package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VersionedTable

/** Adversarial interplay probes, round 4: the declared-gate surface
  * (CHECK constraints, NOT NULL, nested gates, renames, derived
  * properties) crossed with the LINEAGE-CROSSING doors — branch
  * commits, fast-forward, WAP promote — where data can enter a table
  * without passing the per-commit validation the head's own doors run.
  * The engine's refusal messages promise "the engine validates every
  * commit"; these probes ask whether that holds when the commit arrives
  * sideways.
  */
class BranchGateInterplaySpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def register(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  test("a fast-forward into a CHECK-constrained parent validates the " +
      "branch head's LIVE view — violating branch rows must refuse, " +
      "not publish") {
    register()
    val dir = tmpDir("bg-ff-check") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE, " +
      "CONSTRAINT pos CHECK (v >= 0))")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 1.0)")
    spark.sql(s"CALL graft.create_branch('$dir', 'exp', 'head')")
    // the branch is its own lineage (WAP-style staging): landing an
    // out-of-contract row THERE is allowed — validation is owed at the
    // ownership crossing, exactly like promote
    spark.sql(s"INSERT INTO graft.`$dir#branch=exp` VALUES (2, -5.0)")
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.fast_forward('$dir', 'exp')")
    }
    assert(e.getMessage.contains("pos") || e.getMessage.contains("CHECK"),
      s"fast-forward must refuse the constraint violation: ${e.getMessage}")
    // the parent lineage must be untouched by the refused publish
    assert(ops.versions(dir) == Seq(1),
      s"a refused fast-forward must not advance the parent: " +
        s"${ops.versions(dir)}")
    assert(spark.table(s"graft.`$dir`").collect().map(_.getLong(0)).toSeq
      == Seq(1L))
    // cure the branch: delete the violating row — the gate judges the
    // LIVE view (vector applied), so the ff lands and carries the
    // vector; the parent compacts to materialize before catalog reads
    spark.sql(s"DELETE FROM graft.`$dir#branch=exp` WHERE v < 0")
    spark.sql(s"CALL graft.fast_forward('$dir', 'exp')")
    spark.sql(s"CALL graft.compact('$dir', '${1L << 30}')")
    assert(spark.table(s"graft.`$dir`").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L))
  }

  test("a fast-forward into a parent with a declared NOT NULL column " +
      "validates too — explicit CHECKs are not the only gate") {
    register()
    val dir = tmpDir("bg-ff-nn") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 1.0)")
    spark.sql(s"CALL graft.create_branch('$dir', 'exp', 'head')")
    // the branch's fork-time declaration is still nullable, so THIS
    // landing passes on the branch lineage…
    spark.sql(s"INSERT INTO graft.`$dir#branch=exp` " +
      "VALUES (2, CAST(NULL AS DOUBLE))")
    // …then the PARENT declares NOT NULL (born-valid over its own
    // rows), so the branch row is out of contract exactly at the
    // ownership crossing
    spark.sql(s"CALL graft.set_not_null('$dir', 'v')")
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.fast_forward('$dir', 'exp')")
    }
    assert(e.getMessage.contains("NOT NULL") ||
      e.getMessage.toLowerCase.contains("null"),
      s"fast-forward must refuse the NOT NULL violation: ${e.getMessage}")
    assert(ops.versions(dir) == Seq(1))
  }

  test("WAP promote into a destination with a declared NOT NULL column " +
      "validates even when the destination has NO explicit CHECK " +
      "constraint") {
    val to = tmpDir("bg-promote-nn")
    val from = tmpDir("bg-promote-stage")
    ops.commit(Seq((1L, 1.0)).toDF("id", "v"), to)
    register()
    spark.sql(s"CALL graft.set_not_null('$to', 'v')")
    ops.commit(Seq((2L, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "v"), from)
    val e = intercept[Exception] {
      ops.promote(spark, from, to)
    }
    assert(e.getMessage.contains("NOT NULL") ||
      e.getMessage.toLowerCase.contains("null"),
      s"promote must refuse the NOT NULL violation: ${e.getMessage}")
    assert(ops.versions(to) == Seq(1),
      "a refused promote must not advance the destination")
    // a promote whose staged LIVE view is clean (the violating row is
    // deleted on staging before promoting) passes: the gate judges
    // SERVED rows, not dead bytes
    ops.deleteWhere(spark, from, col("v").isNull)
    ops.promote(spark, from, to)
    assert(ops.read(spark, to).count() == 1L)
  }

  test("a branch READ serves the parent's LOGICAL column names — " +
      "physical names are an internal indirection that must never " +
      "surface, fork or no fork") {
    register()
    val dir = tmpDir("bg-branch-rename") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, val DOUBLE)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 1.5)")
    // rename BEFORE the fork: the files carry the birth-time physical
    // name 'val'; the declared (user-visible) name is 'v2'
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN val TO v2")
    spark.sql(s"CALL graft.create_branch('$dir', 'exp', 'head')")
    val cols = spark.table(s"graft.`$dir#branch=exp`").columns.toSeq
    assert(cols == Seq("id", "v2"),
      s"branch read must serve logical names, got $cols")
    // and branch WRITES resolve the logical name back to the physical
    spark.sql(s"INSERT INTO graft.`$dir#branch=exp` VALUES (2, 2.5)")
    val got = spark.table(s"graft.`$dir#branch=exp`")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 1.5), (2L, 2.5)))
    // the fork carries the declaration ONWARD too: a rename on the
    // PARENT after the fork stays parent-local (the branch keeps the
    // fork-time name), and a branch-side ALTER evolves the branch only
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN v2 TO v3")
    assert(spark.table(s"graft.`$dir#branch=exp`").columns.toSeq
      == Seq("id", "v2"), "a parent rename after the fork must not " +
        "reach the branch lineage")
    spark.sql(s"ALTER TABLE graft.`$dir#branch=exp` " +
      "RENAME COLUMN v2 TO vb")
    assert(spark.table(s"graft.`$dir#branch=exp`").columns.toSeq
      == Seq("id", "vb"))
    assert(spark.table(s"graft.`$dir`").columns.toSeq == Seq("id", "v3"),
      "a branch rename must not reach the parent")
  }

  test("a branch READ serves the parent's nested existence defaults — " +
      "the fork carries the declaration, not just the file pointers") {
    register()
    val dir = tmpDir("bg-branch-nd") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh INT DEFAULT 55)")
    spark.sql(s"CALL graft.create_branch('$dir', 'exp', 'head')")
    val r = spark.sql(
      s"SELECT main.rh FROM graft.`$dir#branch=exp` WHERE id = 1")
      .collect()
    assert(r.length == 1 && !r(0).isNullAt(0) && r(0).getInt(0) == 55,
      s"the branch read must serve the declared default, got " +
        s"${r.toSeq}")
  }

  test("the fork carries the partitioning declaration: branch landings " +
      "cluster by the parent's transforms and the file cap rides") {
    register()
    val dir = tmpDir("bg-branch-part") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, k BIGINT) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('files' = '2')")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 10)")
    spark.sql(s"CALL graft.create_branch('$dir', 'exp', 'head')")
    val bd = ops.branchDir(dir, "exp")
    assert(ops.partitioningOf(bd).map(_.spec) ==
      ops.partitioningOf(dir).map(_.spec),
      "the fork must carry the partitioning declaration")
    assert(ops.partitioningNumFiles(bd) == 2,
      "the fork must carry the per-landing file cap")
  }

  test("branch commits enforce the fork-time declared gates: a stored " +
      "NULL in a defaulted member under a non-null parent refuses on " +
      "the BRANCH exactly as it would on the head") {
    register()
    val dir = tmpDir("bg-branch-gate") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh INT DEFAULT 55)")
    spark.sql(s"CALL graft.create_branch('$dir', 'exp', 'head')")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir#branch=exp` VALUES " +
        "(2, named_struct('temp', 2.0, 'rh', CAST(NULL AS INT)))")
    }
    assert(e.getMessage.toLowerCase.contains("default") ||
      e.getMessage.toLowerCase.contains("null"),
      s"the branch commit must refuse the default-gate violation: " +
        s"${e.getMessage}")
  }

  // ---- round 5: foreign-batch nested gates + the structural pin ----

  test("WAP promote refuses a staged lineage that OMITS a destination-" +
      "declared nested NOT NULL member — the absent leaf must not " +
      "promote unseen") {
    register()
    val to = tmpDir("bg-p-nnn") + "/t"
    spark.sql(s"CREATE TABLE graft.`$to` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    spark.sql(s"INSERT INTO graft.`$to` VALUES " +
      "(1, named_struct('temp', 1.0, 'kind', 'a'))")
    spark.sql(s"CALL graft.set_not_null('$to', 'main.temp')")
    // the staging lineage simply never declared temp: its main struct
    // carries only kind, under fully-present parents — every promoted
    // row would read NULL at the destination's declared NOT NULL path
    val from = tmpDir("bg-p-nnn-stage") + "/s"
    ops.commit(spark.sql("SELECT 2L AS id, " +
      "named_struct('kind', 'b') AS main"), from)
    val e = intercept[Exception] { ops.promote(spark, from, to) }
    assert(e.getMessage.contains("nested NOT NULL"),
      s"promote must refuse the absent nested NOT NULL leaf: " +
        s"${e.getMessage}")
    assert(spark.table(s"graft.`$to`").count() == 1,
      "a refused promote must not publish")
    // cure: a staging lineage carrying the member promotes
    val from2 = tmpDir("bg-p-nnn-stage2") + "/s"
    ops.commit(spark.sql("SELECT 3L AS id, " +
      "named_struct('temp', CAST(3.0 AS DOUBLE), 'kind', 'c') AS main"), from2)
    ops.promote(spark, from2, to)
    assert(spark.table(s"graft.`$to`").count() == 2)
  }

  test("fast-forward refuses a branch that DROPPED a parent-declared " +
      "nested NOT NULL member after the fork") {
    register()
    val dir = tmpDir("bg-ff-nnn") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES " +
      "(1, named_struct('temp', 1.0, 'kind', 'a'))")
    spark.sql(s"CALL graft.set_not_null('$dir', 'main.temp')")
    spark.sql(s"CALL graft.create_branch('$dir', 'exp', 'head')")
    // the branch evolves independently: drop the member the parent
    // declares NOT NULL, then land a row without it
    spark.sql(s"ALTER TABLE graft.`$dir#branch=exp` " +
      "ALTER COLUMN main.temp DROP NOT NULL")
    spark.sql(s"ALTER TABLE graft.`$dir#branch=exp` DROP COLUMN main.temp")
    spark.sql(s"INSERT INTO graft.`$dir#branch=exp` VALUES " +
      "(2, named_struct('kind', 'b'))")
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.fast_forward('$dir', 'exp')")
    }
    assert(e.getMessage.contains("nested NOT NULL") ||
      Option(e.getCause).exists(_.getMessage.contains("nested NOT NULL")),
      s"fast-forward must refuse the dropped nested NOT NULL member: " +
        s"${e.getMessage}")
    assert(spark.table(s"graft.`$dir`").count() == 1)
  }

  test("promote validates the structural pin on EVERY mode: a type-" +
      "incompatible staged column refuses in append AND replace — " +
      "names alone are not compatibility") {
    register()
    val to = tmpDir("bg-p-pin") + "/t"
    spark.sql(s"CREATE TABLE graft.`$to` (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.`$to` VALUES (1, 1.5)")
    // same NAMES, incompatible type: v is a STRING in the staged files
    val from = tmpDir("bg-p-pin-stage") + "/s"
    ops.commit(spark.sql("SELECT 2L AS id, 'oops' AS v"), from)
    val eA = intercept[Exception] { ops.promote(spark, from, to) }
    assert(eA.getMessage.contains("structurally incompatible"),
      s"append promote must refuse the type conflict: ${eA.getMessage}")
    val eR = intercept[Exception] {
      ops.promote(spark, from, to, append = false)
    }
    assert(eR.getMessage.contains("structurally incompatible"),
      s"replace promote must refuse the type conflict: ${eR.getMessage}")
    assert(spark.table(s"graft.`$to`").count() == 1,
      "refused promotes must not publish")
    // a WIDENABLE staged type (int under a declared long id) promotes:
    // the pin accepts the same set ALTER COLUMN TYPE does
    val from2 = tmpDir("bg-p-pin-stage2") + "/s"
    ops.commit(spark.sql("SELECT CAST(7 AS INT) AS id, CAST(2.5 AS DOUBLE) AS v"), from2)
    ops.promote(spark, from2, to)
    assert(spark.table(s"graft.`$to`").count() == 2)
  }
}
