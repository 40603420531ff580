package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Commit-time CHECK constraints on the versioned table: declared once,
  * enforced on every landing path (append, clustered commit, merge,
  * promotion) by scanning only the NEW batch files, with SQL-standard
  * null semantics (NULL passes). The atomicity claim under test: a
  * rejected commit publishes NOTHING — head, history, and replay ledger
  * are exactly as before, and the dead batch is orphan-sweep debris. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private val backend: TableIO = TableIO.local
  private lazy val ops = new VersionedTableOps(backend)

  private def ids(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id"), (col("id") % 10).as("k"))

  test("a violating commit is rejected atomically; a clean one lands") {
    val dir = tmpDir("ck-basic")
    val v1 = ops.commit(ids(0, 100), dir)
    ops.addConstraint(spark, dir, "k_range", "k >= 0 AND k < 10")
    ops.addConstraint(spark, dir, "id_pos", "id >= 0")
    assert(ops.constraints(dir).keySet == Set("k_range", "id_pos"))

    val e = intercept[IllegalArgumentException] {
      ops.commit(ids(100, 200).withColumn("k",
        when(col("id") % 50 === 0, -1L).otherwise(col("k"))), dir)
    }
    assert(e.getMessage.contains("k_range") &&
      e.getMessage.contains("2 row(s)"))
    // nothing published: head, count, txn ledger untouched
    assert(ops.versions(dir).last == v1)
    assert(ops.read(spark, dir).count() == 100)
    // the dead batch is vacuum debris
    assert(ops.vacuumOrphans(dir, graceMs = 0L) == 1)

    assert(ops.commit(ids(100, 200), dir) == v1 + 1)
    assert(ops.read(spark, dir).count() == 200)
  }

  test("declaration refuses when existing rows already violate") {
    val dir = tmpDir("ck-born")
    ops.commit(ids(0, 100), dir)
    val e = intercept[IllegalArgumentException] {
      ops.addConstraint(spark, dir, "small", "id < 50")
    }
    assert(e.getMessage.contains("50 existing row(s)"))
    // and re-declaring an existing name refuses
    ops.addConstraint(spark, dir, "pos", "id >= 0")
    val d = intercept[IllegalArgumentException] {
      ops.addConstraint(spark, dir, "pos", "id >= 0")
    }
    assert(d.getMessage.contains("already exists"))
  }

  test("NULL passes (SQL CHECK semantics); merge and promote validate") {
    val dir = tmpDir("ck-null")
    ops.commit(ids(0, 10), dir)
    ops.addConstraint(spark, dir, "k_cap", "k < 10")
    // a NULL k is not a violation
    ops.commit(spark.range(10, 12).select(col("id"),
      lit(null).cast("long").as("k")), dir)
    assert(ops.read(spark, dir).count() == 12)
    // merge rejects a violating upsert
    val m = intercept[IllegalArgumentException] {
      ops.merge(spark, dir, Seq((5L, 99L)).toDF("id", "k"), "id")
    }
    assert(m.getMessage.contains("k_cap"))
    // promotion into a constrained table validates the staged LIVE view:
    // the audit delete removes the violating rows, so it goes through
    val staging = tmpDir("ck-staging")
    ops.commit(Seq((100L, 5L), (101L, 99L)).toDF("id", "k"), staging)
    val p = intercept[IllegalArgumentException] {
      ops.promote(spark, staging, dir)
    }
    assert(p.getMessage.contains("k_cap"))
    ops.deleteWhere(spark, staging, col("k") >= 10)
    ops.promote(spark, staging, dir)
    assert(ops.read(spark, dir).count() == 13)
    // dropConstraint lifts enforcement
    ops.dropConstraint(dir, "k_cap")
    ops.commit(Seq((200L, 99L)).toDF("id", "k"), dir)
    assert(ops.read(spark, dir).count() == 14)
  }
}
