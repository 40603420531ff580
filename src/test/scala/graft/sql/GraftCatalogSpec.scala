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
}
