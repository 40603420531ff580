package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental view maintenance: the pointer protocol (mode transitions,
  * exactly-once replay, foreign-commit orphaning), delta-fold equivalence
  * with a from-scratch rebuild, the non-append fallback, and the keyed
  * path's file-scoped rewrite guarantee. */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable
  private val iv = IncrementalView

  private def rows(ids: Range) = ids.map(i => (i.toLong, s"g${i % 3}",
    i * 1.5)).toDF("id", "g", "v")

  private def partials(df: DataFrame): DataFrame =
    df.groupBy(col("g")).agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)")
        .as("sum_v"))

  private def mergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("g"))
      .agg(sum(col("n")).as("n"),
        // stable state type under the fold (refreshKeyed contract)
        sum(col("sum_v")).cast("decimal(28,4)").as("sum_v"))

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"state mismatch:\n${a.collect().mkString("\n")}\nvs\n" +
        s"${b.collect().mkString("\n")}")
  }

  test("overwrite path: initial → incremental → noop, delta fold ≡ rebuild") {
    val tmp = tmpDir("ivm-basic")
    val src = s"$tmp/src"; val view = s"$tmp/view"
    ops.commit(rows(0 until 60), src)
    val r1 = iv.refresh(spark, src, view, partials, mergeStates)
    assert(r1.mode == "initial" && r1.srcVersion == 1)
    ops.commit(rows(60 until 100), src)
    val r2 = iv.refresh(spark, src, view, partials, mergeStates)
    assert(r2.mode == "incremental" && r2.srcVersion == 2)
    assertSame(ops.read(spark, view), partials(rows(0 until 100)))
    // already current: publishes nothing
    val r3 = iv.refresh(spark, src, view, partials, mergeStates)
    assert(r3.mode == "noop" && r3.viewVersion == r2.viewVersion)
    assert(ops.versions(view) == Seq(1, 2))
    // prior state stays time-travelable
    assertSame(ops.read(spark, view, Some(r1.viewVersion)),
      partials(rows(0 until 60)))
  }

  test("non-append source history: recompute fallback, or loud refusal") {
    val tmp = tmpDir("ivm-nonapp")
    val src = s"$tmp/src"; val view = s"$tmp/view"
    ops.commit(rows(0 until 50), src)
    iv.refresh(spark, src, view, partials, mergeStates)
    // a row delete on the source breaks pure-append lineage
    ops.deleteWhere(spark, src, col("id") < 10)
    val e = intercept[IllegalArgumentException] {
      iv.refresh(spark, src, view, partials, mergeStates,
        allowRecompute = false)
    }
    assert(e.getMessage.contains("full recompute"))
    val r = iv.refresh(spark, src, view, partials, mergeStates)
    assert(r.mode == "recompute")
    assertSame(ops.read(spark, view), partials(rows(10 until 50)))
  }

  test("foreign head commit orphans the pointer; next refresh recomputes") {
    val tmp = tmpDir("ivm-foreign")
    val src = s"$tmp/src"; val view = s"$tmp/view"
    ops.commit(rows(0 until 30), src)
    iv.refresh(spark, src, view, partials, mergeStates)
    assert(iv.incorporated(view, src).contains(1))
    // someone commits directly to the view: provenance unknown
    ops.commit(Seq(("gX", 1L)).toDF("g", "n")
      .withColumn("sum_v", lit(0).cast("decimal(28,4)")), view)
    assert(iv.incorporated(view, src).isEmpty)
    val r = iv.refresh(spark, src, view, partials, mergeStates)
    assert(r.mode == "recompute")
    assertSame(ops.read(spark, view), partials(rows(0 until 30)))
  }

  test("keyed path: only files holding touched groups are rewritten") {
    val tmp = tmpDir("ivm-keyed")
    val src = s"$tmp/src"; val view = s"$tmp/view"
    // group key = g; state clustered into one file per group
    def kp(df: DataFrame) = partials(df).repartitionByRange(3, col("g"))
    ops.commit(rows(0 until 90), src)
    val r1 = iv.refreshKeyed(spark, src, view, "g", kp, mergeStates)
    assert(r1.mode == "initial")
    ops.writeStats(spark, view, r1.viewVersion, Seq("g"))
    val before = ops.filesMeta(spark, view).select("file", "size_bytes")
      .as[(String, Long)].collect().toMap
    // the delta touches ONLY group g0 (ids ≡ 0 mod 3)
    ops.commit(rows(90 until 120).filter(col("g") === "g0"), src)
    val r2 = iv.refreshKeyed(spark, src, view, "g", kp, mergeStates)
    assert(r2.mode == "incremental")
    val after = ops.filesMeta(spark, view).select("file", "size_bytes")
      .as[(String, Long)].collect().toMap
    // untouched-group files survive byte-identical (same path, same size);
    // at least the g2-only file must — g0's file is legitimately rewritten
    val survivors = before.keySet.intersect(after.keySet)
    assert(survivors.nonEmpty, "keyed refresh rewrote the whole state")
    survivors.foreach(f => assert(before(f) == after(f)))
    assertSame(ops.read(spark, view),
      partials(rows(0 until 90).unionByName(
        rows(90 until 120).filter(col("g") === "g0"))))
    // replay of an already-incorporated source version: noop
    assert(iv.refreshKeyed(spark, src, view, "g", kp, mergeStates)
      .mode == "noop")
  }

  test("streaming maintainer: graft-table stream folds into a keyed view") {
    val tmp = tmpDir("ivm-stream")
    val src = s"$tmp/src"; val view = s"$tmp/view"; val ck = s"$tmp/ck"
    def kp(df: DataFrame) = partials(df).repartitionByRange(3, col("g"))
    def drain(): Unit = {
      val q = iv.maintainer(
        spark.readStream.format("graft-table")
          .option("maxVersionsPerTrigger", "1").load(src),
        view, "g", kp, mergeStates, "ivm_stream", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    ops.commit(rows(0 until 40), src)
    drain()
    assertSame(ops.read(spark, view), partials(rows(0 until 40)))
    // two more source commits: the capped drain folds each as one batch
    ops.commit(rows(40 until 70), src)
    ops.commit(rows(70 until 100), src)
    drain()
    assertSame(ops.read(spark, view), partials(rows(0 until 100)))
    // nothing new: the view does not move
    val head = ops.versions(view).last
    drain()
    assert(ops.versions(view).last == head)
  }

  test("empty delta commit still advances the pointer") {
    val tmp = tmpDir("ivm-empty")
    val src = s"$tmp/src"; val view = s"$tmp/view"
    ops.commit(rows(0 until 20), src)
    iv.refresh(spark, src, view, partials, mergeStates)
    ops.commit(rows(0 until 0), src) // an empty batch lands a version
    val r = iv.refresh(spark, src, view, partials, mergeStates)
    assert(r.mode == "incremental" && iv.incorporated(view, src)
      .contains(ops.versions(src).last))
    assertSame(ops.read(spark, view), partials(rows(0 until 20)))
  }
}
