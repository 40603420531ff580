package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hand-built case: latest at-or-before match, nulls when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3"), // before any right row for key 2
      (3L, ts("2024-01-01 09:00:00"), "l4")  // key with no right rows at all
    ).toDF("k", "t", "ltag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "r1"),
      (1L, ts("2024-01-01 11:00:00"), "r2"),
      (1L, ts("2024-01-01 12:00:00"), "r3"), // equal ts → matches (≤)
      (2L, ts("2024-01-01 10:00:00"), "r4")
    ).toDF("rk", "rt", "rtag")
    val got = AsOf.join(left, right, "k", "t", "rk", "rt")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("l1" -> "r1", "l2" -> "r3", "l3" -> null, "l4" -> null))
  }

  test("CALL graft.asof_join lands both directions identical to the " +
    "Scala DSL; a bad direction refuses") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    val left = Seq((1L, 10L, "l1"), (1L, 30L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "ltag")
    val right = Seq((1L, 8L, "r1"), (1L, 20L, "r2"), (2L, 9L, "r3"))
      .toDF("rk", "rt", "rtag")
    left.createOrReplaceTempView("asof_call_l")
    right.createOrReplaceTempView("asof_call_r")
    val tmp = tmpDir("asof-call")
    for (dir <- Seq("backward", "forward")) {
      spark.sql(s"CALL graft.asof_join('asof_call_l', 'asof_call_r', " +
        s"'k', 't', 'rk', 'rt', '$tmp/$dir', '$dir')")
      val landed = graft.sinks.VersionedTable.read(spark, s"$tmp/$dir")
        .collect().map(r => r.getString(2) -> r.getString(5)).toMap
      val dsl = (if (dir == "backward")
          AsOf.join(left, right, "k", "t", "rk", "rt")
        else AsOf.joinForward(left, right, "k", "t", "rk", "rt"))
        .collect().map(r => r.getString(2) -> r.getString(5)).toMap
      assert(landed == dsl, s"$dir CALL diverged from the DSL: $landed")
    }
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.asof_join('asof_call_l', 'asof_call_r', " +
        s"'k', 't', 'rk', 'rt', '$tmp/x', 'sideways')")
    }
    assert(e.getMessage.contains("backward") ||
      Option(e.getCause).exists(_.getMessage.contains("backward")))
  }

  test("asof_join TVF composes inline in SELECT: both directions match " +
    "the DSL, plan has AsOfJoinExec, non-literal and bad args refuse") {
    org.apache.spark.sql.graft.AsOfJoinTvf.register(spark)
    val left = Seq((1L, 10L, "l1"), (1L, 30L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "ltag")
    val right = Seq((1L, 8L, "r1"), (1L, 20L, "r2"), (2L, 9L, "r3"))
      .toDF("rk", "rt", "rtag")
    left.createOrReplaceTempView("asof_tvf_l")
    right.createOrReplaceTempView("asof_tvf_r")
    for (dir <- Seq("backward", "forward")) {
      val got = spark.sql("SELECT ltag, rtag FROM asof_join('asof_tvf_l', " +
        s"'asof_tvf_r', 'k', 't', 'rk', 'rt', '$dir')")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val dsl = (if (dir == "backward")
          AsOf.join(left, right, "k", "t", "rk", "rt")
        else AsOf.joinForward(left, right, "k", "t", "rk", "rt"))
        .collect().map(r => r.getString(2) -> r.getString(5)).toMap
      assert(got == dsl, s"$dir TVF diverged from the DSL: $got")
    }
    // default direction = backward
    val dflt = spark.sql("SELECT ltag, rtag FROM asof_join('asof_tvf_l', " +
      "'asof_tvf_r', 'k', 't', 'rk', 'rt')")
    assert(dflt.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "TVF expansion must plan through AsOfJoinExec")
    // ...and it COMPOSES: aggregate over the TVF like any relation
    val n = spark.sql("SELECT COUNT(rtag) FROM asof_join('asof_tvf_l', " +
      "'asof_tvf_r', 'k', 't', 'rk', 'rt')").head().getLong(0)
    assert(n == 2L) // l1->r1, l2->r2; l3 has no prior right row
    // ...and resolves CATALOG tables, not just temp views: land both
    // sides as graft tables and address them by path
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    val cdir = tmpDir("asof-tvf-cat")
    graft.sinks.VersionedTable.commit(left, s"$cdir/l", append = false)
    graft.sinks.VersionedTable.commit(right, s"$cdir/r", append = false)
    val viaCat = spark.sql("SELECT COUNT(rtag) FROM asof_join(" +
      s"'graft.`$cdir/l`', 'graft.`$cdir/r`', 'k', 't', 'rk', 'rt')")
      .head().getLong(0)
    assert(viaCat == 2L, "the TVF must resolve catalog tables too")
    // ...and takes INLINE relations via the standard TABLE(SELECT …)
    // argument syntax — the as-of composes over a filtered/derived
    // relation with no temp-view hop (mixing TABLE and name args is fine)
    val inline = spark.sql("SELECT ltag, rtag FROM asof_join(" +
      "TABLE(SELECT * FROM asof_tvf_l WHERE k = 1), " +
      "TABLE(SELECT * FROM asof_tvf_r WHERE rt < 10), " +
      "'k', 't', 'rk', 'rt')")
    assert(inline.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "TABLE-arg expansion must plan through AsOfJoinExec")
    assert(inline.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap ==
      Map("l1" -> "r1", "l2" -> "r1"),
      "filtered TABLE args must drive the same as-of semantics")
    val mixed = spark.sql("SELECT COUNT(rtag) FROM asof_join(" +
      "TABLE(SELECT * FROM asof_tvf_l), 'asof_tvf_r', " +
      "'k', 't', 'rk', 'rt')").head().getLong(0)
    assert(mixed == 2L)
    // a PARTITION BY-decorated TABLE argument refuses: the as-of defines
    // its own per-key ordering
    assert(scala.util.Try(spark.sql("SELECT * FROM asof_join(" +
      "TABLE(SELECT * FROM asof_tvf_l) PARTITION BY k, 'asof_tvf_r', " +
      "'k', 't', 'rk', 'rt')").collect()).isFailure,
      "PARTITION BY on a TABLE argument must refuse")
    for (bad <- Seq(
        "SELECT * FROM asof_join('asof_tvf_l', 'asof_tvf_r', 'k', 't', " +
          "'rk', 'rt', 'sideways')",
        "SELECT * FROM asof_join('asof_tvf_l', 'asof_tvf_r', 'k', 't', " +
          "'rk')",
        "SELECT * FROM asof_join(asof_tvf_l, 'asof_tvf_r', 'k', 't', " +
          "'rk', 'rt')")) {
      assert(scala.util.Try(spark.sql(bad).collect()).isFailure,
        s"expected refusal: $bad")
    }
  }

  test("forward variant: earliest at-or-after match, nulls when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"), // next right at 11:00
      (1L, ts("2024-01-01 12:00:00"), "l2"), // equal ts -> matches (≥)
      (2L, ts("2024-01-01 11:00:00"), "l3"), // after the only right for key 2
      (3L, ts("2024-01-01 09:00:00"), "l4")  // key with no right rows at all
    ).toDF("k", "t", "ltag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "r1"),
      (1L, ts("2024-01-01 11:00:00"), "r2"),
      (1L, ts("2024-01-01 12:00:00"), "r3"),
      (2L, ts("2024-01-01 10:00:00"), "r4")
    ).toDF("rk", "rt", "rtag")
    val got = AsOf.joinForward(left, right, "k", "t", "rk", "rt")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("l1" -> "r2", "l2" -> "r3", "l3" -> null, "l4" -> null))
    // the helper negation columns must not leak into the output
    val cols = AsOf.joinForward(left, right, "k", "t", "rk", "rt").columns
    assert(!cols.exists(_.startsWith("__asof_fwd")))
  }

  test("forward variant on integral ts (long key path)") {
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b")).toDF("k", "t", "ltag")
    val right = Seq((1L, 99L, "r0"), (1L, 200L, "r1"), (1L, 300L, "r2"))
      .toDF("rk", "rt", "rtag")
    val got = AsOf.joinForward(left, right, "k", "t", "rk", "rt")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "r1", "b" -> "r2"))
  }

  test("forward variant keeps ts width families, so unit mismatches still fail at planning") {
    // int days vs long micros: the backward join rejects this pair; the
    // forward reduction must NOT erase that check with a blanket long cast
    val left = Seq((1, 19700, "a")).toDF("k", "t", "ltag")    // days-like int
    val right = Seq((1, 1700000000000000L, "r")).toDF("rk", "rt", "rtag")
    val ex = intercept[Exception] {
      AsOf.joinForward(left, right, "k", "t", "rk", "rt").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("disagree on time unit")), ex.toString)
  }

  test("forward variant rejects TIMESTAMP_NTZ with a clear error (no silent tz reinterpretation)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "a")).toDF("k", "t", "ltag")
      .withColumn("t", col("t").cast("timestamp_ntz"))
    val right = Seq((1L, ts("2024-01-01 11:00:00"), "r")).toDF("rk", "rt", "rtag")
      .withColumn("rt", col("rt").cast("timestamp_ntz"))
    val ex = intercept[IllegalArgumentException] {
      AsOf.joinForward(left, right, "k", "t", "rk", "rt")
    }
    assert(ex.getMessage.contains("TIMESTAMP_NTZ"))
  }

  test("forward variant on DATE ts stays in the days family") {
    val d = java.sql.Date.valueOf(_: String)
    val left = Seq((1L, d("2024-01-10"), "a")).toDF("k", "t", "ltag")
    val right = Seq((1L, d("2024-01-09"), "r0"), (1L, d("2024-01-12"), "r1"))
      .toDF("rk", "rt", "rtag")
    val got = AsOf.joinForward(left, right, "k", "t", "rk", "rt")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "r1"))
  }

  test("NULL keys and timestamps match nothing (SQL semantics)") {
    val left = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00")), "valid"),
      (Option.empty[Long], Option(ts("2024-01-01 10:00:00")), "null_key"),
      (Option(1L), Option.empty[java.sql.Timestamp], "null_ts")
    ).toDF("k", "t", "ltag")
    val right = Seq(
      (Option(1L), Option(ts("2024-01-01 09:00:00")), "r1"),
      (Option.empty[Long], Option(ts("2024-01-01 09:00:00")), "r_nullkey")
    ).toDF("rk", "rt", "rtag")
    val got = AsOf.join(left, right, "k", "t", "rk", "rt")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("valid" -> "r1", "null_key" -> null, "null_ts" -> null))
  }

  test("matches the window-function reference implementation on events") {
    val got = AsOf.qAsofJoin(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSeq.sortBy(_._1)

    // reference: union + last_value over time window (the composed-builtins
    // equivalent the custom operator replaces)
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", lit(null: java.lang.Long).as("sid"))
    val signups = ev.filter($"event_type" === "signup")
      .groupBy($"user_id", $"ts").agg(min($"event_id").as("sig"))
      .select($"user_id", lit(-1L).as("event_id"), $"ts", $"sig".as("sid"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"sid".asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = purchases.unionByName(signups)
      .withColumn("latest_sig", last($"sid", ignoreNulls = true).over(w))
      .filter($"event_id" =!= -1L)
      .select($"event_id", $"latest_sig")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("survives multi-partition co-partitioning (same result at 1 and 7 partitions)") {
    val ev = Tables.events(spark, sf)
    val p1 = AsOf.qAsofJoin(spark, sf).collect().toSeq
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts").repartition(7)
    val signups = ev.filter($"event_type" === "signup")
      .groupBy($"user_id".as("s_user_id"), $"ts".as("s_ts"))
      .agg(min($"event_id").as("signup_event_id")).repartition(3)
    val p7 = AsOf.join(purchases, signups, "user_id", "ts", "s_user_id", "s_ts")
      .select($"event_id", $"user_id", $"signup_event_id")
      .orderBy($"event_id").collect().toSeq
    assert(p1 == p7)
  }

  test("widened types: int keys and date timestamps merge correctly") {
    val left = Seq((1, java.sql.Date.valueOf("2024-01-10"), "l1"),
      (2, java.sql.Date.valueOf("2024-01-05"), "l2"))
      .toDF("k", "d", "ltag")
    val right = Seq((1, java.sql.Date.valueOf("2024-01-08"), "r1"),
      (2, java.sql.Date.valueOf("2024-01-06"), "r2"))
      .toDF("rk", "rd", "rtag")
    val got = AsOf.join(left, right, "k", "d", "rk", "rd")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("l1" -> "r1", "l2" -> null))
  }

  test("unsupported column types fail at planning with a clear error") {
    val left = Seq(("a", 1L, "l1")).toDF("k", "t", "ltag")
    val right = Seq(("a", 1L, "r1")).toDF("rk", "rt", "rtag")
    val err = intercept[Exception] {
      AsOf.join(left, right, "k", "t", "rk", "rt").collect()
    }
    assert(err.getMessage.contains("unsupported type"), err.getMessage)
  }

  test("mixed int/long key widths fail at planning (they hash-partition differently)") {
    val left = Seq((1, 10L, "l1")).toDF("k", "t", "ltag")
    val right = Seq((1L, 8L, "r1")).toDF("rk", "rt", "rtag")
    val err = intercept[Exception] {
      AsOf.join(left, right, "k", "t", "rk", "rt").collect()
    }
    assert(err.getMessage.contains("disagree on width family"), err.getMessage)
  }

  test("mixed day/micros time units fail at planning, not compare wrong") {
    val left = Seq((1L, ts("2024-01-10 00:00:00"), "l1")).toDF("k", "t", "ltag")
    val right = Seq((1L, java.sql.Date.valueOf("2024-01-08"), "r1"))
      .toDF("rk", "rd", "rtag")
    val err = intercept[Exception] {
      AsOf.join(left, right, "k", "t", "rk", "rd").collect()
    }
    assert(err.getMessage.contains("disagree on time unit"), err.getMessage)
  }

  test("plans the custom exec with one shuffle per side, no join explosion") {
    val plan = AsOf.qAsofJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      plan)
  }
}
