package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot groups: cross-table snapshots whose advance is one atomic
  * file create — group readers never observe a partial multi-table
  * transaction, losers conflict loudly, and group pins ride the tag
  * machinery so member-table GC cannot reclaim served history. */
class SnapshotGroupSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable
  private val grp = SnapshotGroup

  /** accounts + ledger with a cross-table invariant: total balance 100. */
  private def fixture(prefix: String): (String, String, String) = {
    val root = tmpDir(prefix)
    val acc = s"$root/accounts"
    val led = s"$root/ledger"
    ops.commit(Seq((1L, 60.0), (2L, 40.0)).toDF("acct", "balance"), acc)
    ops.commit(Seq((0L, 0L, 0L, 0.0)).toDF("txn", "from", "to", "amount"),
      led)
    val g = s"$root/grp"
    grp.create(g, Map("accounts" -> acc, "ledger" -> led))
    (g, acc, led)
  }

  /** One transfer as a multi-table transaction: rewrite balances +
    * append the ledger row, then advance the group atomically. */
  private def transfer(g: String, acc: String, led: String, txn: Long,
                       from: Long, to: Long, amt: Double): Int =
    grp.commit(g) { dirs =>
      val cur = grp.read(spark, g, "accounts")
      val next = cur.withColumn("balance",
        when(col("acct") === from, col("balance") - amt)
          .when(col("acct") === to, col("balance") + amt)
          .otherwise(col("balance")))
      val av = ops.commit(next, dirs("accounts"), append = false)
      val lv = ops.commit(Seq((txn, from, to, amt))
        .toDF("txn", "from", "to", "amount"), dirs("ledger"))
      Map("accounts" -> av, "ledger" -> lv)
    }

  test("group readers see all-or-nothing across member tables") {
    val (g, acc, led) = fixture("sg-atomic")
    // a table commit WITHOUT a group advance is invisible through the
    // group — the exact partial state a cross-table reader must not see
    ops.commit(Seq((3L, 999.0)).toDF("acct", "balance"), acc)
    assert(grp.read(spark, g, "accounts").count() == 2,
      "group read must serve the pinned snapshot, not the table head")
    val gv = transfer(g, acc, led, 1L, 1L, 2L, 25.0)
    assert(gv == 2)
    val bal = grp.read(spark, g, "accounts")
      .orderBy(col("acct")).collect().map(_.getDouble(1))
    // the pre-group stray commit appended acct 3; the overwrite inside
    // the transaction rewrote from the GROUP snapshot (2 accounts)
    assert(bal.toSeq == Seq(35.0, 65.0))
    assert(grp.read(spark, g, "ledger").count() == 2)
    // time travel: group v1 still serves the untouched pair
    assert(grp.read(spark, g, "accounts", Some(1)).count() == 2)
    assert(grp.read(spark, g, "ledger", Some(1)).count() == 1)
  }

  test("concurrent group transactions: one wins, the loser conflicts loudly") {
    val (g, acc, led) = fixture("sg-occ")
    // simulate interleaving: both read head 1; A publishes first
    val head = grp.versions(g).last
    val av = ops.commit(Seq((9L, 1.0)).toDF("acct", "balance"), acc)
    val lv = ops.commit(Seq((9L, 0L, 9L, 1.0))
      .toDF("txn", "from", "to", "amount"), led)
    assert(grp.commit(g)(_ => Map("accounts" -> av)) == head + 1)
    // B landed its table mutation against the old head and now pins
    val e = intercept[SnapshotShapeConflict] {
      SnapshotGroupTestHook.publishAt(g, head + 1, grp.members(g))
    }
    assert(e.getMessage.contains("advanced"))
    // the loser's ledger version is landed but unreferenced — group
    // still serves the winner's state
    assert(grp.memberOf(g, "ledger").version < lv)
  }

  test("group pins block member-table expire until group history expires") {
    val (g, acc, _) = fixture("sg-gc")
    (1 to 3).foreach(i => transfer(g, acc, "", i.toLong, 1L, 2L, 0.0))
    // accounts now has several versions; group v1..v4 pin them all
    val e = intercept[IllegalArgumentException] {
      ops.expire(acc, 1)
    }
    assert(e.getMessage.contains("tagged"),
      "member expire must refuse while a group version pins history")
    grp.expire(g, 1)
    ops.expire(acc, 1)
    assert(ops.versions(acc).size == 1)
    // the group head still serves: its pinned version is the retained one
    assert(grp.read(spark, g, "accounts").count() == 2)
  }

  test("SQL surface: #members view serves pins; group handles refuse writes") {
    val (g, acc, led) = fixture("sg-sql")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    val rows = spark.sql(s"SELECT * FROM graft.`$g#members` ORDER BY alias")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("accounts", "ledger"))
    assert(rows.map(_.getInt(2)).toSeq == Seq(1, 1))
    assert(spark.sql(s"SELECT * FROM graft.`$g#table=ledger`").count() == 1)
    // a group member handle is a read-only snapshot: writes refuse
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$g#table=ledger` " +
        "VALUES (5, 1, 2, 9.9)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("does not support") ||
      e.getMessage.contains("read-only"), e.getMessage)
    // an unknown alias refuses with the member inventory
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$g#table=nope`").collect()
    }
    assert(e2.getMessage.contains("nope"))
  }

  test("catalog hygiene: a group is not a table or namespace — SHOW " +
      "TABLES skips it, a bare-group SELECT refuses with the right " +
      "address, and DROP TABLE releases the member tag pins") {
    val wh = tmpDir("sg-wh")
    spark.conf.set("spark.sql.catalog.sgwh",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sgwh.warehouse", wh)
    spark.sql("CREATE NAMESPACE sgwh.db")
    val acc = s"$wh/db/accounts"
    ops.commit(Seq((1L, 60.0), (2L, 40.0)).toDF("acct", "balance"), acc)
    ops.commit(Seq((1L, 61.0), (2L, 39.0)).toDF("acct", "balance"), acc,
      append = false)
    val g = s"$wh/db/grp"
    grp.create(g, Map("accounts" -> acc))
    // a group dir carries manifests/vN but is NOT a table: its manifest
    // lines are pins, not parquet paths
    assert(spark.sql("SHOW TABLES IN sgwh.db").select("tableName")
      .collect().map(_.getString(0)).toSeq == Seq("accounts"))
    // ...and not a namespace either
    assert(spark.sql("SHOW NAMESPACES IN sgwh.db").count() == 0)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM sgwh.db.grp").collect()
    }
    assert(e.getMessage.contains("#table=") ||
      Option(e.getCause).exists(_.getMessage.contains("#table=")),
      s"bare-group SELECT must point at #table=/#members: ${e.getMessage}")
    // CTAS must not stomp the group
    intercept[Exception] {
      spark.sql("CREATE TABLE sgwh.db.grp AS SELECT 1 AS x").collect()
    }
    // the group's pin blocks member expire...
    grp.commit(g)(dirs => Map("accounts" ->
      ops.commit(Seq((1L, 62.0)).toDF("acct", "balance"), dirs("accounts"))))
    intercept[IllegalArgumentException] {
      ops.expire(acc, keepLast = 1)
    }
    // ...until DROP TABLE purges the group AND releases every pin
    assert(spark.sql("DROP TABLE sgwh.db.grp").collect().isEmpty)
    assert(!grp.isGroup(g))
    assert(ops.tags(acc).isEmpty, s"leaked group tags: ${ops.tags(acc)}")
    ops.expire(acc, keepLast = 1) // member GC reclaims freely now
    assert(spark.sql("SELECT count(*) FROM sgwh.db.accounts")
      .collect()(0).getLong(0) == 3L)
  }

  test("alias validation, non-member updates and unknown versions refuse") {
    val (g, acc, _) = fixture("sg-valid")
    intercept[IllegalArgumentException] {
      grp.commit(g)(_ => Map("nope" -> 1))
    }
    intercept[IllegalArgumentException] {
      grp.commit(g)(_ => Map("accounts" -> 999))
    }
    intercept[IllegalArgumentException] {
      grp.create(tmpDir("sg-valid2"), Map("bad alias!" -> acc))
    }
  }
}

/** Test-only access to the CAS loser path (publishing at a taken group
  * version) without racing real threads. */
private[sinks] object SnapshotGroupTestHook {
  def publishAt(g: String, gv: Int,
                pins: Seq[SnapshotGroup.Member]): Int = {
    val io = TableIO.local
    val lines = s"#ts=${System.currentTimeMillis()}" +:
      pins.map(m => s"${m.alias}\t${m.dir}\t${m.version}")
    if (!io.createExclusive(s"$g/manifests/v$gv", lines))
      throw new SnapshotShapeConflict(
        s"group $g advanced past v${gv - 1} during this transaction")
    gv
  }
}
