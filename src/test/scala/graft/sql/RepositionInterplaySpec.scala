package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VersionedTable

/** Adversarial interplay probes, round 3: the round-13 repositioning /
  * comment surface crossed with the feeds and views that consume the
  * declared schema. The r12/r13 twins of this spec caught four real
  * latent defects between features that were each individually green —
  * these probes ask the same cross-feature questions of FIRST/AFTER
  * repositioning (declared-order-only, zero files move) where a consumer
  * might bake in the OLD order: the keyed `#cdf=` feed across a
  * mid-range reposition, SHOW CREATE TABLE as a round-trippable record
  * of order + comments + defaults + NOT NULL, and the mview surface over
  * a renamed source column. */
class RepositionInterplaySpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable

  private def register(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  test("a #cdf= range spanning a mid-range FIRST reposition serves every " +
      "transition in the DECLARED (new) order with _commit_version " +
      "attached — declared-order change is presentation, the feed is not " +
      "allowed to shear columns") {
    register()
    val dir = tmpDir("rip-cdf") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, a STRING, b DOUBLE)")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "SET TBLPROPERTIES ('cdf.key' = 'id')")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 'x', 1.5)") // v1
    // mid-range: reposition b FIRST; files from v1 carry the old order
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN b FIRST")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (2.5, 3, 'y')") // v2, new order
    val feed = spark.sql(
      s"SELECT * FROM graft.`$dir#cdf=0..2` ORDER BY _commit_version, id")
    // declared order leads: b, id, a — then feed metadata
    val cols = feed.columns.toSeq
    assert(cols.take(3) == Seq("b", "id", "a"),
      s"feed must serve the DECLARED order: $cols")
    val rows = feed.collect()
    assert(rows.length == 2)
    // v1's transition: the pre-reposition file's bytes under the new
    // declared order — values must follow their columns, not positions
    assert(rows(0).getDouble(0) == 1.5 && rows(0).getLong(1) == 1L &&
      rows(0).getString(2) == "x", s"pre-reposition transition: ${rows(0)}")
    assert(rows(1).getDouble(0) == 2.5 && rows(1).getLong(1) == 3L &&
      rows(1).getString(2) == "y", s"post-reposition transition: ${rows(1)}")
    val vs = rows.map(_.getAs[Long]("_commit_version")).toSeq
    assert(vs == Seq(1L, 2L),
      s"_commit_version must survive the reposition: $vs")
    assert(rows.forall(_.getAs[String]("op") == "i"))
  }

  test("SHOW CREATE TABLE round-trips the full declared surface: a " +
      "CREATE from the emitted DDL reproduces order, comments, defaults " +
      "and NOT NULL exactly") {
    register()
    val dir = tmpDir("rip-sct") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT NOT NULL, v DOUBLE DEFAULT 1.5, k STRING)")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ALTER COLUMN k COMMENT 'partition key'")
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN k FIRST")
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$dir`")
      .collect().head.getString(0)
    // re-create from the EMITTED text at a fresh location
    val dir2 = tmpDir("rip-sct2") + "/t"
    spark.sql(ddl.replace(dir, dir2))
    val (s1, s2) =
      (spark.table(s"graft.`$dir`").schema,
        spark.table(s"graft.`$dir2`").schema)
    assert(s1.fieldNames.toSeq == Seq("k", "id", "v"))
    assert(s2.fieldNames.toSeq == s1.fieldNames.toSeq,
      s"order must round-trip: ${s2.fieldNames.toSeq}")
    s1.fields.zip(s2.fields).foreach { case (f1, f2) =>
      assert(f1.dataType == f2.dataType && f1.nullable == f2.nullable,
        s"type/nullability must round-trip for ${f1.name}")
      assert(f1.getComment() == f2.getComment(),
        s"comment must round-trip for ${f1.name}: " +
          s"${f2.getComment()} vs ${f1.getComment()}")
      assert(f1.metadata.contains("CURRENT_DEFAULT") ==
        f2.metadata.contains("CURRENT_DEFAULT"),
        s"default must round-trip for ${f1.name}")
    }
    // behavior, not just metadata: the re-created table enforces the
    // round-tripped declarations
    spark.sql(s"INSERT INTO graft.`$dir2` (k, id) VALUES ('a', 7)")
    val r = spark.sql(s"SELECT v FROM graft.`$dir2`").collect()
    assert(r.head.getDouble(0) == 1.5,
      "round-tripped DEFAULT must serve on the new table")
    val e = intercept[Exception] {
      // positional under the round-tripped declared order (k, id, v)
      spark.sql(s"INSERT INTO graft.`$dir2` VALUES " +
        "('b', CAST(NULL AS BIGINT), 2.0)")
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
  }

  test("SHOW CREATE TABLE round-trips the NESTED surface: element " +
      "renames, nested NOT NULL, nested COMMENT — and nested existence " +
      "defaults survive via the derived graft.nested.default.* " +
      "TBLPROPERTIES (found lost by this probe; CREATE reconstructs " +
      "them)") {
    register()
    val dir = tmpDir("rip-sct-nested") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, " +
      "main STRUCT<temp: DOUBLE, kind: STRING>, " +
      "weather ARRAY<STRUCT<cond: STRING>>)")
    spark.sql(s"INSERT INTO graft.`$dir` SELECT 1L, " +
      "named_struct('temp', 1.0, 'kind', 'a'), " +
      "array(named_struct('cond', 'x'))")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (main.rh INT DEFAULT 55)")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ADD COLUMNS (weather.element.q INT DEFAULT 7)")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "RENAME COLUMN weather.element.cond TO sky")
    spark.sql(s"CALL graft.set_not_null('$dir', 'main.temp')")
    spark.sql(s"ALTER TABLE graft.`$dir` " +
      "ALTER COLUMN main.kind COMMENT 'obs kind'")
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$dir`")
      .collect().head.getString(0)
    assert(ddl.contains("graft.nested.default.main.rh") &&
      ddl.contains("graft.nested.default.weather.element.q"),
      s"emitted DDL must carry the nested defaults: $ddl")
    val dir2 = tmpDir("rip-sct-nested2") + "/t"
    spark.sql(ddl.replace(dir, dir2))
    // structural round-trip: same members, nullability, comments, and
    // the SAME existence defaults in metadata
    def nd(d: String) = NestedDefaults.paths(
      spark.table(s"graft.`$d`").schema)
      .map { case (p, _, sql) => p.mkString(".") -> sql }.toMap
    assert(nd(dir2) == nd(dir), s"${nd(dir2)} vs ${nd(dir)}")
    val s2 = spark.table(s"graft.`$dir2`").schema
    val main2 = s2("main").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(!main2("temp").nullable, "nested NOT NULL must round-trip")
    assert(main2("kind").getComment().contains("obs kind"),
      "nested COMMENT must round-trip")
    // behavior: a whole-struct INSERT omitting nothing still works, and
    // the defaulted members enforce their append gate on the NEW table
    spark.sql(s"INSERT INTO graft.`$dir2` SELECT 2L, " +
      "named_struct('temp', 2.0, 'kind', 'b', 'rh', 60), " +
      "array(named_struct('sky', 'y', 'q', 9))")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir2` SELECT 3L, " +
        "named_struct('temp', 3.0, 'kind', 'c', " +
        "'rh', CAST(NULL AS INT)), " +
        "CAST(NULL AS ARRAY<STRUCT<sky: STRING, q: INT>>)")
    }
    assert(e.getMessage.contains("rh"), e.getMessage)
    // and the declaration is schema-derived, not a stored property: a
    // post-hoc SET refuses loudly
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir2` SET TBLPROPERTIES " +
        "('graft.nested.default.main.kind' = \"'z'\")")
    }
    assert(e2.getMessage.contains("derived"), e2.getMessage)
    // the STAGED door (CTAS) consumes the property the same way — an
    // RTAS-shaped re-creation keeps the declared default
    val dir3 = tmpDir("rip-sct-nested3") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir3` " +
      "TBLPROPERTIES ('graft.nested.default.main.rh' = '55') " +
      s"AS SELECT id, main FROM graft.`$dir2`")
    val nd3 = NestedDefaults.paths(spark.table(s"graft.`$dir3`").schema)
      .map { case (p, _, sql) => p.mkString(".") -> sql }.toMap
    assert(nd3 == Map("main.rh" -> "55"), s"CTAS must consume the " +
      s"nested-default property into the declaration: $nd3")
  }

  test("a checkpointed table stream restarted ACROSS a reposition " +
      "serves the delta under the new declared order with values bound " +
      "by NAME — no positional shear between runs") {
    register()
    val tmp = tmpDir("rip-stream")
    val dir = s"$tmp/t"; val ck = s"$tmp/ck"
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, a STRING, b DOUBLE)")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 'x', 1.5)")
    def drain(): Seq[(Long, String, Double)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, String, Double)]()
      val q = spark.readStream.format("graft-table").load(dir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id", "a", "b").collect().foreach(r =>
            got.add((r.getLong(0), r.getString(1), r.getDouble(2))))
          ()
        }
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.iterator().asScala.toSeq.sortBy(_._1)
    }
    assert(drain() == Seq((1L, "x", 1.5)))
    // reposition mid-stream-life, then land a post-reposition row in the
    // NEW positional order
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN b FIRST")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (2.5, 2, 'y')")
    assert(drain() == Seq((2L, "y", 2.5)),
      "the restarted run must bind values by NAME under the new order")
    assert(drain().isEmpty)
  }

  test("SHOW CREATE TABLE round-trips declared partitioning, the " +
      "per-landing file cap and CHECK constraints — the layout and " +
      "governance half of the DDL contract") {
    register()
    val dir = tmpDir("rip-sct-part") + "/t"
    spark.sql(s"CREATE TABLE graft.`$dir` " +
      "(id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts), bucket(4, id)) " +
      "TBLPROPERTIES ('files' = '3')")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD CONSTRAINT pos CHECK (v >= 0)")
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$dir`")
      .collect().head.getString(0)
    assert(ddl.contains("PARTITIONED BY") && ddl.contains("days(ts)") &&
      ddl.contains("bucket(4, id)"), ddl)
    assert(ddl.contains("CONSTRAINT pos CHECK"), ddl)
    assert(ddl.contains("'files'") || ddl.contains("files"),
      s"the per-landing file cap must ride the emitted DDL: $ddl")
    val dir2 = tmpDir("rip-sct-part2") + "/t"
    spark.sql(ddl.replace(dir, dir2))
    val ops2 = graft.sinks.VersionedTable
    assert(ops2.partitioningOf(dir2).map(_.spec) ==
      ops2.partitioningOf(dir).map(_.spec),
      "partitioning must round-trip")
    assert(ops2.partitioningNumFiles(dir2) == 3,
      s"the file cap must round-trip: got " +
        s"${ops2.partitioningNumFiles(dir2)}")
    assert(ops2.constraints(dir2) == Map("pos" -> "v >= 0"),
      s"constraints must round-trip: ${ops2.constraints(dir2)}")
    // the round-tripped constraint ENFORCES on the new table
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir2` VALUES " +
        "(1, TIMESTAMP '2024-01-01 00:00:00', -5.0)")
    }
    assert(e.getMessage.contains("pos") || e.getMessage.contains("CHECK"),
      e.getMessage)
  }

  test("RENAME of a grouped-on source column vs an attached mview: the " +
      "rewrite must never serve wrong answers under the new name — " +
      "either it still fires correctly or it falls back to the base scan") {
    register()
    val src = tmpDir("rip-mv-src")
    val view = tmpDir("rip-mv-view") + "/v"
    ops.commit((0 until 100).map(i => (i.toLong, s"t${i % 3}", i * 1.0))
      .toDF("id", "etype", "v"), src)
    Mview.createAggView(spark, src, view, "etype",
      "n=count(1);sum_v=sum(v)")
    // sanity: the fresh view answers the exact-group query
    val before = spark.sql(
      s"SELECT etype, count(*) AS n FROM graft.`$src` GROUP BY 1")
    assert(before.queryExecution.executedPlan.toString.contains(view))
    // rename the grouped-on column out from under the attached view
    spark.sql(s"ALTER TABLE graft.`$src` RENAME COLUMN etype TO kind")
    val after = spark.sql(
      s"SELECT kind, count(*) AS n, sum(v) AS s FROM graft.`$src` " +
        "GROUP BY 1")
    // reference through the CATALOG door (ops.read is the physical
    // protocol read — it serves stored names, and `kind`'s physical name
    // is forever `etype`)
    val direct = spark.table(s"graft.`$src`").groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    assert(after.collect().toSet == direct.collect().toSet,
      "post-rename grouped query must be CORRECT (rewrite or base scan)")
    // and a refresh after the rename must not silently corrupt the view:
    // it either succeeds (spec resolves the renamed column) or refuses
    // loudly; afterwards the grouped query STILL answers correctly
    try {
      spark.sql(s"CALL graft.refresh_view('$view')").collect()
    } catch { case e: Exception =>
      assert(e.getMessage != null && e.getMessage.nonEmpty)
    }
    assert(spark.sql(s"SELECT kind, count(*) AS n, sum(v) AS s " +
        s"FROM graft.`$src` GROUP BY 1").collect().toSet ==
      direct.collect().toSet,
      "grouped query must stay correct after a post-rename refresh attempt")
  }
}
