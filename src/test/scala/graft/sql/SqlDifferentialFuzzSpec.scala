package graft.sql

import java.nio.file.{Files, Paths}
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import scala.util.Random

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Random DIFFERENTIAL SQL fuzzer vs DuckDB — SQLancer-style, but with
  * a real oracle: the SQL front door accepts arbitrary SELECTs over
  * graft tables, while the driver's correctness gate replays only the
  * 168 FIXED queries; this spec certifies the ad-hoc door. Seeded
  * random queries (projection / filter / aggregate / join / set-op /
  * scalar subquery / EXISTS / window) are generated over the sf0.001
  * tables LANDED AS GRAFT TABLES — so every query runs through the
  * catalog scan (pruning, pushdown, stats substitution) — plus one
  * EVOLVED graft table (add-with-default, rename, DELETE, UPDATE)
  * whose expected content is modeled independently and handed to
  * DuckDB as a parquet twin. DuckDB runs the SAME SQL text over the
  * same content; results compare as normalized sorted multisets.
  *
  * Dialect discipline keeps the differential honest: every emitted
  * query is ANSI both engines accept, double aggregates are wrapped in
  * ROUND(.., 3) (a raw double SUM is order-dependent at ~1e-12 — a
  * mismatch there would be noise, not a bug), and normalization snaps
  * doubles to 6 decimals. One-sided execution errors are recorded and
  * bounded, not silently skipped: a generator drifting into
  * Spark-only SQL would otherwise hollow the fuzzer out.
  *
  * 60 seeded queries per CI run; certification runs
  * GRAFT_SQLFUZZ_QS=500. Requires python3+duckdb (present on the
  * round driver); cancels, loudly, when unavailable.
  */
class SqlDifferentialFuzzSpec extends SparkSpec {
  import spark.implicits._

  private lazy val duckdbAvailable: Boolean =
    scala.util.Try(scala.sys.process.Process(
      Seq("python3", "-c", "import duckdb")).! == 0).getOrElse(false)

  // ---- schema catalog for the generator ----------------------------

  private case class Col(name: String, kind: String) // long int double string ts
  private case class Tbl(name: String, cols: Seq[Col], unique: Seq[String]) {
    def byKind(k: String): Seq[Col] = cols.filter(_.kind == k)
    def groupable: Seq[Col] = cols.filter(c =>
      c.kind == "string" || c.kind == "int")
    def numeric: Seq[Col] = cols.filter(c =>
      c.kind == "long" || c.kind == "int" || c.kind == "double")
  }

  private val lineitem = Tbl("lineitem", Seq(
    Col("l_orderkey", "long"), Col("l_partkey", "long"),
    Col("l_suppkey", "long"), Col("l_linenumber", "int"),
    Col("l_quantity", "double"), Col("l_extendedprice", "double"),
    Col("l_discount", "double"), Col("l_tax", "double"),
    Col("l_returnflag", "string"), Col("l_linestatus", "string"),
    Col("l_shipdate", "ts")), Seq("l_orderkey", "l_linenumber"))
  private val orders = Tbl("orders", Seq(
    Col("o_orderkey", "long"), Col("o_custkey", "long"),
    Col("o_orderstatus", "string"), Col("o_totalprice", "double"),
    Col("o_orderdate", "ts"), Col("o_orderpriority", "string")),
    Seq("o_orderkey"))
  private val customer = Tbl("customer", Seq(
    Col("c_custkey", "long"), Col("c_name", "string"),
    Col("c_nationkey", "int"), Col("c_acctbal", "double"),
    Col("c_mktsegment", "string")), Seq("c_custkey"))
  private val nation = Tbl("nation", Seq(
    Col("n_nationkey", "int"), Col("n_name", "string"),
    Col("n_regionkey", "int")), Seq("n_nationkey"))
  private val region = Tbl("region", Seq(
    Col("r_regionkey", "int"), Col("r_name", "string")),
    Seq("r_regionkey"))
  private val evt = Tbl("evt", Seq(
    Col("id", "long"), Col("val2", "double"), Col("k", "string"),
    Col("rh", "int")), Seq("id"))
  /** Hidden-partitioned copy of lineitem (days(l_shipdate)): every
    * fuzz query over it rides the manifest partition-pruning path, so
    * a pruning bug that DROPS a file (the superset guarantee broken)
    * diffs against DuckDB's full scan. Never co-appears with lineitem
    * in one query (same column names would be ambiguous), so it gets
    * its own join pair instead of riding lineitem's. */
  private val lineitemP = lineitem.copy(name = "lineitem_p")

  private val tables =
    Seq(lineitem, orders, customer, nation, region, evt, lineitemP)

  /** (left, right, on-condition); columns are globally unique so the
    * same unqualified SQL resolves on both engines. */
  private val joins = Seq(
    (lineitem, orders, "l_orderkey = o_orderkey"),
    (lineitemP, orders, "l_orderkey = o_orderkey"),
    (orders, customer, "o_custkey = c_custkey"),
    (customer, nation, "c_nationkey = n_nationkey"),
    (nation, region, "n_regionkey = r_regionkey"))
  private val threeWay = Seq(
    (customer, nation, region,
      "c_nationkey = n_nationkey", "n_regionkey = r_regionkey"),
    (lineitem, orders, customer,
      "l_orderkey = o_orderkey", "o_custkey = c_custkey"))

  // ---- fixture: graft tables + the evolved twin ---------------------

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  private lazy val fixture: (Map[String, String],
      Map[String, Map[String, Seq[String]]]) = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    val root = tmpDir("sqlfuzz")
    val duckViews = scala.collection.mutable.Map[String, String]()
    // plain tables: CTAS from the driver parquet — the graft table's
    // rows are the parquet's rows, so DuckDB reads the source directly
    for (t <- Seq("lineitem", "orders", "customer", "nation", "region")) {
      val dir = s"$root/$t"
      spark.sql(s"CREATE TABLE graft.`$dir` AS " +
        s"SELECT * FROM parquet.`$sf/$t.parquet`")
      spark.table(s"graft.`$dir`").createOrReplaceTempView(t)
      duckViews(t) = s"$sf/$t.parquet"
    }
    // the evolved table: defaults + rename + DML through the engine;
    // the twin models the SERVED rows independently
    val eDir = s"$root/evt"
    spark.sql(s"CREATE TABLE graft.`$eDir` (id BIGINT, v DOUBLE, k STRING)")
    val first = (1 to 40).map(i => (i.toLong, i * 1.5, s"k${i % 5}"))
    spark.createDataFrame(first).toDF("id", "v", "k")
      .createOrReplaceTempView("evt_seed1")
    spark.sql(s"INSERT INTO graft.`$eDir` SELECT * FROM evt_seed1")
    spark.sql(s"ALTER TABLE graft.`$eDir` ADD COLUMNS (rh INT DEFAULT 55)")
    spark.sql(s"ALTER TABLE graft.`$eDir` RENAME COLUMN v TO val2")
    val second = (41 to 60).map(i => (i.toLong, i * 1.5, s"k${i % 5}", i % 7))
    spark.createDataFrame(second).toDF("id", "val2", "k", "rh")
      .createOrReplaceTempView("evt_seed2")
    spark.sql(s"INSERT INTO graft.`$eDir` SELECT * FROM evt_seed2")
    spark.sql(s"DELETE FROM graft.`$eDir` WHERE id % 10 = 3")
    spark.sql(s"UPDATE graft.`$eDir` SET val2 = val2 + 100 WHERE id % 10 = 4")
    // catalog reads refuse merge-on-read delete debt by contract:
    // compaction materializes the vectors before the fuzz queries run
    spark.sql(s"CALL graft.compact('$eDir', ${128L * 1024 * 1024})")
    spark.table(s"graft.`$eDir`").createOrReplaceTempView("evt")
    // the hidden-partitioned copy: same rows, pruning-active scan path
    val pDir = s"$root/lineitem_p"
    spark.sql(s"CREATE TABLE graft.`$pDir` (l_orderkey BIGINT, " +
      "l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INT, " +
      "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, " +
      "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, " +
      "l_shipdate TIMESTAMP) PARTITIONED BY (days(l_shipdate)) " +
      "TBLPROPERTIES ('files' = '4')")
    spark.sql(s"INSERT INTO graft.`$pDir` " +
      s"SELECT * FROM parquet.`$sf/lineitem.parquet`")
    spark.table(s"graft.`$pDir`").createOrReplaceTempView("lineitem_p")
    duckViews("lineitem_p") = s"$sf/lineitem.parquet"
    // independent model of the served rows
    val twin = ((1 to 40).map(i => (i.toLong, i * 1.5, s"k${i % 5}", 55)) ++
        (41 to 60).map(i => (i.toLong, i * 1.5, s"k${i % 5}", i % 7)))
      .filterNot(_._1 % 10 == 3)
      .map { case (id, v, k, rh) =>
        (id, if (id % 10 == 4) v + 100 else v, k, rh) }
    val twinDir = s"$root/evt_twin"
    spark.createDataFrame(twin).toDF("id", "val2", "k", "rh")
      .write.parquet(twinDir)
    duckViews("evt") = twinDir
    // fixture invariant: the hand model IS what the engine serves
    val servedE = spark.table("evt").collect().map(normalizeRow).sorted
    val twinE = spark.read.parquet(twinDir).collect()
      .map(normalizeRow).sorted
    assert(servedE.toSeq == twinE.toSeq,
      "the evolved-table twin diverged from the engine's served rows")
    // literal samples per table/column, drawn from actual data
    val samples = tables.map { t =>
      t.name -> t.cols.map { c =>
        val vs = spark.table(t.name).select(c.name).distinct().limit(8)
          .collect().map(r => renderLiteral(r.get(0), c.kind)).toSeq
        c.name -> vs
      }.toMap
    }.toMap
    (duckViews.toMap, samples)
  }

  private def renderLiteral(v: Any, kind: String): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp =>
      "TIMESTAMP '" +
        t.toInstant.atZone(ZoneOffset.UTC).toLocalDateTime.format(tsFmt) +
        "'"
    case ldt: java.time.LocalDateTime => // NTZ-read parquet timestamps
      s"TIMESTAMP '${ldt.format(tsFmt)}'"
    case d: Double => if (d == d.floor && math.abs(d) < 1e15)
      f"$d%.1f" else d.toString
    case other => other.toString
  }

  // ---- normalization -------------------------------------------------

  private def normVal(v: Any): String = v match {
    case null => "∅"
    case d: Double =>
      if (d.isNaN || d.isInfinite) d.toString
      else java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_EVEN)
        .stripTrailingZeros.toPlainString
    case f: Float => normVal(f.toDouble)
    case bd: java.math.BigDecimal =>
      bd.setScale(6, java.math.RoundingMode.HALF_EVEN)
        .stripTrailingZeros.toPlainString
    case bd: BigDecimal => normVal(bd.bigDecimal)
    case t: java.sql.Timestamp =>
      t.toInstant.atZone(ZoneOffset.UTC).toLocalDateTime.toString
    case ldt: java.time.LocalDateTime => ldt.toString
    case other => other.toString
  }

  private def normalizeRow(r: Row): String =
    (0 until r.length).map(i => normVal(r.get(i))).mkString("")

  // ---- the generator ---------------------------------------------------

  private class Gen(rng: Random, samples: Map[String, Map[String, Seq[String]]]) {
    private def pick[A](xs: Seq[A]): A = xs(rng.nextInt(xs.length))
    private def lit(t: Tbl, c: Col): String = {
      val vs = samples(t.name)(c.name).filterNot(_ == "NULL")
      if (vs.isEmpty) "0" else pick(vs)
    }

    private def predicate(t: Tbl): String = {
      val c = pick(t.cols)
      c.kind match {
        case "string" => rng.nextInt(3) match {
          case 0 => s"${c.name} = ${lit(t, c)}"
          case 1 =>
            val in = (0 until 1 + rng.nextInt(3)).map(_ => lit(t, c))
              .distinct.mkString(", ")
            s"${c.name} IN ($in)"
          case _ =>
            val raw = lit(t, c).stripPrefix("'").stripSuffix("'")
            val pre = raw.take(1 + rng.nextInt(math.max(1, raw.length)))
              .replace("%", "").replace("_", "").replace("'", "''")
            s"${c.name} LIKE '$pre%'"
        }
        case "ts" =>
          if (rng.nextBoolean()) s"${c.name} >= ${lit(t, c)}"
          else s"${c.name} < ${lit(t, c)}"
        case "double" =>
          val op = pick(Seq("<", "<=", ">", ">="))
          s"${c.name} $op ${lit(t, c)}"
        case _ => rng.nextInt(3) match {
          case 0 => s"${c.name} = ${lit(t, c)}"
          case 1 =>
            val a = lit(t, c); val b = lit(t, c)
            val (lo, hi) =
              if (scala.util.Try(a.toDouble <= b.toDouble)
                .getOrElse(true)) (a, b) else (b, a)
            s"${c.name} BETWEEN $lo AND $hi"
          case _ =>
            val op = pick(Seq("<", "<=", ">", ">=", "<>"))
            s"${c.name} $op ${lit(t, c)}"
        }
      }
    }

    private def where(ts: Seq[Tbl]): String = {
      val n = 1 + rng.nextInt(3)
      val preds = (0 until n).map(_ => predicate(pick(ts)))
      if (preds.length == 1) preds.head
      else preds.map(p => s"($p)")
        .mkString(if (rng.nextBoolean()) " AND " else " OR ")
    }

    private def measure(ts: Seq[Tbl], i: Int): String = {
      val t = pick(ts)
      rng.nextInt(7) match {
        case 0 => s"COUNT(*) AS a$i"
        case 1 => s"COUNT(${pick(t.cols).name}) AS a$i"
        case 2 => s"MIN(${pick(t.cols).name}) AS a$i"
        case 3 => s"MAX(${pick(t.cols).name}) AS a$i"
        case 4 => s"COUNT(DISTINCT ${pick(t.cols).name}) AS a$i"
        case 5 => s"SUM(CASE WHEN ${predicate(t)} THEN 1 ELSE 0 END) AS a$i"
        case _ =>
          val nc = pick(t.numeric)
          if (nc.kind == "double") s"ROUND(SUM(${nc.name}), 3) AS a$i"
          else s"SUM(${nc.name}) AS a$i"
      }
    }

    def next(): String = rng.nextInt(8) match {
      case 0 => // projection, optionally top-N. The synthetic data's
        // "unique" columns are NOT true keys (sf0.001 lineitem: 6000
        // rows, 4599 distinct (l_orderkey, l_linenumber) pairs), so a
        // LIMIT cut is only engine-independent under an order over
        // EVERY projected column: boundary ties are then fully
        // identical output rows and either engine's pick yields the
        // same multiset.
        val t = pick(tables)
        val extra = pick(t.cols)
        val cols = (t.unique :+ extra.name).distinct
        val sel = cols.zipWithIndex
          .map { case (c, i) => s"$c AS a$i" }.mkString(", ")
        val base = s"SELECT $sel FROM ${t.name} WHERE ${where(Seq(t))}"
        if (rng.nextBoolean())
          s"$base ORDER BY ${cols.indices.map(i => s"a$i").mkString(", ")} " +
            "LIMIT 200"
        else base
      case 1 => // single-table aggregate
        val t = pick(tables)
        val keys = rng.shuffle(t.groupable).take(1 + rng.nextInt(2))
          .map(_.name)
        val keySel = keys.zipWithIndex
          .map { case (k, i) => s"$k AS k$i" }.mkString(", ")
        val ms = (0 until 1 + rng.nextInt(3)).map(i => measure(Seq(t), i))
          .mkString(", ")
        val having = if (rng.nextBoolean()) " HAVING COUNT(*) >= 2" else ""
        s"SELECT $keySel, $ms FROM ${t.name} WHERE ${where(Seq(t))} " +
          s"GROUP BY ${keys.mkString(", ")}$having"
      case 2 => // two-table join + aggregate (inner or left outer)
        val (a, b, on) = pick(joins)
        val jt = pick(Seq("JOIN", "JOIN", "LEFT JOIN"))
        val key = pick(a.groupable ++ b.groupable).name
        val ms = (0 until 1 + rng.nextInt(2)).map(i => measure(Seq(a, b), i))
          .mkString(", ")
        // a LEFT JOIN's predicate stays on the LEFT side: a right-side
        // filter would be a well-defined query too, but the common
        // intent (and the pushdown-interesting shape) is preserved rows
        val w = if (jt == "LEFT JOIN") where(Seq(a)) else where(Seq(a, b))
        s"SELECT $key AS k0, $ms FROM ${a.name} $jt ${b.name} ON $on " +
          s"WHERE $w GROUP BY $key"
      case 3 => // three-table join + aggregate
        val (a, b, c, on1, on2) = pick(threeWay)
        val key = pick(c.groupable ++ b.groupable).name
        val ms = measure(Seq(a, b, c), 0)
        s"SELECT $key AS k0, $ms FROM ${a.name} " +
          s"JOIN ${b.name} ON $on1 JOIN ${c.name} ON $on2 " +
          s"WHERE ${where(Seq(a))} GROUP BY $key"
      case 4 => // set operation over one table's exact-typed projection
        val t = pick(tables)
        val cols = rng.shuffle(t.cols.filterNot(_.kind == "double"))
          .take(1 + rng.nextInt(2)).map(_.name)
        val sel = cols.zipWithIndex
          .map { case (c, i) => s"$c AS a$i" }.mkString(", ")
        val op = pick(Seq("UNION ALL", "UNION", "INTERSECT", "EXCEPT"))
        s"SELECT $sel FROM ${t.name} WHERE ${where(Seq(t))} $op " +
          s"SELECT $sel FROM ${t.name} WHERE ${where(Seq(t))}"
      case 5 => // scalar subquery in the predicate (NULL-on-empty: both
        // engines agree `x > NULL` selects nothing)
        val t = pick(tables)
        val nc = pick(t.numeric.filterNot(_.kind == "double"))
        val agg = pick(Seq("MIN", "MAX"))
        val sel = t.unique.zipWithIndex
          .map { case (c, i) => s"$c AS a$i" }.mkString(", ")
        s"SELECT $sel FROM ${t.name} WHERE ${nc.name} > " +
          s"(SELECT $agg(${nc.name}) FROM ${t.name} " +
          s"WHERE ${where(Seq(t))})"
      case 6 => // correlated EXISTS
        val pred = where(Seq(lineitem))
        s"SELECT o_orderstatus AS k0, COUNT(*) AS a0 FROM orders " +
          s"WHERE EXISTS (SELECT 1 FROM lineitem " +
          s"WHERE l_orderkey = o_orderkey AND ($pred)) " +
          s"GROUP BY o_orderstatus"
      case _ => // ranking window under a total order
        val t = pick(tables)
        val key = pick(t.groupable).name
        val fn = pick(Seq("ROW_NUMBER()", "RANK()"))
        val uk = t.unique.mkString(", ")
        val sel = (Seq(key) ++ t.unique).distinct.zipWithIndex
          .map { case (c, i) => s"$c AS a$i" }.mkString(", ")
        s"SELECT * FROM (SELECT $sel, $fn OVER " +
          s"(PARTITION BY $key ORDER BY $uk) AS rnk FROM ${t.name} " +
          s"WHERE ${where(Seq(t))}) q WHERE rnk <= 5"
    }
  }

  // ---- the run ---------------------------------------------------------

  private val Queries =
    sys.env.get("GRAFT_SQLFUZZ_QS").map(_.toInt).getOrElse(60)

  test(s"random differential SQL vs DuckDB through the catalog door " +
      s"($Queries queries)") {
    assume(duckdbAvailable, "python3+duckdb not available")
    val (views, samples) = fixture
    val baseSeed = 77001L
    val gen = new Gen(new Random(baseSeed), samples)
    val queries = (0 until Queries).map(i => s"q$i" -> gen.next())
    info(s"generator seed=$baseSeed queries=$Queries")
    // hand the batch to DuckDB
    val work = tmpDir("sqlfuzz-out")
    Files.write(Paths.get(s"$work/views.json"),
      ("{" + views.map { case (k, v) => s""""$k": "$v"""" }
        .mkString(", ") + "}").getBytes("UTF-8"))
    Files.write(Paths.get(s"$work/queries.json"),
      ("[" + queries.map { case (n, q) =>
        s"""{"name": "$n", "sql": ${jsonStr(q)}}"""
      }.mkString(",\n") + "]").getBytes("UTF-8"))
    val rc = scala.sys.process.Process(Seq("python3",
      "tools/duckdb_fuzz_oracle.py", s"$work/views.json",
      s"$work/queries.json", s"$work/duck"),
      new java.io.File("/root/repo")).!
    assert(rc == 0, "duckdb oracle bridge failed")
    val manifest = new String(Files.readAllBytes(
      Paths.get(s"$work/duck/manifest.json")), "UTF-8")
    def duckOk(n: String): Boolean =
      manifest.contains(s""""$n": {"status": "ok"}""") ||
        """"%s":\s*\{\s*"status":\s*"ok"""".format(n).r
          .findFirstIn(manifest).isDefined
    var mismatches = List.empty[String]
    var oneSided = List.empty[String]
    var bothFailed = 0
    for ((n, q) <- queries) {
      val sparkRes = scala.util.Try(
        spark.sql(q).collect().map(normalizeRow).sorted.toSeq)
      (sparkRes.isSuccess, duckOk(n)) match {
        case (true, true) =>
          val duckRes = spark.read.parquet(s"$work/duck/$n.parquet")
            .collect().map(normalizeRow).sorted.toSeq
          if (sparkRes.get != duckRes) {
            mismatches ::= s"$n: $q\n  spark=${sparkRes.get.take(5)}" +
              s" (${sparkRes.get.length} rows)\n  duck =${duckRes.take(5)}" +
              s" (${duckRes.length} rows)"
          }
        case (true, false) | (false, true) =>
          oneSided ::= s"$n (sparkOk=${sparkRes.isSuccess}): $q" +
            sparkRes.failed.toOption.map(t =>
              s"\n  ${t.getMessage.linesIterator.take(2).mkString(" ")}")
              .getOrElse("")
        case _ =>
          bothFailed += 1
          info(s"BOTH-FAILED $n: $q\n  spark: " +
            sparkRes.failed.toOption.map(
              _.getMessage.linesIterator.take(2).mkString(" ")).getOrElse(""))
      }
    }
    info(s"one-sided errors: ${oneSided.length}, both-failed: $bothFailed")
    oneSided.take(10).foreach(s => info(s"ONE-SIDED $s"))
    assert(mismatches.isEmpty,
      s"${mismatches.length} DIFFERENTIAL MISMATCH(ES):\n" +
        mismatches.take(5).mkString("\n\n"))
    assert(oneSided.length <= math.max(2, Queries / 10),
      s"too many one-sided errors (${oneSided.length}/$Queries) — the " +
        "generator is drifting out of the common dialect:\n" +
        oneSided.take(10).mkString("\n"))
    assert(bothFailed <= Queries / 10,
      s"too many generator duds ($bothFailed/$Queries)")
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n") + "\""
}
