package graft.sql

import graft.SparkSpec
import graft.sinks.{HadoopTableIO, TableIO, VersionedTable}

/** The SQL front door over the HADOOP FileSystem backend — the shape a
  * real 100 TB landing runs (`spark.sql.catalog.graft.io=hadoop`). The
  * manifest protocol itself is proven backend-invariant by
  * HadoopVersionedTableSpec; this spec pins that the CATALOG layer
  * (DDL, constraint-gated INSERT, evolution, SHOW CREATE, reads) rides
  * the switched backend end to end. The backend is process-wide — the
  * spec restores the local default in a finally, so the rest of the
  * suite is untouched. */
class CatalogIoBackendSpec extends SparkSpec {

  test("CREATE / constraint-gated INSERT / RENAME / SELECT / SHOW " +
      "CREATE all run over the hadoop io backend") {
    val prev = VersionedTable.backend
    try {
      spark.conf.set("spark.sql.catalog.grafthio",
        classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.grafthio.io", "hadoop")
      val dir = tmpDir("cio") + "/t"
      spark.sql(s"CREATE TABLE grafthio.`$dir` (id BIGINT, v DOUBLE, " +
        "k STRING, CONSTRAINT pos CHECK (v >= 0))")
      assert(VersionedTable.backend.isInstanceOf[HadoopTableIO],
        "initializing the catalog must have switched the backend")
      spark.sql(s"INSERT INTO grafthio.`$dir` VALUES (1, 1.5, 'a'), " +
        "(2, 2.5, 'b')")
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO grafthio.`$dir` VALUES (3, -1.0, 'c')")
      }
      assert(e.getMessage.contains("pos") || e.getMessage.contains("CHECK"),
        e.getMessage)
      // rename the UNconstrained column (renaming a constraint-referenced
      // one refuses by design — a separate pinned contract)
      spark.sql(s"ALTER TABLE grafthio.`$dir` RENAME COLUMN k TO tag")
      val got = spark.table(s"grafthio.`$dir`").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
      assert(got == Seq((1L, 1.5, "a"), (2L, 2.5, "b")))
      assert(spark.table(s"grafthio.`$dir`").columns.toSeq
        == Seq("id", "v", "tag"))
      val ddl = spark.sql(s"SHOW CREATE TABLE grafthio.`$dir`")
        .collect().head.getString(0)
      assert(ddl.contains("CONSTRAINT pos CHECK"), ddl)
    } finally VersionedTable.setBackend(prev)
    assert(VersionedTable.backend eq prev,
      "the suite must leave the local backend restored")
  }

  test("the io binding is LATCHED per process: a second catalog naming " +
      "a DIFFERENT backend refuses instead of silently re-pointing " +
      "every table's metadata mid-session") {
    val prev = VersionedTable.backend
    try {
      spark.conf.set("spark.sql.catalog.graftioa",
        classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graftioa.io", "hadoop")
      val dir = tmpDir("cio-latch") + "/t"
      spark.sql(s"CREATE TABLE graftioa.`$dir` (id BIGINT)")
      assert(VersionedTable.backend.isInstanceOf[HadoopTableIO])
      // same kind: idempotent re-bind, no refusal
      spark.conf.set("spark.sql.catalog.graftiob",
        classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graftiob.io", "hadoop")
      spark.sql(s"CREATE TABLE graftiob.`${tmpDir("cio-latch-b")}/t` " +
        "(id BIGINT)")
      // conflicting kind: loud refusal, not last-writer-wins
      spark.conf.set("spark.sql.catalog.graftioc",
        classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graftioc.io", "local")
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE graftioc.`${tmpDir("cio-latch-c")}/t` " +
          "(id BIGINT)")
      }
      def msg(t: Throwable): String =
        t.getMessage + Option(t.getCause).map(msg).getOrElse("")
      assert(msg(e).contains("already bound its metadata backend"),
        msg(e))
      assert(VersionedTable.backend.isInstanceOf[HadoopTableIO],
        "the refused initialize must not have switched the backend")
    } finally VersionedTable.setBackend(prev)
    // the explicit programmatic restore releases the latch: a later
    // catalog initialize may re-declare the binding
    assert(VersionedTable.backend eq prev)
  }

  test("an unknown io backend refuses loudly at initialize") {
    val prev = VersionedTable.backend
    try {
      spark.conf.set("spark.sql.catalog.graftbadio",
        classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graftbadio.io", "s3-magic")
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE graftbadio.`${tmpDir("cio-bad")}/t` " +
          "(id BIGINT)")
      }
      assert(e.getMessage.contains("s3-magic") ||
        Option(e.getCause).exists(_.getMessage.contains("s3-magic")),
        e.getMessage)
    } finally VersionedTable.setBackend(prev)
  }
}
