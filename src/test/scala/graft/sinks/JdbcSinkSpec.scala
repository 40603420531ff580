package graft.sinks

import graft.SparkSpec
import graft.pipeline.WeatherEtlMain

class JdbcSinkSpec extends SparkSpec {

  test("jdbc config mirrors the reference's env contract (README.md:73–78)") {
    val cfg = JdbcSink.configFromEnv(Map(
      "MYSQL_HOST" -> "mysql", "MYSQL_DATABASE" -> "meteo",
      "MYSQL_USER" -> "app", "MYSQL_PASSWORD" -> "s3cret"))
    assert(cfg.url == "jdbc:mysql://mysql:3306/meteo")
    assert(cfg.options("dbtable") == "weather")
    assert(cfg.options("driver") == "com.mysql.cj.jdbc.Driver")
  }

  test("jdbc config fails fast on missing credentials") {
    val ex = intercept[IllegalArgumentException] {
      JdbcSink.configFromEnv(Map("MYSQL_HOST" -> "mysql"))
    }
    assert(ex.getMessage.contains("manquantes"))
  }

  test("jdbc append executes end-to-end against embedded Derby (O14 executed)") {
    import java.sql.DriverManager
    import graft.core.{WeatherFixtures, WeatherTransform}
    import spark.implicits._
    val url = s"jdbc:derby:${tmpDir("derby")}/wdb;create=true"
    // Pre-create the table with the reference's column types
    // (weather_etl.py:68–77): REAL = MySQL FLOAT (single precision),
    // VARCHAR timestamps — so the server-side narrowing is exercised.
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      """CREATE TABLE weather (
        |  city VARCHAR(100), temperature REAL, weather VARCHAR(100),
        |  humidity INT, pressure INT, wind_speed REAL,
        |  lt VARCHAR(19), utc VARCHAR(19))""".stripMargin)
    finally conn.close()
    val opts = Map("url" -> url, "dbtable" -> "weather",
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val flat = WeatherTransform(WeatherFixtures.all.toDF("value"))
    JdbcSink.append(flat, opts)
    val back = spark.read.format("jdbc").options(opts).load()
    assert(back.count() == WeatherFixtures.all.size)
    // Derby folds unquoted identifiers to upper case on readback
    val m = back.filter($"CITY" === "Marseille" && $"UTC" === "2024-08-12 10:00:00")
      .collect().head
    // FLOAT narrowing happened server-side: the engine wrote double 27.3,
    // the table holds float 27.3f (= 27.2999992... as double, ≠ 27.3)
    val t = m.getAs[Any]("TEMPERATURE") match {
      case f: Float => f.toDouble
      case d: Double => d
    }
    assert(t == 27.3f.toDouble && t != 27.3)
    // the sink-edge VARCHAR formatting (O10) round-tripped
    assert(m.getAs[String]("LT") == "2024-08-12 12:00:00")
    // replaying the append is NOT idempotent at the JDBC layer — dedup is
    // the landed-table layer's job (O13), same as the reference
    JdbcSink.append(flat, opts)
    assert(spark.read.format("jdbc").options(opts).load().count() ==
      2L * WeatherFixtures.all.size)
  }

  test("spark-submit entry runs one idempotent fixture cycle") {
    val table = tmpDir("etl-main")
    val r1 = WeatherEtlMain.run(spark, table, fixture = true)
    assert(r1.appended == 1)
    val r2 = WeatherEtlMain.run(spark, table, fixture = true)
    assert(r2.appended == 0) // replay is a no-op: the reference's guarantee
    assert(spark.read.parquet(table).count() == 1)
  }
}
