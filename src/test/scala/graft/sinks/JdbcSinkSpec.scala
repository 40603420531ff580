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

  test("spark-submit entry runs one idempotent fixture cycle") {
    val table = tmpDir("etl-main")
    val r1 = WeatherEtlMain.run(spark, table, fixture = true)
    assert(r1.appended == 1)
    val r2 = WeatherEtlMain.run(spark, table, fixture = true)
    assert(r2.appended == 0) // replay is a no-op: the reference's guarantee
    assert(spark.read.parquet(table).count() == 1)
  }
}
