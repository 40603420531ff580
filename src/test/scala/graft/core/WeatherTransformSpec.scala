package graft.core

import graft.SparkSpec

class WeatherTransformSpec extends SparkSpec {
  import spark.implicits._

  private def flatten(docs: Seq[String], strict: Boolean = true) =
    WeatherTransform.formatForSink(
      WeatherTransform(docs.toDF("value"), strict = strict))

  test("golden row: Marseille fixture flattens per FIXTURES.md §2") {
    val row = flatten(Seq(WeatherFixtures.marseille)).collect().head
    assert(row.getAs[String]("city") == "Marseille")
    assert(row.getAs[Double]("temperature") == 27.3)
    assert(row.getAs[String]("weather") == "ciel dégagé")
    assert(row.getAs[Int]("humidity") == 48)
    assert(row.getAs[Int]("pressure") == 1015)
    assert(row.getAs[Double]("wind_speed") == 4.6)
    assert(row.getAs[String]("lt") == "2024-08-12 12:00:00")
    assert(row.getAs[String]("utc") == "2024-08-12 10:00:00")
  }

  test("negative offset is plain offset addition (weather_etl.py:120)") {
    val row = flatten(Seq(WeatherFixtures.montreal)).collect().head
    assert(row.getAs[String]("lt") == "2024-08-12 06:00:00")
    assert(row.getAs[String]("utc") == "2024-08-12 10:00:00")
  }

  test("strict mode reproduces the reference's failure on empty weather[]") {
    val ex = intercept[Exception] {
      flatten(Seq(WeatherFixtures.emptyWeather)).collect()
    }
    assert(ex.getMessage.contains("weather[0] missing"))
  }

  test("permissive mode yields NULL description on empty weather[]") {
    val row = flatten(Seq(WeatherFixtures.emptyWeather), strict = false)
      .collect().head
    assert(row.getAs[String]("weather") == null)
    assert(row.getAs[String]("city") == "Nulle-Part")
  }

  test("landed schema matches WeatherSchema.landed before sink formatting") {
    val flat = WeatherTransform(Seq(WeatherFixtures.marseille).toDF("value"))
    assert(flat.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      WeatherSchema.landed.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
