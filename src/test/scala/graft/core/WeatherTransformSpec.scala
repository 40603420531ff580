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

  test("property: transform is total and deterministic on schema-valid docs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docGen = for {
      city <- Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(12))
      dt <- Gen.chooseNum(0L, 4102444800L)         // 1970..2100
      tz <- Gen.chooseNum(-50400, 50400)           // real-world offset range
      temp <- Gen.chooseNum(-90.0, 60.0)
      hum <- Gen.chooseNum(0, 100)
      press <- Gen.chooseNum(870, 1085)
      wind <- Gen.chooseNum(0.0, 120.0)
    } yield s"""{"name":"$city","dt":$dt,"timezone":$tz,""" +
      s""""main":{"temp":$temp,"humidity":$hum,"pressure":$press},""" +
      s""""weather":[{"description":"x"}],"wind":{"speed":$wind}}"""
    val prop = Prop.forAll(Gen.listOfN(5, docGen)) { docs =>
      val out1 = flatten(docs).collect().map(_.toString).sorted
      val out2 = flatten(docs).collect().map(_.toString).sorted
      out1.length == docs.length && out1.sameElements(out2) &&
        out1.forall(_.nonEmpty)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("landed schema matches WeatherSchema.landed before sink formatting") {
    val flat = WeatherTransform(Seq(WeatherFixtures.marseille).toDF("value"))
    assert(flat.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      WeatherSchema.landed.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
