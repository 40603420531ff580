package graft.core

import graft.SparkSpec

/** Schema-drift behavior (SURVEY.md §7 "what's hard" #4): the reference
  * duck-types into the API document and KeyErrors on anything unexpected
  * (weather_etl.py:125). Strict mode reproduces the hard failure; permissive
  * mode degrades to NULLs.
  */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private val corrupt = """{"name": "Broken", "dt": not-json"""
  private val missingFields = """{"name":"Sparse","dt":1723456800}"""

  test("corrupt JSON: strict mode fails the batch (reference semantics)") {
    val ex = intercept[Exception] {
      WeatherTransform(Seq(corrupt).toDF("value")).collect()
    }
    assert(ex.getMessage.contains("weather[0] missing") ||
      ex.getMessage.toLowerCase.contains("malformed"))
  }

  test("corrupt JSON: permissive mode yields a null-padded row, batch survives") {
    val rows = WeatherTransform(
      Seq(corrupt, WeatherFixtures.marseille).toDF("value"), strict = false)
      .collect()
    assert(rows.length == 2)
    val good = rows.find(r => !r.isNullAt(r.fieldIndex("city"))).get
    assert(good.getAs[String]("city") == "Marseille")
  }

  test("missing nested fields: permissive nulls only the absent branches") {
    val row = WeatherTransform(
      Seq(missingFields).toDF("value"), strict = false).collect().head
    assert(row.getAs[String]("city") == "Sparse")
    assert(row.isNullAt(row.fieldIndex("temperature")))
    assert(!row.isNullAt(row.fieldIndex("utc"))) // dt was present
  }

  test("dedup keys with NULLs never silently merge distinct cities") {
    // two permissive rows with null city must not dedup into one
    val rows = WeatherDedup.dedupWithinBatch(WeatherTransform(
      Seq(missingFields, missingFields.replace("Sparse", "Autre"))
        .toDF("value"), strict = false))
    assert(rows.count() == 2)
  }
}
