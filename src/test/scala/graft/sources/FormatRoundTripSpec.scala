package graft.sources

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.core.{WeatherFixtures, WeatherSchema, WeatherTransform}

/** Source/sink format breadth: the landed weather schema (strings, ints,
  * doubles, timestamps) must survive a write→read round trip through every
  * bundled columnar/row format. Parquet is the engine-native path (exercised
  * everywhere else); CSV and JSON are the interop edges where type
  * information degrades unless the declared schema is applied on read —
  * which is exactly what the reference's duck-typed pipeline never does
  * (SURVEY.md §1.1) and this engine always can. */
class FormatRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private lazy val landed: DataFrame =
    WeatherTransform(WeatherFixtures.all.toDF("value"))

  private def roundTrip(format: String): Unit = {
    val path = tmpDir(s"rt-$format")
    val w = landed.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
    val r = spark.read.format(format)
    val back = (format match {
      case "csv" => r.option("header", "true").schema(WeatherSchema.landed)
      case "json" => r.schema(WeatherSchema.landed)
      case _ => r
    }).load(path)
    assert(back.schema == landed.schema,
      s"$format schema drift: ${back.schema} vs ${landed.schema}")
    val a = landed.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"$format round trip lost rows: $a vs $b")
  }

  test("parquet round trip preserves schema and values")(roundTrip("parquet"))
  test("orc round trip preserves schema and values")(roundTrip("orc"))
  test("csv round trip preserves values under the declared schema")(roundTrip("csv"))
  test("json round trip preserves values under the declared schema")(roundTrip("json"))
}
