package graft.sinks

import graft.SparkSpec
import graft.core.{WeatherFixtures, WeatherTransform}

class LandedTableSpec extends SparkSpec {
  import spark.implicits._

  private def flat(docs: Seq[String]) = WeatherTransform(docs.toDF("value"))

  test("partitioned layout: idempotent across replays, one dir per date") {
    val path = tmpDir("landed-part")
    assert(LandedTable.append(spark, flat(WeatherFixtures.all), path) == 3)
    assert(LandedTable.append(spark, flat(WeatherFixtures.all), path) == 0)
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("utc_date="))
    assert(dirs.toSet == Set("utc_date=2024-08-12"))
    assert(spark.read.parquet(path).count() == 3)
  }

  test("null-key rows are excluded, keeping replays idempotent") {
    val path = tmpDir("landed-nullkey")
    // permissive mode on a doc with no dt → null utc
    val sparse = Seq("""{"name":"NoTime","main":{"temp":1.0}}""")
    val batch = WeatherTransform(sparse.toDF("value"), strict = false)
    assert(LandedTable.append(spark, batch, path) == 0)
    assert(LandedTable.append(spark, batch, path) == 0) // replay: still 0
  }

  test("dynamic partition overwrite restates only the touched dates") {
    def doc(city: String, dt: Long, temp: Double) =
      s"""{"name":"$city","dt":$dt,"timezone":0,""" +
        s""""main":{"temp":$temp,"humidity":50,"pressure":1000},""" +
        """"weather":[{"description":"x"}],"wind":{"speed":1.0}}"""
    val d1 = 1723291200L // 2024-08-10 12:00:00 UTC
    val d2 = 1723377600L // 2024-08-11 12:00:00 UTC
    val path = tmpDir("landed-backfill")
    LandedTable.append(spark,
      flat(Seq(doc("A", d1, 10.0), doc("B", d2, 20.0))), path)
    // restate day 2: different key AND different payload — the old B row
    // must be GONE (restatement, not append), day 1 must be untouched
    val n = LandedTable.overwriteDates(spark,
      flat(Seq(doc("C", d2 + 3600, 30.0))), path)
    assert(n == 1)
    val rows = spark.read.parquet(path)
      .select("city", "temperature", "utc_date")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDate(2).toString))
      .toSet
    assert(rows == Set(("A", 10.0, "2024-08-10"), ("C", 30.0, "2024-08-11")),
      rows.toString)
  }

  test("date-ranged read prunes partitions (PartitionFilters in the scan)") {
    val path = tmpDir("landed-part2")
    LandedTable.append(spark, flat(WeatherFixtures.all), path)
    val q = LandedTable.readRange(spark, path, "2024-08-12", "2024-08-12")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(utc_date"), plan)
    assert(q.count() == 3)
    assert(LandedTable.readRange(spark, path, "2024-01-01", "2024-01-02")
      .count() == 0)
  }
}
