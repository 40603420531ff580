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
