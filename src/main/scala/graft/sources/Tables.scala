package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * The reference engine's only scan is a REST-JSON fetch
  * (/root/reference/airflow/dags/weather_etl.py:103); the analytics surface of
  * this engine additionally reads columnar Parquet, which is where the 100 TB
  * design lives: Parquet scans get predicate pushdown + column pruning from
  * Catalyst for free, so every query below this layer should show
  * `PushedFilters` / a narrow `ReadSchema` in `.explain("formatted")`.
  */
object Tables {
  /** All driver tables, by name. One parquet file per table at `sfDir`. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` normalized to the engine's µs `TimestampType`, whatever
    * the generator physically wrote. Seen across driver rounds:
    * INT64 TIMESTAMP(NANOS) (Spark 4 rejects it outright —
    * PARQUET_TYPE_ILLEGAL — so it's read as raw long ns via the legacy
    * conf and floor-divided to µs, matching DuckDB's ns→µs floor), and
    * plain timestamp[us] without a zone. The no-zone form is read with
    * NTZ inference OFF so the reader itself yields `TimestampType`
    * (session zone is pinned to UTC engine-wide, so values match
    * DuckDB's): no cast wraps the column, which keeps `ts` predicates
    * pushable to the parquet scan and the manifest stats layer —
    * a projection over the column would sacrifice both. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // The two legacy confs are consulted by the parquet CONVERTERS at
    // execution time too, not just at inference — so they cannot be
    // save/restored around this call (the returned plan is lazy; it
    // would execute under the restored values and fail or shift
    // semantics). Instead, probe the file's actual shape first and set a
    // conf ONLY when this generator vintage needs it: the common
    // timestamp[us] case mutates nothing session-wide.
    val probe = scala.util.Try(load(s, d, "events"))
    probe.map(_.schema("ts").dataType) match {
      case scala.util.Success(TimestampNTZType) =>
        // no-zone µs: read with NTZ inference OFF so the reader itself
        // yields TimestampType (session zone pinned UTC → DuckDB-equal),
        // keeping ts predicates pushable (no cast wrapper)
        s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        load(s, d, "events")
      case scala.util.Success(_) =>
        probe.get // timestamp[us]: already TimestampType, scan-native
      case scala.util.Failure(_) =>
        // INT64 TIMESTAMP(NANOS): Spark 4 rejects it outright
        // (PARQUET_TYPE_ILLEGAL) — read as raw long ns via the legacy
        // conf and floor-divide to µs, matching DuckDB's ns→µs floor.
        // True floor division: `div` truncates toward zero, which
        // differs from DuckDB's floor for pre-1970 (negative) stamps.
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = load(s, d, "events")
        require(df.schema("ts").dataType == LongType,
          s"events.ts: unexpected type ${df.schema("ts").dataType}")
        df.withColumn("ts", timestamp_micros(
          expr("ts DIV 1000 - IF(ts < 0 AND ts % 1000 != 0, 1, 0)")))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
