package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** O3 as a first-class Structured Streaming source — `format("weather-rest")`
  * — the idiomatic DataSourceV2 form of the reference's periodic REST fetch
  * (/root/reference/airflow/dags/weather_etl.py:29 + :90–110). One GET per
  * micro-batch trigger, one row per GET, schema `value: string` (the raw
  * body), feeding the same [[graft.core.WeatherTransform]] plan as the batch
  * path:
  *
  * {{{
  * spark.readStream.format("weather-rest")
  *   .option("url", cfg.url)            // or option("fetcher", testKey)
  *   .load()                            // → DataFrame["value"]
  * }}}
  *
  * Offsets are a monotone fetch counter: the [[SupportsAdmissionControl]]
  * `latestOffset(start, limit)` path — which the engine calls exactly once
  * per trigger to admit data — advances the counter by
  * `maxFetchesPerTrigger` (option, default 1), so the trigger cadence (the
  * reference's 2 minutes) × the per-trigger rate fully determines ingest.
  * A tighter engine-supplied [[ReadMaxRows]] (alone or inside a
  * [[CompositeReadLimit]]) is honored — the admitted range never exceeds
  * its `maxRows`; `ReadAllAvailable` falls back to the configured rate
  * (a synthetic source has no backlog to drain). Monitoring polls go
  * through the non-mutating `reportLatestOffset`, so
  * idle polls never manufacture a fetch. Replaying a (start, end] range
  * re-fetches — at-least-once, which the downstream key dedup (O13) turns
  * into effectively-once, exactly the reference's design.
  *
  * Contract: like Spark's own `rate` source, this source manufactures new
  * offsets per trigger forever under `Trigger.ProcessingTime` (stop it
  * explicitly; `processAllAvailable()` never drains). `Trigger.AvailableNow`
  * IS supported ([[SupportsTriggerAvailableNow]]): "available now" for a
  * fetch-on-demand source is one admission batch — the query fetches
  * `maxFetchesPerTrigger` documents past the restored offset and
  * terminates, the one-shot batch-style invocation.
  */
class WeatherRestStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "weather-rest"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WeatherRestStreamSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    // DSv2 options are case-insensitive by convention — normalize once here
    // so `.option("MaxFetchesPerTrigger", …)` is honored, not silently
    // ignored. Values keep their case (fetcher keys, urls).
    new WeatherRestTable(properties.asScala.map {
      case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v
    }.toMap)
}

object WeatherRestStreamSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Test seam: options are strings, so test fetchers register here under a
    * key passed as `.option("fetcher", key)`. Production uses `url` +
    * the default HTTP transport. */
  val fetchers = new ConcurrentHashMap[String, RestWeatherSource.Fetcher]()

  private[sources] def resolveFetch(props: Map[String, String]): () => String = {
    props.get("fetcher") match {
      case Some(key) =>
        val f = fetchers.get(key)
        require(f != null, s"no test fetcher registered under '$key'")
        () => f.fetch(props.getOrElse("url", ""))
      case None =>
        val url = props.getOrElse("url",
          throw new IllegalArgumentException(
            "Les informations de configuration sont manquantes: url"))
        val http = new RestWeatherSource.HttpFetcher()
        () => http.fetch(url)
    }
  }
}

private class WeatherRestTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "weather-rest"
  override def schema(): StructType = WeatherRestStreamSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = WeatherRestStreamSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new WeatherRestMicroBatchStream(props)
      }
    }
}

private[sources] case class FetchCountOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class WeatherRestMicroBatchStream(props: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  /** Fetches admitted per trigger when the engine doesn't constrain
    * tighter. The reference's rate is one observation per tick; >1 models
    * a multi-city/paginated fetch at the same cadence. */
  private val maxFetchesPerTrigger: Long = {
    // props arrive lower-cased from WeatherRestStreamSource.getTable; the
    // direct-construction (test) path may still pass camelCase
    val m = props.getOrElse("maxfetchespertrigger",
      props.getOrElse("maxFetchesPerTrigger", "1")).toLong
    require(m > 0, s"maxFetchesPerTrigger must be positive, got $m")
    m
  }
  @volatile private var latest = 0L
  override def initialOffset(): Offset = FetchCountOffset(0L)
  /** Engine never calls this when SupportsAdmissionControl is implemented —
    * the admission path below is the only offset-advancing entry point. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "weather-rest implements SupportsAdmissionControl; use latestOffset(start, limit)")
  /** Tightest maxRows bound inside a possibly-composite limit; None when
    * the engine imposes none (ReadAllAvailable / min-rows-only). */
  private def maxRowsOf(limit: ReadLimit): Option[Long] = limit match {
    case r: ReadMaxRows => Some(r.maxRows())
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(maxRowsOf).minOption
    case _: ReadAllAvailable => None
    case _ => None // ReadMinRows: a synthetic source cannot wait for backlog
  }
  /** Trigger.AvailableNow drain mode. Spark calls
    * `prepareForTriggerAvailableNow()` while building the logical plan —
    * BEFORE the checkpoint restore feeds offsets through
    * [[deserializeOffset]] — so an absolute target computed there would be
    * stale (a restarted AvailableNow run would drain zero rows). Only the
    * MODE is flagged here; the target is pinned on the first admission
    * call, whose `start` is the restored offset. */
  @volatile private var availableNowMode = false
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = availableNowMode = true
  /** The per-trigger admission decision: end = start + the configured
    * per-trigger rate, capped by any engine-supplied maxRows — regardless
    * of how often anything else polls — and, under AvailableNow, by the
    * drain target = restored offset + one full admission batch (once
    * reached, the offset stops advancing and the query terminates). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FetchCountOffset].n
    val admit = maxRowsOf(limit).fold(maxFetchesPerTrigger)(
      math.min(maxFetchesPerTrigger, _))
    if (availableNowMode && availableNowTarget.isEmpty)
      availableNowTarget = Some(s + maxFetchesPerTrigger)
    val uncapped = s + admit
    val next = availableNowTarget.fold(uncapped)(
      t => math.min(uncapped, math.max(t, s)))
    if (next > latest) latest = next
    FetchCountOffset(next)
  }
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(maxFetchesPerTrigger)
  /** Monitoring path — reports without advancing. */
  override def reportLatestOffset(): Offset = FetchCountOffset(latest)
  /** Restart path: the checkpoint feeds committed offsets back through here —
    * fast-forward the in-memory counter so latestOffset never regresses
    * below what the log already holds (a regressed offset would plan
    * negative ranges and silently emit empty batches). */
  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    if (n > latest) latest = n
    FetchCountOffset(n)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val n = math.max(0L, end.asInstanceOf[FetchCountOffset].n -
      start.asInstanceOf[FetchCountOffset].n)
    // One fetch per elapsed trigger; a single partition — the fetch is one
    // document, there is nothing to parallelize at the source (SURVEY.md §4).
    Array(WeatherRestInputPartition(n.toInt, props))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val part = p.asInstanceOf[WeatherRestInputPartition]
        val fetch = WeatherRestStreamSource.resolveFetch(part.props)
        new PartitionReader[InternalRow] {
          private var remaining = part.fetches
          private var current: InternalRow = _
          override def next(): Boolean =
            if (remaining <= 0) false
            else {
              current = InternalRow(UTF8String.fromString(fetch()))
              remaining -= 1
              true
            }
          override def get(): InternalRow = current
          override def close(): Unit = ()
        }
      }
    }
}

private case class WeatherRestInputPartition(fetches: Int,
    props: Map[String, String]) extends InputPartition
