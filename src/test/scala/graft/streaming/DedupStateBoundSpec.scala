package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** EMPIRICAL bound on the streaming-dedup state store — the O13 scale
  * claim measured, not argued. The engine's watermarked dedup
  * (`withWatermark + dropDuplicatesWithinWatermark`, the
  * [[WeatherStream]] transform) claims state bounded by the watermark
  * horizon, against the reference's unbounded duplicate-key set
  * (weather_etl.py:158–187, one `(city, utc)` probe per row against an
  * ever-growing MySQL table). This spec drives a long synthetic stream
  * — every batch carries FRESH keys, the adversarial shape for a dedup
  * operator, since nothing ever ages out by being a duplicate — and
  * reads the state-store rows from query progress:
  *
  *  - the WATERMARKED variant's state PLATEAUS once event time crosses
  *    the horizon: keys older than the watermark evict, so state tracks
  *    horizon × rate, not stream length;
  *  - the UNBOUNDED variant (`dropDuplicates`, no watermark — the
  *    reference's semantics) grows linearly with every batch.
  *
  * At 100 TB the difference is the whole design: a 2-minute-cadence
  * landing running for a year holds ~263k keys of state per city under
  * a 1-hour horizon, vs every key it ever saw without one. */
class DedupStateBoundSpec extends SparkSpec {
  import spark.implicits._

  private val KeysPerBatch = 5
  private val Batches = 120
  /** Watermark horizon in event-time seconds; event time advances 1s
    * per batch, so the plateau is ~(Horizon + slack) × KeysPerBatch. */
  private val HorizonSec = 10

  /** Drive `Batches` micro-batches of fresh keys through `q`, event
    * time advancing 1 second per batch; returns state rows sampled at
    * 1/3, 2/3 and the end. */
  private def drive(input: MemoryStream[(String, Timestamp)],
                    q: StreamingQuery): (Long, Long, Long) = {
    var at13 = 0L; var at23 = 0L
    for (b <- 0 until Batches) {
      val ts = new Timestamp(1700000000000L + b * 1000L)
      input.addData((0 until KeysPerBatch).map(k => (s"k$b-$k", ts)): _*)
      q.processAllAvailable()
      val state = Option(q.lastProgress)
        .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(0L)
      if (b == Batches / 3) at13 = state
      if (b == 2 * Batches / 3) at23 = state
    }
    val end = q.lastProgress.stateOperators.apply(0).numRowsTotal
    (at13, at23, end)
  }

  test("watermarked dedup state PLATEAUS at the horizon while the " +
      "unbounded variant grows with stream length") {
    implicit val sqlCtx = spark.sqlContext
    // bounded: the engine's production transform shape
    val inB = MemoryStream[(String, Timestamp)]
    val bounded = inB.toDF().toDF("key", "ts")
      .withWatermark("ts", s"$HorizonSec seconds")
      .dropDuplicatesWithinWatermark("key")
    val qB = bounded.writeStream.format("noop")
      .option("checkpointLocation", tmpDir("dsb-b"))
      .outputMode("append").start()
    val (b13, b23, bEnd) =
      try drive(inB, qB) finally qB.stop()

    // unbounded: the reference's semantics (every key ever seen)
    val inU = MemoryStream[(String, Timestamp)]
    val unbounded = inU.toDF().toDF("key", "ts").dropDuplicates("key")
    val qU = unbounded.writeStream.format("noop")
      .option("checkpointLocation", tmpDir("dsb-u"))
      .outputMode("update").start()
    val (u13, u23, uEnd) =
      try drive(inU, qU) finally qU.stop()

    info(s"bounded state: 1/3=$b13 2/3=$b23 end=$bEnd")
    info(s"unbounded state: 1/3=$u13 2/3=$u23 end=$uEnd")

    // unbounded: linear growth — every batch's fresh keys stay forever
    assert(uEnd == (Batches * KeysPerBatch).toLong,
      s"unbounded variant should hold every key ever seen, got $uEnd")
    assert(u23 - u13 >= (Batches / 4) * KeysPerBatch,
      "unbounded variant did not grow linearly between samples")

    // bounded: the plateau — state tracks the horizon, not the stream.
    // A key is evictable once the watermark (maxEvent − horizon,
    // advanced at the END of a batch) passes its event time, so steady
    // state holds ~2×horizon of keys (measured: exactly 100 = 20
    // batches × 5 from batch ~40 on); the claim is the CEILING, and
    // that growth STOPS (2/3 -> end flat) while the stream keeps going.
    val plateauCeiling = (2 * HorizonSec + 5) * KeysPerBatch
    assert(bEnd <= plateauCeiling,
      s"watermarked state $bEnd exceeds the horizon ceiling " +
        s"$plateauCeiling — eviction is not happening")
    assert(math.abs(bEnd - b23) <= 2L * KeysPerBatch,
      s"watermarked state still growing late in the stream: " +
        s"2/3=$b23 end=$bEnd")
    assert(uEnd >= 5L * bEnd,
      s"the bound should separate the variants by the stream/horizon " +
        s"ratio: unbounded=$uEnd bounded=$bEnd")
  }
}
