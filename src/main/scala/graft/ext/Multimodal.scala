package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column support (north-star op, SURVEY.md §2): image/audio/video
  * as opaque `binary` payloads with a typed metadata struct, plus the
  * decode / feature-extract / resize / frame-sample plumbing.
  *
  * The decode step is a clearly-marked STUB (this container has no image or
  * audio codecs): [[StubCodec.decode]] derives deterministic pseudo-features
  * from the payload bytes where a real libjpeg/ffmpeg call would go. What IS
  * real — and tested — is everything Spark-side: the asset schema, the
  * batch-iterator `mapPartitions` shape (one codec init per partition, the
  * exact pattern a JNI decoder needs), partition sizing, and the feature
  * schema the pipeline downstream consumes.
  */
object Multimodal {

  /** Typed asset row: payload + metadata, the multimodal table schema. */
  case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
                   declared_bytes: Long)

  /** Post-decode features (width/height for images, frames for video,
    * samples for audio — the stub fills them all deterministically). */
  case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           checksum: Long)

  /** STUB codec — deterministic stand-in for libjpeg/libsndfile/ffmpeg.
    * Every field is pure arithmetic on the payload so tests and oracles can
    * reproduce it; swap `decode` for the real call in production. */
  object StubCodec extends Serializable {
    def decode(a: Asset): AssetFeatures = {
      val n = a.payload.length.toLong
      // ??? real decoder goes here — the surrounding plumbing is the product
      var ck = 0L
      var i = 0
      while (i < a.payload.length) { ck = ck * 31 + (a.payload(i) & 0xff); i += 1 }
      AssetFeatures(a.asset_id, a.kind, n,
        width = (64 + n % 1024).toInt,
        height = (64 + (n / 2) % 1024).toInt,
        n_frames = if (a.kind == "video") (1 + n % 300).toInt else 1,
        checksum = ck & 0x7fffffffffffffffL)
    }
  }

  /** Build a multimodal asset table from `documents` (the driver data has no
    * binary column, so payloads are the UTF-8 text bytes — opaque to
    * everything downstream, exactly like real image bytes would be). */
  def assets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id").as("asset_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        octet_length(col("text")).cast("long").as("declared_bytes"))
      .as[Asset]
  }

  /** The decode pass: mapPartitions so a real codec initializes once per
    * partition (not per row) — the Scala twin of the mapInPandas batch
    * pattern. Stays a Dataset[T] end to end. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: val codec = Codec.open() — once per partition
      it.map(StubCodec.decode)
    }
  }

  /** Resize = payload truncation in the stub (keeps the byte-slicing
    * plumbing honest). */
  def resize(assets: Dataset[Asset], maxBytes: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.map(a => a.copy(payload = a.payload.take(maxBytes)))
  }

  /** Frame sampling: treat the payload as fixed-size frame blocks and keep
    * every nth block — the video-decimation plumbing (a real impl swaps the
    * block slicing for keyframe selection; the partition-wise batch shape
    * is identical). */
  def frameSample(assets: Dataset[Asset], frameBytes: Int,
                  everyNth: Int): Dataset[Asset] = {
    require(frameBytes > 0 && everyNth > 0)
    import assets.sparkSession.implicits._
    assets.map { a =>
      val kept = a.payload.grouped(frameBytes).zipWithIndex
        .collect { case (block, i) if i % everyNth == 0 => block }
        .flatten.toArray
      a.copy(payload = kept)
    }
  }

  /** q_multimodal — per-kind accounting over the decoded features. The stub
    * decode is pure arithmetic, so the oracle reproduces it in SQL — the
    * plumbing (binary payloads, mapPartitions decode, feature schema) is
    * what's being verified. */
  def qMultimodal(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(assets(spark, sfDir)).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("sum_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("n_frames")), 4).as("avg_frames"))
      .orderBy(col("kind"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal" -> (qMultimodal _))

  val oracles: Map[String, String] = Map(
    "q_multimodal" ->
      """SELECT kind, COUNT(*) AS n_assets,
        |  CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
        |  ROUND(AVG(width), 4) AS avg_width,
        |  ROUND(AVG(n_frames), 4) AS avg_frames
        |FROM (
        |  SELECT ['image','audio','video'][(doc_id % 3) + 1] AS kind,
        |    octet_length(encode(text)) AS n_bytes,
        |    64 + octet_length(encode(text)) % 1024 AS width,
        |    CASE WHEN ['image','audio','video'][(doc_id % 3) + 1] = 'video'
        |         THEN 1 + octet_length(encode(text)) % 300 ELSE 1 END
        |      AS n_frames
        |  FROM documents) t
        |GROUP BY kind
        |ORDER BY kind""".stripMargin)
}
