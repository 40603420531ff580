package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column support (north-star op, SURVEY.md §2): image/audio/video
  * as opaque `binary` payloads with a typed metadata struct, plus the
  * decode / feature-extract / resize / frame-sample plumbing.
  *
  * All THREE modalities decode for REAL through one per-partition decode
  * seam ([[extractFeatures]]), each pure-JDK (no native deps) and each
  * gated by the same proof shape — closed-form fixtures encoded
  * distributed, decoded back, hash-matched against a DuckDB oracle that
  * recomputes the decoded statistics from arithmetic alone:
  *
  *  - [[ImageCodec]] — `javax.imageio` PNG/BMP: bytes → pixels →
  *    width/height/pixel-sum (q_image_stats).
  *  - [[AudioCodec]] — `javax.sound.sampled` RIFF/WAVE PCM: bytes →
  *    samples → rate/bit-depth/frame-count/sample-sum (q_audio_stats).
  *  - [[VideoCodec]] — `javax.imageio` multi-frame GIF: bytes → frames →
  *    geometry/frame-count/gray-sum over every frame (q_video_stats).
  *  - [[StubCodec]] is NOT a modality stand-in anymore: it is the
  *    arithmetic pseudo-codec for the OPAQUE text-byte payloads
  *    q_multimodal drives the generic plumbing with (binary column,
  *    batch-iterator `mapPartitions`, one codec init per partition — the
  *    exact shape a JNI decoder like ffmpeg would drop into).
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

  /** Arithmetic pseudo-codec for OPAQUE payloads (q_multimodal's generic
    * plumbing demo — all three real modalities have their own codecs:
    * [[ImageCodec]], [[AudioCodec]], [[VideoCodec]]). Every field is pure
    * arithmetic on the payload so tests and oracles can reproduce it;
    * swap `decode` for a JNI call in production. */
  object StubCodec extends Serializable {
    def decode(a: Asset): AssetFeatures = {
      val n = a.payload.length.toLong
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

  /** REAL image codec: `javax.imageio` (JDK-builtin PNG/BMP readers —
    * verified lossless for 8-bit grayscale in this JVM). The payload is
    * decoded to a pixel raster; features are computed FROM THE PIXELS:
    * width/height from the decoded geometry, checksum = the sum of all
    * gray samples (the field a real pipeline fills with a perceptual
    * hash). Works per-row inside the [[extractFeatures]] partition seam;
    * decodes read through an explicit MemoryCacheImageInputStream (in-
    * memory, no per-call tmp-file spooling) rather than flipping the
    * JVM-global ImageIO.setUseCache switch under other ImageIO users. */
  object ImageCodec extends Serializable {

    def decode(a: Asset): AssetFeatures = {
      // ImageIO.read(ImageInputStream) closes the stream itself when the
      // read completes — no explicit close (a second close throws).
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(a.payload)))
      require(img != null, s"undecodable image payload: asset ${a.asset_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
        width = w, height = h, n_frames = 1, checksum = sum)
    }
  }

  /** REAL audio codec: `javax.sound.sampled` (JDK-builtin WAV/PCM reader —
    * no native deps, no audio device needed for stream decode). The payload
    * is parsed as a RIFF/WAVE container; features come FROM THE DECODED
    * SAMPLES: width = sample rate, height = bits per sample, n_frames =
    * PCM frame count, checksum = sum of all 16-bit samples (the field a
    * real pipeline fills with an acoustic fingerprint). Covers the audio
    * leg of the decode seam the same way [[ImageCodec]] covers images;
    * [[StubCodec]] now stands in for video only. */
  object AudioCodec extends Serializable {
    def decode(a: Asset): AssetFeatures = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"expected 16-bit LE mono PCM: asset ${a.asset_id}")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var sum = 0L
        var i = 0
        while (i < n) {
          sum += (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
          i += 1
        }
        AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
          width = fmt.getSampleRate.toInt, height = fmt.getSampleSizeInBits,
          n_frames = n, checksum = sum)
      } finally ais.close()
    }
  }

  /** REAL video codec: multi-frame GIF via `javax.imageio` (the one
    * multi-frame motion format the bare JDK reads — no ffmpeg needed).
    * The payload is parsed as a GIF container; features come FROM THE
    * DECODED FRAMES: width/height from frame 0's geometry, n_frames =
    * the container's actual frame count, checksum = the gray sum over
    * every pixel of every frame (the field a real pipeline fills with a
    * perceptual video hash). Pixels read through `getRGB` (palette →
    * sRGB), so the values are the colors the palette MAPS TO, never raw
    * palette indices — correct for any palette order the encoder chose.
    * Verified: the JDK GIF writer/reader round-trips 8-bit gray exactly
    * (GIF's LZW is lossless; only the palette quantizes, and a 256-gray
    * palette doesn't). With this, all three modalities decode for real;
    * [[StubCodec]] remains only as the arithmetic pseudo-codec for the
    * OPAQUE text-byte payloads q_multimodal drives the plumbing with. */
  object VideoCodec extends Serializable {
    def decode(a: Asset): AssetFeatures = {
      val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try {
        rd.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(a.payload)))
        val n = rd.getNumImages(true)
        require(n > 0, s"undecodable video payload: asset ${a.asset_id}")
        var sum = 0L
        var w = 0
        var h = 0
        var f = 0
        while (f < n) {
          val img = rd.read(f)
          if (f == 0) { w = img.getWidth; h = img.getHeight }
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              sum += (img.getRGB(x, y) & 0xff)
              x += 1
            }
            y += 1
          }
          f += 1
        }
        AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
          width = w, height = h, n_frames = n, checksum = sum)
      } finally rd.dispose()
    }
  }

  /** Deterministic fixture clip: frames = 3 + id%4 of (16 + id%8) ×
    * (12 + id%4), gray(x, y, f) = (7x + 13y + 31f + id) mod 256 —
    * closed-form frames, so the oracle can recompute what [[VideoCodec]]
    * must read back out of the GIF container. Encoded with the JDK's own
    * GIF sequence writer (full frames, no delta optimization). */
  def encodeGif(id: Long): Array[Byte] = {
    val fr = (3 + id % 4).toInt
    val w = (16 + id % 8).toInt
    val h = (12 + id % 4).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      wr.setOutput(out)
      wr.prepareWriteSequence(null)
      var f = 0
      while (f < fr) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0,
              ((x * 7L + y * 13L + f * 31L + id) % 256L).toInt)
            x += 1
          }
          y += 1
        }
        wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      wr.endWriteSequence()
    } finally {
      wr.dispose()
      out.close()
    }
    bos.toByteArray
  }

  /** Video asset table: one REAL multi-frame GIF payload per document id,
    * born distributed like [[imageAssets]]/[[audioAssets]]. */
  def videoAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .map { id =>
        val bytes = encodeGif(id)
        Asset(id, "gif", bytes, bytes.length.toLong)
      }
  }

  /** Deterministic fixture waveform: n = 64 + id%64 samples at 8 kHz,
    * sample(i) = ((31 i + 7 id) mod 2001) − 1000 — closed-form PCM, so the
    * oracle can recompute what [[AudioCodec]] must read back out of the
    * RIFF bytes. Encoded with the JDK's own WAVE writer. */
  def encodeWav(id: Long): Array[Byte] = {
    val n = (64 + id % 64).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((i.toLong * 31 + id * 7) % 2001 - 1000).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio asset table: one REAL RIFF/WAVE payload per document id, born
    * distributed like [[imageAssets]]. */
  def audioAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .map { id =>
        val bytes = encodeWav(id)
        Asset(id, "wav", bytes, bytes.length.toLong)
      }
  }

  /** Deterministic fixture image: width 16 + id%16, height 16 + (id/2)%16,
    * gray(x, y) = (7x + 13y + id) mod 256 — closed-form pixels, so the
    * oracle can recompute what [[ImageCodec]] must read back out of the
    * encoded bytes. Encoded with the JDK's own PNG/BMP writers (both
    * lossless for 8-bit gray). */
  def encodeImage(id: Long, format: String): Array[Byte] = {
    val w = (16 + id % 16).toInt
    val h = (16 + (id / 2) % 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((x * 7L + y * 13L + id) % 256L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no JDK writer for format $format")
    bos.toByteArray
  }

  /** Image asset table: one REAL encoded image per document id, format
    * alternating PNG/BMP by parity (two distinct JDK readers exercised).
    * Generation is a map over ids — the binary column is born distributed,
    * never on the driver. */
  def imageAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .map { id =>
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val bytes = encodeImage(id, fmt)
        Asset(id, fmt, bytes, bytes.length.toLong)
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
    * pattern. Stays a Dataset[T] end to end. `codec` selects the decoder:
    * the real [[ImageCodec.decode]] / [[AudioCodec.decode]] /
    * [[VideoCodec.decode]], or [[StubCodec.decode]] (default — the
    * opaque-payload pseudo-codec). */
  def extractFeatures(assets: Dataset[Asset],
      codec: Asset => AssetFeatures = StubCodec.decode): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: val codec = Codec.open() — once per partition
      it.map(codec)
    }
  }

  /** Resize = payload truncation in the stub (keeps the byte-slicing
    * plumbing honest). */
  def resize(assets: Dataset[Asset], maxBytes: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.map(a => a.copy(payload = a.payload.take(maxBytes)))
  }

  /** REAL image downsampling: decode → nearest-neighbor resample by an
    * integer `factor` → re-encode PNG. Nearest-neighbor (not Graphics2D
    * interpolation) keeps the transform CLOSED-FORM — out(x, y) =
    * in(factor·x, factor·y) — so specs recompute resized pixel sums
    * exactly; a real pipeline swaps the sampling kernel, the decode →
    * transform → re-encode partition shape is identical. */
  def downsampleImages(assets: Dataset[Asset],
                       factor: Int): Dataset[Asset] = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(a.payload)))
      require(img != null, s"undecodable image payload: asset ${a.asset_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      val (dw, dh) = (math.max(1, w / factor), math.max(1, h / factor))
      val out = new java.awt.image.BufferedImage(
        dw, dh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val src = img.getRaster
      val dst = out.getRaster
      var y = 0
      while (y < dh) {
        var x = 0
        while (x < dw) {
          dst.setSample(x, y, 0, src.getSample(x * factor, y * factor, 0))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      val bytes = bos.toByteArray
      a.copy(payload = bytes, declared_bytes = bytes.length.toLong)
    })
  }

  /** REAL video frame sampling: decode the GIF frame sequence, keep
    * every `everyNth` frame, re-encode — the decimation a training
    * pipeline runs before feature extraction, done on DECODED frames
    * rather than byte blocks. Output is itself a valid clip, so the
    * result feeds straight back into [[VideoCodec.decode]]. */
  def sampleVideoFrames(assets: Dataset[Asset],
                        everyNth: Int): Dataset[Asset] = {
    require(everyNth >= 1, s"everyNth must be >= 1: $everyNth")
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val bytes = try {
        rd.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(a.payload)))
        val n = rd.getNumImages(true)
        require(n > 0, s"undecodable video payload: asset ${a.asset_id}")
        val bos = new java.io.ByteArrayOutputStream()
        val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try {
          wr.setOutput(out)
          wr.prepareWriteSequence(null)
          var f = 0
          while (f < n) {
            if (f % everyNth == 0)
              wr.writeToSequence(
                new javax.imageio.IIOImage(rd.read(f), null, null), null)
            f += 1
          }
          wr.endWriteSequence()
        } finally {
          wr.dispose()
          out.close()
        }
        bos.toByteArray
      } finally rd.dispose()
      a.copy(payload = bytes, declared_bytes = bytes.length.toLong)
    })
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

  /** q_image_stats — REAL decode accounting: encode fixture images
    * distributed, decode them back through [[ImageCodec]], aggregate
    * per (format, decoded width). The oracle recomputes width/height/
    * pixel-sum from the fixture's closed form — a hash match is only
    * possible if the bytes→pixels decode actually happened. */
  def qImageStats(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(imageAssets(spark, sfDir), ImageCodec.decode).toDF()
      .groupBy(col("kind"), col("width"))
      .agg(count(lit(1)).as("n"),
        sum(col("height")).as("sum_h"),
        sum(col("checksum")).as("gray_sum"))
      .orderBy(col("kind"), col("width"))

  /** q_audio_stats — REAL audio decode accounting: encode fixture WAVs
    * distributed, decode them back through [[AudioCodec]], aggregate per
    * decoded frame count. The oracle recomputes rate/frames/sample-sum
    * from the waveform's closed form — a hash match is only possible if
    * the RIFF container was actually parsed back to PCM samples. */
  def qAudioStats(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(audioAssets(spark, sfDir), AudioCodec.decode).toDF()
      .groupBy(col("n_frames"))
      .agg(count(lit(1)).as("n"),
        sum(col("checksum")).as("sample_sum"),
        max(col("width")).as("rate"),
        sum(col("n_bytes")).as("sum_bytes"))
      .orderBy(col("n_frames"))

  /** q_video_stats — REAL video decode accounting: encode fixture clips
    * distributed, decode them back through [[VideoCodec]], aggregate per
    * decoded frame count. The oracle recomputes frames/geometry/gray-sum
    * from the clip's closed form — a hash match is only possible if the
    * GIF container was actually parsed back to per-frame pixels.
    * Container byte size is NOT compared (LZW output has no closed
    * form); everything decoded is. */
  def qVideoStats(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(videoAssets(spark, sfDir), VideoCodec.decode).toDF()
      .groupBy(col("n_frames"))
      .agg(count(lit(1)).as("n"),
        sum(col("checksum")).as("gray_sum"),
        sum(col("width")).as("sum_w"),
        sum(col("height")).as("sum_h"))
      .orderBy(col("n_frames"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal" -> (qMultimodal _),
    "q_image_stats" -> (qImageStats _),
    "q_audio_stats" -> (qAudioStats _),
    "q_video_stats" -> (qVideoStats _))

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
        |ORDER BY kind""".stripMargin,
    // q_image_stats: the fixture pixels have a closed form, so the oracle
    // recomputes the DECODED statistics (width/height/pixel sum) from
    // arithmetic over a generated (x, y) grid — no image library involved
    "q_image_stats" ->
      """WITH dims AS (
        |  SELECT doc_id AS id,
        |         CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS kind,
        |         16 + doc_id % 16 AS w,
        |         16 + (doc_id // 2) % 16 AS h
        |  FROM documents),
        |px AS (
        |  SELECT id, kind, w, h, (x.v * 7 + y.v * 13 + id) % 256 AS gray
        |  FROM dims,
        |       UNNEST(generate_series(0, w - 1)) AS x(v),
        |       UNNEST(generate_series(0, h - 1)) AS y(v)),
        |per_img AS (
        |  SELECT id, kind, w, h, SUM(gray) AS gsum
        |  FROM px GROUP BY 1, 2, 3, 4)
        |SELECT kind, CAST(w AS INT) AS width, COUNT(*) AS n,
        |       CAST(SUM(h) AS BIGINT) AS sum_h,
        |       CAST(SUM(gsum) AS BIGINT) AS gray_sum
        |FROM per_img
        |GROUP BY kind, w
        |ORDER BY kind, width""".stripMargin,
    // q_audio_stats: the fixture waveform has a closed form, so the oracle
    // recomputes the DECODED statistics (frame count, sample sum) from
    // arithmetic over a generated sample index — no audio library involved.
    // 44 = the RIFF/WAVE PCM header the JDK writer emits (probed: total
    // bytes − 2·n_samples), so sum_bytes checks container framing too.
    "q_audio_stats" ->
      """WITH d AS (
        |  SELECT doc_id AS id, 64 + doc_id % 64 AS n FROM documents),
        |samp AS (
        |  SELECT id, n, ((i.v * 31 + id * 7) % 2001) - 1000 AS s
        |  FROM d, UNNEST(generate_series(0, n - 1)) AS i(v)),
        |per AS (SELECT id, n, SUM(s) AS ssum FROM samp GROUP BY 1, 2)
        |SELECT CAST(n AS INT) AS n_frames, COUNT(*) AS n,
        |  CAST(SUM(ssum) AS BIGINT) AS sample_sum,
        |  CAST(8000 AS INT) AS rate,
        |  CAST(SUM(44 + 2 * n) AS BIGINT) AS sum_bytes
        |FROM per
        |GROUP BY n
        |ORDER BY n_frames""".stripMargin,
    // q_video_stats: the fixture frames have a closed form, so the oracle
    // recomputes the DECODED statistics (frame count, geometry, gray sum)
    // from arithmetic over a generated (frame, x, y) grid — no video
    // library involved
    "q_video_stats" ->
      """WITH d AS (
        |  SELECT doc_id AS id, 3 + doc_id % 4 AS fr,
        |         16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents),
        |px AS (
        |  SELECT id, fr, w, h,
        |         (x.v * 7 + y.v * 13 + f.v * 31 + id) % 256 AS gray
        |  FROM d,
        |       UNNEST(generate_series(0, fr - 1)) AS f(v),
        |       UNNEST(generate_series(0, w - 1)) AS x(v),
        |       UNNEST(generate_series(0, h - 1)) AS y(v)),
        |per AS (
        |  SELECT id, fr, w, h, SUM(gray) AS g FROM px GROUP BY 1, 2, 3, 4)
        |SELECT CAST(fr AS INT) AS n_frames, COUNT(*) AS n,
        |  CAST(SUM(g) AS BIGINT) AS gray_sum,
        |  CAST(SUM(w) AS BIGINT) AS sum_w,
        |  CAST(SUM(h) AS BIGINT) AS sum_h
        |FROM per
        |GROUP BY fr
        |ORDER BY n_frames""".stripMargin)
}
