package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asset table: payload is opaque bytes with typed metadata") {
    val a = Multimodal.assets(spark, sf)
    val schema = a.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("payload") == "binary")
    assert(schema("kind") == "string")
    val row = a.filter($"asset_id" === 0L).collect().head
    assert(row.payload.length.toLong == row.declared_bytes ||
      row.payload.nonEmpty) // utf-8 bytes ≥ declared char count
  }

  test("feature extraction is deterministic and preserves every asset") {
    val a = Multimodal.assets(spark, sf)
    val f1 = Multimodal.extractFeatures(a).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(a).collect().sortBy(_.asset_id)
    assert(f1.length == a.count())
    assert(f1.map(_.checksum).sameElements(f2.map(_.checksum)))
    assert(f1.forall(x => x.width >= 64 && x.height >= 64))
    assert(f1.filter(_.kind != "video").forall(_.n_frames == 1))
  }

  test("resize truncates payloads without dropping assets") {
    val a = Multimodal.assets(spark, sf)
    val resized = Multimodal.resize(a, maxBytes = 100)
    assert(resized.count() == a.count())
    assert(resized.collect().forall(_.payload.length <= 100))
  }

  test("frame sampling keeps every nth fixed-size block") {
    val a = Multimodal.assets(spark, sf).filter($"asset_id" === 1L)
    val orig = a.collect().head.payload
    val sampled = Multimodal.frameSample(a, frameBytes = 10, everyNth = 3)
      .collect().head.payload
    val expected = orig.grouped(10).zipWithIndex
      .collect { case (b, i) if i % 3 == 0 => b }.flatten.toArray
    assert(sampled.sameElements(expected))
    assert(sampled.length < orig.length)
  }

  test("real image codec: decoded pixels match the closed form, both formats") {
    for (id <- Seq(0L, 1L, 7L, 30L, 31L)) {
      val fmt = if (id % 2 == 0) "png" else "bmp"
      val bytes = Multimodal.encodeImage(id, fmt)
      val f = Multimodal.ImageCodec.decode(
        Multimodal.Asset(id, fmt, bytes, bytes.length.toLong))
      val w = (16 + id % 16).toInt
      val h = (16 + (id / 2) % 16).toInt
      assert(f.width == w && f.height == h, s"id=$id geometry")
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield (x * 7L + y * 13L + id) % 256L).sum
      assert(f.checksum == want, s"id=$id pixel sum: got ${f.checksum} want $want")
    }
  }

  test("real audio codec: decoded PCM matches the closed form") {
    for (id <- Seq(0L, 1L, 17L, 63L, 64L)) {
      val bytes = Multimodal.encodeWav(id)
      val f = Multimodal.AudioCodec.decode(
        Multimodal.Asset(id, "wav", bytes, bytes.length.toLong))
      val n = (64 + id % 64).toInt
      assert(f.n_frames == n, s"id=$id frame count")
      assert(f.width == 8000 && f.height == 16, s"id=$id format fields")
      assert(f.n_bytes == 44 + 2L * n, s"id=$id container size")
      val want = (0 until n).map(i => (i.toLong * 31 + id * 7) % 2001 - 1000).sum
      assert(f.checksum == want, s"id=$id sample sum: got ${f.checksum} want $want")
    }
  }

  test("real video codec: decoded frames match the closed form") {
    for (id <- Seq(0L, 1L, 3L, 7L, 30L)) {
      val bytes = Multimodal.encodeGif(id)
      val f = Multimodal.VideoCodec.decode(
        Multimodal.Asset(id, "gif", bytes, bytes.length.toLong))
      val fr = (3 + id % 4).toInt
      val w = (16 + id % 8).toInt
      val h = (12 + id % 4).toInt
      assert(f.n_frames == fr, s"id=$id frame count: ${f.n_frames} vs $fr")
      assert(f.width == w && f.height == h, s"id=$id geometry")
      val want = (for (fi <- 0 until fr; y <- 0 until h; x <- 0 until w)
        yield (x * 7L + y * 13L + fi * 31L + id) % 256L).sum
      assert(f.checksum == want, s"id=$id gray sum: got ${f.checksum} want $want")
    }
  }

  test("real image downsampling: nearest-neighbor pixels match the " +
      "closed form after re-decode") {
    import spark.implicits._
    val ids = Seq(0L, 2L, 8L, 30L)
    val assets = ids.map { id =>
      val bytes = Multimodal.encodeImage(id, "png")
      Multimodal.Asset(id, "png", bytes, bytes.length.toLong)
    }.toDS()
    val small = Multimodal.downsampleImages(assets, 2)
    val feats = Multimodal.extractFeatures(small, Multimodal.ImageCodec.decode)
      .collect().map(f => f.asset_id -> f).toMap
    ids.foreach { id =>
      val w = (16 + id % 16).toInt
      val h = (16 + (id / 2) % 16).toInt
      val (dw, dh) = (w / 2, h / 2)
      val f = feats(id)
      assert(f.width == dw && f.height == dh, s"id=$id resized geometry")
      // out(x, y) = in(2x, 2y): the closed form survives the resample
      val want = (for (y <- 0 until dh; x <- 0 until dw)
        yield (2L * x * 7L + 2L * y * 13L + id) % 256L).sum
      assert(f.checksum == want,
        s"id=$id resized pixel sum: got ${f.checksum} want $want")
    }
  }

  test("real video frame sampling: every nth decoded frame survives, " +
      "re-encoded output is itself a decodable clip") {
    import spark.implicits._
    val ids = Seq(1L, 3L, 7L) // 4, 6, 6 frames
    val assets = ids.map { id =>
      val bytes = Multimodal.encodeGif(id)
      Multimodal.Asset(id, "gif", bytes, bytes.length.toLong)
    }.toDS()
    val sampled = Multimodal.sampleVideoFrames(assets, 2)
    val feats = Multimodal
      .extractFeatures(sampled, Multimodal.VideoCodec.decode)
      .collect().map(f => f.asset_id -> f).toMap
    ids.foreach { id =>
      val fr = (3 + id % 4).toInt
      val w = (16 + id % 8).toInt
      val h = (12 + id % 4).toInt
      val kept = (0 until fr).filter(_ % 2 == 0)
      val f = feats(id)
      assert(f.n_frames == kept.size,
        s"id=$id sampled frame count: ${f.n_frames} vs ${kept.size}")
      val want = (for (fi <- kept; y <- 0 until h; x <- 0 until w)
        yield (x * 7L + y * 13L + fi * 31L + id) % 256L).sum
      assert(f.checksum == want,
        s"id=$id sampled gray sum: got ${f.checksum} want $want")
    }
  }

  test("video codec rejects non-GIF payloads loudly") {
    val junk = Multimodal.Asset(9L, "gif", Array[Byte](1, 2, 3, 4), 4L)
    intercept[Exception](Multimodal.VideoCodec.decode(junk))
  }

  test("audio codec rejects non-RIFF payloads loudly") {
    val junk = Multimodal.Asset(9L, "wav", Array[Byte](1, 2, 3, 4), 4L)
    intercept[Exception](Multimodal.AudioCodec.decode(junk))
  }

  test("image codec rejects undecodable payloads loudly") {
    val junk = Multimodal.Asset(9L, "png", Array[Byte](1, 2, 3), 3L)
    intercept[IllegalArgumentException](Multimodal.ImageCodec.decode(junk))
  }

  test("q_image_stats: real decode end to end over generated assets") {
    val df = Multimodal.qImageStats(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 32) // ≤ 2 formats × 16 widths
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Multimodal.imageAssets(spark, sf).count())
  }

  test("decode runs partition-wise (mapPartitions, not per-row collect)") {
    val a = Multimodal.assets(spark, sf).repartition(3)
    val parts = Multimodal.extractFeatures(a).rdd.getNumPartitions
    assert(parts == 3) // decode preserved partitioning: no driver round-trip
  }
}
