package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class MultimodalSpec extends SparkSpec {
  private lazy val media =
    Multimodal.syntheticMedia(Tables(spark, sf, "documents")).cache()

  test("synthetic media table matches the canonical schema") {
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(media.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(media.count() > 0)
  }

  test("decode emits dimensions per row, deterministic, content dropped") {
    val d = Multimodal.decode(media)
    assert(d.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "width", "height", "channels",
        "sample_rate", "duration_ms", "ok", "decode_error"))
    val rows = d.orderBy("media_id").collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.getBoolean(7)))
    val again = Multimodal.decode(media).orderBy("media_id").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("decode reads real WAV sample rate/duration via AudioSystem") {
    import scala.jdk.CollectionConverters._
    // an actual WAV fixture: 8 kHz mono 16-bit PCM, 1600 frames = 200 ms,
    // written with the JDK's own WAVE encoder
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](1600 * 2)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 1600L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "audio", bos.toByteArray)
    ).asJava, org.apache.spark.sql.types.StructType.fromDDL(
      "media_id BIGINT, media_type STRING, content BINARY"))
    val d = Multimodal.decode(df).collect().head
    assert(d.getInt(4) == 1, "mono => 1 channel")
    assert(d.getInt(5) == 8000, "sample rate from the actual header")
    assert(d.getLong(6) == 200L, "1600 frames at 8 kHz = 200 ms")
    assert(d.getBoolean(7))
    // the synthetic corpus's audio rows are real WAVs too: decoded
    // sample rate and duration match the generator, not a byte hash
    val audioRows = Multimodal.decode(
      media.filter(col("media_type") === "audio")).collect()
    assert(audioRows.nonEmpty)
    audioRows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(5) == 8000)
      assert(r.getLong(6) == (400 + (id % 50) * 40) * 1000L / 8000L)
      assert(r.getBoolean(7))
    }
  }

  test("decode reads real PNG dimensions via ImageIO") {
    import scala.jdk.CollectionConverters._
    // an actual PNG fixture, 23x7 RGB, built with the JDK encoder
    val img = new java.awt.image.BufferedImage(23, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "image", bos.toByteArray)
    ).asJava, org.apache.spark.sql.types.StructType.fromDDL(
      "media_id BIGINT, media_type STRING, content BINARY"))
    val d = Multimodal.decode(df).collect().head
    assert(d.getInt(2) == 23 && d.getInt(3) == 7)
    assert(d.getInt(4) == 3) // RGB components
    assert(d.getBoolean(7))
    // the synthetic corpus's image rows are real PNGs too: decoded
    // dimensions match the generator exactly, not a byte-hash fake
    val imgRows = Multimodal.decode(media.filter(col("media_type") === "image"))
      .collect()
    assert(imgRows.nonEmpty)
    imgRows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) == 12 + (id % 9).toInt)
      assert(r.getInt(3) == 8 + (id % 7).toInt)
    }
  }

  test("decode reads real AVI header metadata via RIFF parsing") {
    import scala.jdk.CollectionConverters._
    // id 7: 39x31, 7 frames at 25 fps = 280 ms — values must come from
    // the actual avih bytes, not from the id or a byte hash
    val bytes = Multimodal.syntheticAvi(7L)
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(7L, "video", bytes)
    ).asJava, org.apache.spark.sql.types.StructType.fromDDL(
      "media_id BIGINT, media_type STRING, content BINARY"))
    val d = Multimodal.decode(df).collect().head
    assert(d.getInt(2) == 39 && d.getInt(3) == 31, d)
    assert(d.getLong(6) == 280L, "7 frames x 40 ms")
    assert(d.getBoolean(7))
    // a hand-built AVI with different header values decodes to THOSE
    // values (proves the parser reads the bytes, not the generator)
    val custom = Multimodal.syntheticAvi(7L).clone()
    // dwWidth sits at offset 12+12+8+32 = 64 (little-endian)
    custom(64) = 123.toByte; custom(65) = 0; custom(66) = 0; custom(67) = 0
    val d2 = Multimodal.decode(spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(8L, "video", custom)
    ).asJava, df.schema)).collect().head
    assert(d2.getInt(2) == 123, d2)
    // corpus video rows parse to the generator's formulas
    val vids = Multimodal.decode(media.filter(col("media_type") === "video"))
      .collect()
    assert(vids.nonEmpty)
    vids.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) == 32 + (id % 64).toInt)
      assert(r.getInt(3) == 24 + (id % 48).toInt)
      assert(r.getLong(6) == (id % 50) * 40L)
    }
    // truncated/garbage RIFF: typed no_codec error, no fabricated dims
    val junk = "RIFFxxxxAVI garbage".getBytes
    val d3 = Multimodal.decode(spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(9L, "video", junk)
    ).asJava, df.schema)).collect().head
    assert(!d3.getBoolean(7) && d3.getString(8) == "no_codec")
    assert(d3.isNullAt(2) && d3.isNullAt(3))
  }

  test("decode flags undecodable content instead of failing") {
    import scala.jdk.CollectionConverters._
    val bad = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "image", Array[Byte](1, 2)),
      org.apache.spark.sql.Row(2L, "image", null)
    ).asJava, org.apache.spark.sql.types.StructType.fromDDL(
      "media_id BIGINT, media_type STRING, content BINARY"))
    val d = Multimodal.decode(bad).collect()
    assert(d.forall(!_.getBoolean(7)))
  }

  test("extractFeatures: fixed-dim L2-normalized vectors compose with ANN ops") {
    val all = Multimodal.extractFeatures(media, dim = 16)
    // content-less media (0-frame AVI, media_id % 50 == 0) is a typed
    // error row, never a fabricated vector
    val errs = all.filter(col("decode_error").isNotNull).collect()
    assert(errs.forall(r =>
      r.isNullAt(1) && r.getString(2) == "no_frames" && r.getLong(0) % 50 == 0))
    val f = all.filter(col("decode_error").isNull)
    val rows = f.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getSeq[Float](1).length == 16))
    val norms = f.select(
      graft.functions.VectorFunctions.normSq(col("embedding")).as("n"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    // composes with the similarity operator (identical docs -> sim 1)
    val top = graft.operators.Similarity.bruteForceTopK(
      f.filter(col("media_id") < 3), f, "media_id", "embedding", k = 2)
    assert(top.count() == 6)
  }

  test("extractFeatures: features come from decoded content, not bytes") {
    import scala.jdk.CollectionConverters._
    def png(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // silence for the first half, full-scale square wave for the second
    val pcm = new Array[Byte](1600 * 2)
    for (i <- 800 until 1600) {
      val s = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 1600L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "image", png(0x000000)),
      org.apache.spark.sql.Row(2L, "image", png(0xffffff)),
      org.apache.spark.sql.Row(3L, "audio", bos.toByteArray)
    ).asJava, org.apache.spark.sql.types.StructType.fromDDL(
      "media_id BIGINT, media_type STRING, content BINARY"))
    val f = Multimodal.extractFeatures(df, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // black image: all luminance mass in bucket 0; white: in bucket 15
    assert(math.abs(f(1L)(0) - 1f) < 1e-5 && f(1L).drop(1).forall(_ == 0f), f(1L))
    assert(math.abs(f(2L)(15) - 1f) < 1e-5 && f(2L).take(15).forall(_ == 0f), f(2L))
    // audio: energy envelope silent in the first 8 segments, flat-high after
    assert(f(3L).take(8).forall(_ < 1e-4), f(3L))
    assert(f(3L).drop(8).forall(x => math.abs(x - 1f / math.sqrt(8).toFloat) < 1e-3),
      f(3L))
  }

  test("resize really scales images; non-images get a typed decode_error") {
    val r = Multimodal.resize(media, 8, 4)
    // image rows: output is a real PNG that decodes to the new size
    val scaledImgs = Multimodal.decode(
      r.join(media.select(col("media_id"), col("media_type")), "media_id")
        .filter(col("media_type") === "image")
        .select(col("media_id"), col("media_type"), col("content")))
      .collect()
    assert(scaledImgs.nonEmpty)
    assert(scaledImgs.forall(x =>
      x.getBoolean(7) && x.getInt(2) == 8 && x.getInt(3) == 4))
    // non-image rows: NULL content + typed error, never fabricated bytes
    val other = r.join(media.select(col("media_id"), col("media_type")), "media_id")
      .filter(col("media_type") =!= "image").collect()
    assert(other.nonEmpty)
    assert(other.forall(x => x.isNullAt(1) && x.getString(4) == "no_codec"))
  }

  test("no-codec media: typed decode_error, never fabricated output") {
    import scala.jdk.CollectionConverters._
    // a compressed-video container (MP4 ftyp box — recognized shape,
    // no JDK codec) and a truncated PNG (header cut mid-IHDR)
    val mp4 = Array[Byte](0, 0, 0, 24, 'f', 't', 'y', 'p', 'i', 's', 'o',
      'm', 0, 0, 2, 0, 'i', 's', 'o', 'm', 'm', 'p', '4', '1')
    val png = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray.take(16)
    }
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "video", mp4),
      org.apache.spark.sql.Row(2L, "image", png)
    ).asJava, org.apache.spark.sql.types.StructType.fromDDL(
      "media_id BIGINT, media_type STRING, content BINARY"))
    val dec = Multimodal.decode(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // decode: ok=false, typed reason, NO fabricated dimensions
    assert(!dec(1L).getBoolean(7) && dec(1L).getString(8) == "no_codec")
    assert(dec(1L).isNullAt(2) && dec(1L).isNullAt(3))
    assert(!dec(2L).getBoolean(7) && dec(2L).getString(8) == "unrecognized")
    // features: NULL embedding + error, never a byte-histogram vector
    val feats = Multimodal.extractFeatures(df, dim = 16).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).isNullAt(1) && feats(1L).getString(2) == "no_codec")
    assert(feats(2L).isNullAt(1) && feats(2L).getString(2) == "no_codec")
    // resize: NULL content + error
    val rs = Multimodal.resize(df, 8, 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rs(1L).isNullAt(1) && rs(1L).getString(4) == "no_codec")
  }

  test("sampleFrames explodes every Nth frame for videos only") {
    val s = Multimodal.sampleFrames(media, everyN = 10)
    val byId = s.groupBy("media_id").agg(count(lit(1)).as("c"),
        max("frame_idx").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // media_id % 3 == 2 => video; n_frames = media_id % 50
    assert(byId.keySet.forall(_ % 3 == 2))
    val id = byId.keys.find(_ % 50 >= 21).get
    val nf = (id % 50).toInt
    assert(byId(id)._1 == (nf - 1) / 10 + 1) // frames 0,10,20...
  }

  test("readAviFrames decodes the stored DIB frames with real pixels") {
    val id = 8L // video id (8 % 3 == 2), nf = 8 > stored cap 6
    val bytes = Multimodal.syntheticAvi(id)
    val frames = Multimodal.readAviFrames(bytes)
    assert(frames.length == Multimodal.SyntheticAviStoredFrames)
    val w = 32 + (id % 64).toInt
    val h = 24 + (id % 48).toInt
    val stride = (w * 3 + 3) & ~3
    assert(frames.forall(_.length == stride * h))
    // pixel (x=0, y=h-1, frame 0) sits at the START of the bottom-up
    // DIB payload; value = (x + 2*row + 11*f + id) % 256
    val want = ((2 * (h - 1) + id) % 256).toByte
    assert(frames.head(0) == want && frames.head(1) == want &&
      frames.head(2) == want)
    // frame content varies with the frame index
    assert(!java.util.Arrays.equals(frames.head, frames(1)))
    // non-AVI bytes decode to no frames, no exception
    assert(Multimodal.readAviFrames("not avi".getBytes).isEmpty)
    assert(Multimodal.readAviFrames(null).isEmpty)
  }

  test("video features come from decoded frame pixels, not container bytes") {
    import spark.implicits._
    // two videos with different ids => different frame content => the
    // luminance histograms must differ; same id => identical features
    val media = Seq(
      (2L, "video", Multimodal.syntheticAvi(2L)),
      (5L, "video", Multimodal.syntheticAvi(5L)),
      (102L, "video", Multimodal.syntheticAvi(2L))
    ).toDF("media_id", "media_type", "content")
    val vecs = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs(2L) == vecs(102L), "same bytes must embed identically")
    assert(vecs(2L) != vecs(5L), "different frames must embed differently")
    // gray ramp pixels spread across buckets: more than one bucket hit
    assert(vecs(2L).count(_ > 0f) > 1)
    // L2-normalized
    assert(math.abs(vecs(2L).map(x => x * x.toDouble).sum - 1.0) < 1e-5)
  }

  test("dHash: identical images collide, retouches stay near, bases differ") {
    import graft.operators.Dedup
    val n = 60L // 20 planted triples
    val docs = spark.range(n).select(col("id").as("doc_id"))
    val imgs = Multimodal.syntheticNearDupImages(docs).cache()
    assert(imgs.count() == n)
    val hashes = Multimodal.imageDHash(imgs).cache()
    assert(hashes.count() == n) // every PNG decodes
    val hm = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same id -> same bytes -> same hash (bit-reproducible kernel)
    val again = Multimodal.imageDHash(imgs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hm == again)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // planted retouches move few bits; independent bases move many
    val within = for (b <- 0L until n / 3; i <- 0 to 1; j <- i + 1 to 2)
      yield ham(hm(3 * b + i), hm(3 * b + j))
    assert(within.max <= 6, s"within-base hamming up to ${within.max}")
    val across = for (b <- 0L until n / 3 - 1)
      yield ham(hm(3 * b), hm(3 * (b + 1)))
    assert(across.count(_ > 6) > across.size * 3 / 4,
      s"cross-base hammings unexpectedly low: $across")
    // banded pair finder == brute force at the same threshold
    val got = Dedup.fingerprintPairs(hashes, "media_id", "dhash", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      a <- 0L until n; b <- a + 1 until n
      d = ham(hm(a), hm(b)) if d <= 6
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
    // and the planted triples are all found
    assert((for (b <- 0L until n / 3; i <- 0 to 1; j <- i + 1 to 2)
      yield (3 * b + i, 3 * b + j)).forall(p =>
        want.exists(t => t._1 == p._1 && t._2 == p._2)))
  }

  test("audio fingerprint: envelope edits stay near, bases differ, pairs exact") {
    import graft.operators.Dedup
    val n = 60L
    val docs = spark.range(n).select(col("id").as("doc_id"))
    val wavs = Multimodal.syntheticNearDupAudio(docs).cache()
    val hashes = Multimodal.audioDHash(wavs).cache()
    assert(hashes.count() == n) // every WAV decodes
    val hm = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val within = for (b <- 0L until n / 3; i <- 0 to 1; j <- i + 1 to 2)
      yield ham(hm(3 * b + i), hm(3 * b + j))
    assert(within.max <= 6, s"within-base hamming up to ${within.max}")
    val across = for (b <- 0L until n / 3 - 1)
      yield ham(hm(3 * b), hm(3 * (b + 1)))
    assert(across.count(_ > 6) > across.size * 3 / 4,
      s"cross-base hammings unexpectedly low: $across")
    // a gain-only change must NOT register as an edit: halving every
    // sample scales all window energies by ~1/4 uniformly, preserving
    // the envelope ordering (the invariance claim in the scaladoc)
    val b0 = Multimodal.syntheticWavNear(0L)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b0))
    val pcm = ais.readAllBytes(); ais.close()
    var i = 0
    while (i < pcm.length) {
      val s = (((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort / 2).toShort
      pcm(i) = (s & 0xff).toByte; pcm(i + 1) = ((s >> 8) & 0xff).toByte
      i += 2
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val quiet = {
      val a2 = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(a2,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val quietHash = Multimodal.audioHash64(quiet)
    assert(quietHash != null && quietHash.longValue == hm(0L),
      "half-gain copy must fingerprint identically")
    val got = Dedup.fingerprintPairs(hashes, "media_id", "ahash", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      a <- 0L until n; b <- a + 1 until n
      d = ham(hm(a), hm(b)) if d <= 6
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
  }

  test("sceneCuts finds the planted shot boundary; single-shot video has none") {
    import spark.implicits._
    val docs = spark.range(24).select(col("id").as("doc_id"))
    val got = Multimodal.sceneCuts(
        Multimodal.syntheticSceneVideos(docs), cutHamming = 10)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 24)
    got.foreach { case (id, nf, cuts, first) =>
      assert(nf == 6L && cuts == 1L && first == 1 + id % 4, s"id=$id")
    }
    // a plain syntheticAvi clip: every frame shifts the gray ramp by a
    // constant (+11 per frame index) — a global brightness-style drift,
    // not a content change; the dHash envelope must call it ONE shot
    val single = Seq((7L, Multimodal.syntheticAvi(47L)))
      .toDF("media_id", "content")
    val s0 = Multimodal.sceneCuts(single, cutHamming = 10).collect().head
    assert(s0.getLong(2) == 0L && s0.getLong(3) == -1L,
      s"drifting single-shot clip must have no cuts: $s0")
  }

  test("video near-dup: banded pairs == brute force; trimmed and re-encoded copies pair") {
    import spark.implicits._
    val docs = spark.range(60).select(col("id").as("doc_id"))
    val media = Multimodal.syntheticNearDupVideos(docs)
    val sigDf = Multimodal.shotSignatures(media, cutHamming = 10)
    val sigs = sigDf.collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val byId = sigs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // the trim variant has one fewer shot than its siblings
    assert(byId(1L).length == byId(0L).length - 1)
    // brute force: count a-shots with ANY b-shot within the budget —
    // the exact semantics of the banded operator's countDistinct
    val ids = byId.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      shared = byId(a).count(ha =>
        byId(b).exists(hb => java.lang.Long.bitCount(ha ^ hb) <= 7))
      if shared >= 2
    } yield (a, b)).toSet
    val banded = Multimodal
      .videoNearDupPairs(sigDf, maxHamming = 7, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"banded != brute: extra=${banded -- brute} missing=${brute -- banded}")
    // every planted group pairs fully: original↔trimmed↔re-encoded
    val planted = (for {
      g <- 0L until 20L
      a <- 0 to 2; b <- 0 to 2 if a < b
    } yield (g * 3 + a, g * 3 + b)).toSet
    assert(banded == planted,
      s"extra=${banded -- planted} missing=${planted -- banded}")
    ()
  }
}
