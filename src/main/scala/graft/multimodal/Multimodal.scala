package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for a training-data pipeline:
  * media travels as an opaque `BINARY` column plus a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-wise batch transforms (`mapPartitions` — the Scala analog
  * of `mapInPandas`: iterator in, iterator out, nothing on the driver,
  * arbitrary native-lib calls inside).
  *
  * Image decode/resize are REAL: `javax.imageio.ImageIO` (JDK
  * built-in, headless-safe) parses/re-encodes actual PNG/JPEG bytes.
  * Audio decode is REAL for WAV/AIFF/AU: `javax.sound.sampled
  * .AudioSystem` (also JDK built-in) parses the container and yields
  * sample rate / channels / frame count. Video METADATA is REAL for
  * AVI: a pure-JDK RIFF walk ([[readAvi]]) reads width / height /
  * frame count / frame rate from the `avih` header (public format,
  * no codec needed), and per-frame pixel decode is REAL for
  * uncompressed-DIB AVI ([[readAviFrames]]). Media outside those
  * codecs (compressed video, corrupt bytes) yields NULL output plus a
  * typed `decode_error` column — never fabricated values — so the
  * plumbing (schema, batch shape, partitioning, downstream joins,
  * dead-letter routing) is real end to end; swapping in ffmpeg/javacv
  * turns error rows into decoded rows without any schema change.
  *
  * Scale notes: each transform is narrow (no shuffle); media bytes
  * never leave their partition, and decoded outputs drop the `content`
  * column as early as possible so downstream stages shuffle metadata +
  * features, not pixels.
  */
object Multimodal {

  // ImageIO's default stream cache is DISK-backed: every
  // `ImageIO.read`/`write` call creates, fills and deletes a temp
  // FILE (FileCacheImageInputStream) just to buffer bytes that are
  // already in memory here (content arrives as byte arrays). One
  // static opt-out switches every decode in this JVM to the in-memory
  // cache — pure I/O plumbing, decoded pixels identical. Runs once
  // per executor JVM when the object loads.
  javax.imageio.ImageIO.setUseCache(false)

  /** Canonical media-table schema: (id, media_type, content, meta). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),   // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType),
      StructField("n_frames", IntegerType))))))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("ok", BooleanType),
    // typed decode failure: NULL on success, "no_codec" when the
    // container is recognized but no JDK codec can decode it
    // (compressed video), "unrecognized" for bytes no reader claims
    StructField("decode_error", StringType)))

  /** Real image parse: null for bytes no installed ImageIO reader
    * understands (also null input / truncated streams).
    */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null || bytes.length < 4) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }

  private case class AudioInfo(sampleRate: Int, channels: Int, frames: Long) {
    def durationMs: Long =
      if (sampleRate > 0 && frames >= 0) frames * 1000L / sampleRate else -1L
  }

  /** Real audio parse (WAV/AIFF/AU — the JDK's built-in containers):
    * header + frame count via `AudioSystem`, no full PCM materialize.
    * null for anything the installed readers don't understand.
    */
  private def readAudio(bytes: Array[Byte]): AudioInfo =
    if (bytes == null || bytes.length < 12) null
    else
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try AudioInfo(ais.getFormat.getSampleRate.toInt,
          ais.getFormat.getChannels, ais.getFrameLength)
        finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }

  private[multimodal] case class VideoInfo(width: Int, height: Int,
      nFrames: Int, usPerFrame: Long) {
    def durationMs: Long = nFrames.toLong * usPerFrame / 1000L
  }

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Real AVI metadata parse: walk the RIFF chunk tree (public
    * format — 'RIFF'/'AVI ' magic, LIST 'hdrl', 'avih' main header)
    * and read dwWidth / dwHeight / dwTotalFrames / dwMicroSecPerFrame
    * as little-endian u32s. Pure JDK byte parsing, no codec. Null for
    * anything that is not a well-formed AVI.
    */
  private[multimodal] def readAvi(bytes: Array[Byte]): VideoInfo = {
    if (bytes == null || bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
      fourcc(bytes, 8) != "AVI ") return null
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = fourcc(bytes, off)
      val sz = u32(bytes, off + 4).toInt
      if (sz < 0) return null // u32 overflow: not a sane chunk
      if (id == "LIST" && off + 12 <= bytes.length &&
        fourcc(bytes, off + 8) == "hdrl") {
        var in = off + 12
        val end = math.min(off + 8L + sz, bytes.length.toLong).toInt
        while (in + 8 <= end) {
          val csz = u32(bytes, in + 4).toInt
          if (csz < 0) return null
          if (fourcc(bytes, in) == "avih" && csz >= 40 &&
            in + 8 + 40 <= bytes.length) {
            val base = in + 8
            return VideoInfo(u32(bytes, base + 32).toInt,
              u32(bytes, base + 36).toInt, u32(bytes, base + 16).toInt,
              u32(bytes, base))
          }
          in += 8 + csz + (csz & 1)
        }
        return null // hdrl list without an avih header
      }
      off += 8 + sz + (sz & 1)
    }
    null
  }

  /** Decode pass: binary -> dimensions/validity. Batch-shaped
    * partition-wise transform; output drops `content`.
    *
    * Images decode for real (ImageIO: PNG/JPEG/GIF/BMP); audio decodes
    * for real (AudioSystem: WAV/AIFF/AU — sample rate, channels,
    * duration); AVI video metadata parses for real ([[readAvi]]:
    * width, height, duration from frame count x frame rate). Media no
    * JDK codec can decode (compressed video containers, truncated or
    * corrupt bytes) comes back `ok = false` with a TYPED
    * `decode_error` — never fabricated metadata — so a pipeline can
    * route failures to a dead-letter path and audit them by reason.
    */
  def decode(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "media_type", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val typ = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val img = readImage(bytes)
        lazy val au = readAudio(bytes)
        lazy val avi = readAvi(bytes)
        if (img != null)
          Row(id, typ, img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents, null, null, true, null)
        else if (au != null)
          Row(id, typ, null, null, au.channels, au.sampleRate,
            au.durationMs, true, null)
        else if (avi != null)
          Row(id, typ, avi.width, avi.height, null, null,
            avi.durationMs, true, null)
        else if (typ == "video" && bytes != null && bytes.length >= 4)
          // a recognized video row whose container isn't JDK-decodable
          // (e.g. MP4/H.264): typed no_codec error, no fabricated dims
          Row(id, typ, null, null, null, null, null, false, "no_codec")
        else Row(id, typ, null, null, null, null, null, false,
          "unrecognized")
      }
    }(enc)
  }

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual fingerprint for image near-dup detection (resize to
    * 9×8 grayscale, emit one bit per horizontal neighbor comparison).
    * The downsample here is an explicit block average over a 9×8 grid
    * (ITU-R 601 luma), NOT platform image scaling — `Image.getScaledInstance`
    * interpolation differs across JDKs/platforms, and a fingerprint
    * that isn't bit-reproducible cannot be stored in an index. All
    * arithmetic is integer/double with no transcendentals, so the hash
    * is a pure function of the pixel data on any JVM.
    */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val lum = Array.ofDim[Double](gh, gw)
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        val y0 = gy * h / gh; val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
        var s = 0.0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        lum(gy)(gx) = s / n
        gx += 1
      }
      gy += 1
    }
    var bits = 0L; var i = 0
    gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        if (lum(gy)(gx) < lum(gy)(gx + 1)) bits |= 1L << i
        i += 1; gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Per-row dHash over a media table's image rows: (media_id, dhash),
    * undecodable rows dropped. A narrow partition-wise transform — the
    * binary column never shuffles; downstream near-dup joins see only
    * 16 bytes per image. The fingerprint store this emits is the
    * image-side twin of [[graft.operators.Dedup.simHash]]'s text store.
    */
  def imageDHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType))))
    media.select("media_id", "content").mapPartitions { it =>
      it.flatMap { r =>
        val img = readImage(r.getAs[Array[Byte]](1))
        if (img == null) Iterator.empty
        else Iterator.single(Row(r.getLong(0), dHash64(img)))
      }
    }(enc)
  }

  private def l2(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
    if (n > 0) { var j = 0; while (j < v.length) { v(j) /= n; j += 1 } }
    v
  }

  /** Real image features: luminance histogram over the DECODED pixels
    * (ITU-R 601 luma weights), `dim` buckets, L2-normalized — content
    * features, invariant to the container encoding.
    */
  private def imageFeatures(img: java.awt.image.BufferedImage,
      dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        v(lum * dim / 256) += 1f
        x += 1
      }
      y += 1
    }
    l2(v)
  }

  /** Real audio features: RMS energy envelope over the DECODED 16-bit
    * PCM stream — `dim` equal-length temporal segments, L2-normalized.
    * Null when the container decodes to something other than 16-bit PCM.
    */
  private def audioFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return null
        val pcm = ais.readAllBytes()
        val nSamples = pcm.length / 2
        if (nSamples == 0) return null
        val acc = new Array[Double](dim)
        val cnt = new Array[Int](dim)
        var i = 0
        while (i < nSamples) {
          val s =
            if (fmt.isBigEndian) ((pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xff)).toShort
            else ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort
          val seg = (i.toLong * dim / nSamples).toInt
          acc(seg) += s.toDouble * s; cnt(seg) += 1
          i += 1
        }
        l2(Array.tabulate(dim)(j =>
          if (cnt(j) > 0) math.sqrt(acc(j) / cnt(j)).toFloat else 0f))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => null
      case _: java.io.IOException => null
    }
  }

  /** Feature extraction: binary -> fixed-dim Float embedding, ready for
    * [[graft.operators.Similarity]] / [[graft.operators.Dedup]] ops.
    *
    * Decodable media gets REAL content features — images: luminance
    * histogram over decoded pixels; audio: per-segment RMS energy over
    * decoded PCM; uncompressed-AVI video: luminance histogram over the
    * DECODED stored frames ([[readAviFrames]]) — so the vectors depend
    * on the content, not the container bytes. Media with no
    * JDK-decodable codec (compressed video, corrupt bytes) gets a NULL
    * embedding and a typed `decode_error` instead of a fabricated
    * byte-histogram vector: a fake vector would silently pollute every
    * downstream ANN/dedup index, while a typed error filters in one
    * `WHERE decode_error IS NULL`. A real deployment routes the error
    * rows to a learned encoder or a dead-letter table.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("decode_error", StringType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("media_id", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val img = readImage(bytes)
        lazy val au =
          if (bytes == null || bytes.length < 12) null
          else audioFeatures(bytes, dim)
        lazy val vid = videoFeatures(bytes, dim)
        if (img != null) Row(r.getLong(0), imageFeatures(img, dim).toSeq, null)
        else if (au != null) Row(r.getLong(0), au.toSeq, null)
        else if (vid != null) Row(r.getLong(0), vid.toSeq, null)
        else if (readAvi(bytes) != null)
          // container decoded but holds zero stored frames — content
          // is absent, not undecodable
          Row(r.getLong(0), null, "no_frames")
        else Row(r.getLong(0), null, "no_codec")
      }
    }(enc)
  }

  /** Image resize: partition-wise binary->binary transform; metadata
    * updated in lockstep. Decodable images are really scaled
    * (Graphics2D bilinear) and re-encoded as PNG; non-decodable bytes
    * come back with NULL content and a typed `decode_error` (same
    * contract as [[decode]]/[[extractFeatures]] — no fabricated
    * output), so a resize stage can route failures without guessing.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("decode_error", StringType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("media_id", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val img = readImage(bytes)
        if (img != null) {
          val scaled = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", bos)
          Row(r.getLong(0), bos.toByteArray, w, h, null)
        } else Row(r.getLong(0), null, null, null, "no_codec")
      }
    }(enc)
  }

  /** Video frame sampling: one output row per sampled frame index —
    * pure Catalyst (posexplode over a sequence), no codec needed to
    * plan; the per-frame decode would plug into [[decode]] downstream.
    */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame =
    media
      .filter(col("media_type") === "video" && col("meta.n_frames").isNotNull)
      .select(col("media_id"), col("content"),
        posexplode(sequence(lit(0),
          greatest(col("meta.n_frames") - 1, lit(0)), lit(everyN))))
      .select(col("media_id"), col("pos").as("sample_idx"),
        col("col").as("frame_idx"))

  /** Deterministic real PNG bytes for a media id: a small RGB pattern
    * image (varied dimensions, pixels from a per-id hash) encoded with
    * ImageIO — actual decodable media for tests/bench.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 12 + (id % 9).toInt
    val h = 8 + (id % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var p = id * 6364136223846793005L + (y.toLong * w + x) * 1442695040888963407L
        p ^= p >>> 32
        img.setRGB(x, y, (p & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic real PNG with PLANTED near-duplicates: ids sharing
    * `id div 3` render the same smooth per-base luminance field (two
    * StrictMath sinusoids, frequencies/phases from the base hash), and
    * the variant (`id mod 3`) stamps at most one small dark square —
    * a localized retouch that moves only the few dHash bits whose grid
    * cells it touches. Distinct bases get independent fields, so their
    * fingerprints differ in ~half the bits. StrictMath (not Math)
    * keeps the pixels — and therefore the hash — bit-identical on any
    * JVM.
    */
  def syntheticPngNear(id: Long): Array[Byte] = {
    val base = id / 3; val variant = (id % 3).toInt
    var hsh = base * 6364136223846793005L + 1442695040888963407L
    hsh ^= hsh >>> 32
    val w = 18; val h = 16
    // three independent sinusoids (x, y, diagonal), frequencies 1..8
    // and 256-step phases all drawn from the base hash: 512 frequency
    // combinations × fine phases decorrelate distinct bases' dHashes
    // (measured: two-sinusoid/4-frequency fields left cross-base
    // hammings low enough that chance pairs swamped the planted ones)
    val fx = 1 + (hsh & 7).toInt
    val fy = 1 + ((hsh >>> 3) & 7).toInt
    val fd = 1 + ((hsh >>> 6) & 7).toInt
    val p1 = ((hsh >>> 9) & 255).toInt / 255.0 * 2 * StrictMath.PI
    val p2 = ((hsh >>> 17) & 255).toInt / 255.0 * 2 * StrictMath.PI
    val p3 = ((hsh >>> 25) & 255).toInt / 255.0 * 2 * StrictMath.PI
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // per-(base, 2×2 block) pseudo-noise at the dHash grid
        // resolution: the sinusoid family alone has ~2^9 frequency
        // combinations, so at 10^4+ bases many pairs land near-
        // identical fields and chance pairs grow quadratically
        // (measured at the 10× probe); ±32 gray levels of base-keyed
        // block noise give every base ~72 independent identity bits
        // while staying far below the ±120 retouch signal
        var nz = (base * 0x9E3779B97F4A7C15L) ^
          ((x / 2).toLong * 0xC2B2AE3D27D4EB4FL) ^
          ((y / 2).toLong * 0x165667B19E3779F9L)
        nz *= 0xFF51AFD7ED558CCDL; nz ^= nz >>> 33
        val v0 = 128 +
          45 * StrictMath.sin(2 * StrictMath.PI * fx * x / w + p1) +
          35 * StrictMath.cos(2 * StrictMath.PI * fy * y / h + p2) +
          25 * StrictMath.sin(2 * StrictMath.PI * fd * (x + y) / (w + h) + p3) +
          ((nz & 63) - 32) // uniform block offset in [-32, 31]
        val inSquare = variant match {
          case 1 => x >= 3 && x < 5 && y >= 3 && y < 5
          case 2 => x >= 12 && x < 14 && y >= 9 && y < 11
          case _ => false
        }
        val v = math.max(0, math.min(255,
          (if (inSquare) v0 - 120 else v0).toInt))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image-only media table over the doc ids with [[syntheticPngNear]]
    * content — the fixture for perceptual-hash dedup (every 3 ids form
    * a planted near-dup group).
    */
  def syntheticNearDupImages(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r => Row(r.getLong(0), syntheticPngNear(r.getLong(0))) }
    }(enc)
  }

  /** Deterministic real WAV bytes for a media id: 16-bit mono PCM at
    * 8 kHz, sample values from a per-id hash, encoded through the JDK's
    * own WAVE writer — actual decodable audio for tests/bench.
    * Frame count = 400 + (id % 50) * 40, so duration is a pure function
    * of id (50..295 ms).
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val sampleRate = 8000f
    val nFrames = 400 + (id % 50).toInt * 40
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      var p = id * 6364136223846793005L + i * 1442695040888963407L
      p ^= p >>> 32
      val s = (p & 0xffff).toInt - 0x8000 // signed 16-bit
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 64-bit energy-envelope fingerprint of a decoded audio clip — the
    * audio twin of [[dHash64]]: the PCM stream splits into 65 equal
    * windows, each window's energy is an exact integer Σ s² (16-bit
    * samples: ≤2^30 per sample, no overflow below 2^33 samples per
    * window), and bit i compares window i against window i+1. The
    * envelope shape survives uniform gain/codec-level noise while
    * localized edits move only the bits whose windows they touch —
    * the property a near-dup index needs. Returns null for bytes no
    * audio reader decodes (or non-16-bit formats / clips shorter than
    * one sample per window).
    */
  def audioHash64(bytes: Array[Byte]): java.lang.Long = {
    val info = try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val data = ais.readAllBytes()
      ais.close()
      if (fmt.getSampleSizeInBits != 16) null
      else (data, fmt.getChannels, fmt.isBigEndian)
    } catch { case _: Exception => null }
    if (info == null) return null
    val (data, ch, big) = info
    val windows = 65
    val nSamples = data.length / 2 / ch
    if (nSamples < windows) return null
    val energies = new Array[Long](windows)
    var i = 0
    while (i < nSamples) {
      val w = math.min(windows - 1, (i.toLong * windows / nSamples).toInt)
      val off = i * 2 * ch // first channel of each frame
      val s =
        if (big) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
        else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
      energies(w) += s.toLong * s
      i += 1
    }
    var bits = 0L; var b = 0
    while (b < 64) {
      if (energies(b) < energies(b + 1)) bits |= 1L << b
      b += 1
    }
    bits
  }

  /** Per-row audio fingerprint over a media table: (media_id, ahash),
    * undecodable rows dropped — same narrow no-shuffle shape as
    * [[imageDHash]], same downstream
    * [[graft.operators.Dedup.fingerprintPairs]] join.
    */
  def audioDHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType),
      StructField("ahash", LongType))))
    media.select("media_id", "content").mapPartitions { it =>
      it.flatMap { r =>
        val h = audioHash64(r.getAs[Array[Byte]](1))
        if (h == null) Iterator.empty
        else Iterator.single(Row(r.getLong(0), h.longValue))
      }
    }(enc)
  }

  /** Deterministic real WAV with PLANTED near-duplicates — the audio
    * sibling of [[syntheticPngNear]]: ids sharing `id div 3` carry the
    * same per-window random-amplitude envelope (the fingerprint's
    * signal), and the variant (`id mod 3`) boosts the amplitude of two
    * specific windows 4× (a localized edit: energy 16×, moving only
    * the envelope comparisons at those windows' boundaries). All
    * sample values are integer hash arithmetic — bit-identical on any
    * JVM.
    */
  def syntheticWavNear(id: Long): Array[Byte] = {
    val base = id / 3; val variant = (id % 3).toInt
    val windows = 65; val perWin = 32
    val n = windows * perWin
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val w = i / perWin
      // two large odd multipliers: base*A + w*B collides across bases
      // only under an exact 64-bit relation (a small multiplier like 31
      // made adjacent bases share shifted window streams — measured as
      // quadratic chance-pair growth at the 10× probe)
      var hw = base * 0x9E3779B97F4A7C15L + w * 0xC2B2AE3D27D4EB4FL
      hw *= 0xFF51AFD7ED558CCDL; hw ^= hw >>> 32
      var amp = 500 + (hw & 4095).toInt
      val boosted = variant match {
        case 1 => w == 10 || w == 11
        case 2 => w == 40 || w == 41
        case _ => false
      }
      if (boosted) amp *= 4
      var hi = base * 0x165667B19E3779F9L + i * 0x27D4EB2F165667C5L
      hi *= 0x9E3779B97F4A7C15L; hi ^= hi >>> 32
      val s = (((hi & Long.MaxValue) % (2L * amp + 1)) - amp).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio-only media table over the doc ids with [[syntheticWavNear]]
    * content (every 3 ids form a planted near-dup group).
    */
  def syntheticNearDupAudio(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r => Row(r.getLong(0), syntheticWavNear(r.getLong(0))) }
    }(enc)
  }

  /** How many frames [[syntheticAvi]] actually stores in its 'movi'
    * list (a short clip: real files are often truncated relative to
    * dwTotalFrames, and storing all 50 would bloat the fixture corpus).
    */
  val SyntheticAviStoredFrames = 6

  /** Deterministic real AVI bytes for a media id: a RIFF/'AVI '
    * container with a LIST 'hdrl' / 'avih' main header whose width /
    * height / frame count / frame rate are pure functions of the id
    * (25 fps; n_frames = id % 50, matching the synthetic meta column),
    * PLUS a LIST 'movi' carrying min(n_frames, 6) REAL uncompressed
    * 24-bit DIB frames ('00db' chunks, bottom-up BGR rows padded to
    * 4-byte stride — the public uncompressed-AVI layout). Pixel values
    * are a pure function of (x, y, frame, id), so frame content is
    * deterministic and frame-varying for feature tests.
    */
  def syntheticAvi(id: Long): Array[Byte] = {
    val w = 32 + (id % 64).toInt
    val h = 24 + (id % 48).toInt
    val nf = (id % 50).toInt
    val stored = math.min(nf, SyntheticAviStoredFrames)
    val stride = (w * 3 + 3) & ~3
    val frameBytes = stride * h
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val hdrlSize = 68 // 'hdrl' + ('avih' chunk header + 56-byte body)
    val moviSize = 4 + stored * (8 + frameBytes) // stride%4==0 => even
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)).putInt(riffSize)
      .put("AVI ".getBytes(ascii))
    bb.put("LIST".getBytes(ascii)).putInt(hdrlSize)
      .put("hdrl".getBytes(ascii))
    bb.put("avih".getBytes(ascii)).putInt(56)
    bb.putInt(40000) // dwMicroSecPerFrame: 25 fps
      .putInt(0).putInt(0).putInt(0)
      .putInt(nf) // dwTotalFrames
      .putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put("LIST".getBytes(ascii)).putInt(moviSize)
      .put("movi".getBytes(ascii))
    var f = 0
    while (f < stored) {
      bb.put("00db".getBytes(ascii)).putInt(frameBytes)
      var row = h - 1 // DIB rows are bottom-up
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val v = ((x + 2 * row + 11 * f + id) % 256).toByte
          bb.put(v).put(v).put(v) // gray: B = G = R
          x += 1
        }
        var pad = stride - w * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        row -= 1
      }
      f += 1
    }
    bb.array()
  }

  /** Shot/scene segmentation over uncompressed AVI video: decode every
    * stored frame (RIFF walk + DIB pixels), fingerprint each with the
    * same [[dHash64]] kernel the image path uses, and declare a CUT
    * wherever consecutive frames' hamming distance exceeds
    * `cutHamming` — the shot-boundary step a video training pipeline
    * runs before sampling frames per shot. A narrow partition-wise
    * pass: video bytes never shuffle; only (id, n_frames, n_cuts,
    * first_cut) scalars leave the scan. `first_cut` is the index of
    * the first frame that starts a new shot, −1 when single-shot.
    */
  /** Decode every stored AVI frame (RIFF walk + DIB pixels) and
    * fingerprint each with [[dHash64]] — the shared front half of
    * [[sceneCuts]] and [[shotSignatures]]. Empty for undecodable
    * bytes.
    */
  private def aviFrameHashes(bytes: Array[Byte]): Seq[Long] = {
    val avi = readAvi(bytes)
    val frames = readAviFrames(bytes)
    if (avi == null || frames.isEmpty) return Nil
    val stride = (avi.width * 3 + 3) & ~3
    frames.map { fb =>
      val img = new java.awt.image.BufferedImage(avi.width,
        avi.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < avi.height) {
        val ro = (avi.height - 1 - y) * stride // DIB bottom-up
        var x = 0
        while (x < avi.width) {
          val b = fb(ro + 3 * x) & 0xff
          val g = fb(ro + 3 * x + 1) & 0xff
          val rr = fb(ro + 3 * x + 2) & 0xff
          img.setRGB(x, y, (rr << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      dHash64(img)
    }
  }

  def sceneCuts(media: DataFrame, cutHamming: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", LongType),
      StructField("n_cuts", LongType),
      StructField("first_cut", LongType))))
    media.select("media_id", "content").mapPartitions { it =>
      it.flatMap { r =>
        val hashes = aviFrameHashes(r.getAs[Array[Byte]](1))
        if (hashes.isEmpty) Iterator.empty
        else {
          var cuts = 0L; var first = -1L; var i = 1
          while (i < hashes.length) {
            if (java.lang.Long.bitCount(hashes(i - 1) ^ hashes(i)) >
                cutHamming) {
              cuts += 1; if (first < 0) first = i
            }
            i += 1
          }
          Iterator.single(Row(r.getLong(0), hashes.length.toLong, cuts,
            first))
        }
      }
    }(enc)
  }

  /** Per-shot representative fingerprints over uncompressed AVI: the
    * [[sceneCuts]] boundary pass, but instead of counting cuts each
    * shot contributes its FIRST frame's dHash — the video-level
    * signature a near-dup pipeline indexes. Rows out:
    * `(media_id, shot_idx, shot_hash)` — a narrow partition-wise
    * decode; video bytes never shuffle, 24 bytes leave per shot.
    */
  def shotSignatures(media: DataFrame, cutHamming: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType),
      StructField("shot_idx", LongType),
      StructField("shot_hash", LongType))))
    media.select("media_id", "content").mapPartitions { it =>
      it.flatMap { r =>
        val hashes = aviFrameHashes(r.getAs[Array[Byte]](1))
        if (hashes.isEmpty) Iterator.empty
        else {
          val reps = scala.collection.mutable.ArrayBuffer(hashes.head)
          var i = 1
          while (i < hashes.length) {
            if (java.lang.Long.bitCount(hashes(i - 1) ^ hashes(i)) >
                cutHamming) reps += hashes(i)
            i += 1
          }
          reps.zipWithIndex.iterator.map { case (h, idx) =>
            Row(r.getLong(0), idx.toLong, h)
          }
        }
      }
    }(enc)
  }

  /** Video-level perceptual near-dup pairs (the video axis of the
    * image/audio/text dedup matrix): two videos pair when ≥
    * `minShared` of their shots match within `maxHamming` dHash bits.
    * Shots pair by CONTENT, not index, so a TRIMMED copy (missing
    * leading shots) still aligns; a RE-ENCODED copy matches through
    * the Hamming budget. Candidates come from a pigeonhole band join
    * — the 64-bit shot hash splits into `maxHamming + 1` bands, so
    * any pair within budget shares at least one intact band (FULL
    * recall, the q48 guarantee) and the plan is bucketed, never
    * all-pairs: shuffle rows are (band, value) integers, candidate
    * volume rides real collisions.
    */
  def videoNearDupPairs(sigs: DataFrame, maxHamming: Int = 7,
      minShared: Long = 3L): DataFrame = {
    val bands = maxHamming + 1
    require(64 % bands == 0,
      s"maxHamming + 1 must divide 64, got $bands bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val banded = sigs.select(col("media_id"), col("shot_idx"),
        col("shot_hash"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("shot_hash"), b * width)
              .bitwiseAND(lit(mask)).as("bv"))): _*)).as("bk"))
      .select(col("media_id"), col("shot_idx"), col("shot_hash"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    val a = banded.select(col("media_id").as("id_a"),
      col("shot_idx").as("shot_a"), col("shot_hash").as("hash_a"),
      col("band"), col("bv"))
    val b = banded.select(col("media_id").as("id_b"),
      col("shot_idx").as("shot_b"), col("shot_hash").as("hash_b"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("shot_a"), col("hash_a"),
        col("id_b"), col("shot_b"), col("hash_b"))
      .distinct() // a pair can collide in several bands — once only
      .filter(expr(s"bit_count(hash_a ^ hash_b) <= $maxHamming"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("shot_a")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("id_a"), col("id_b"))
  }

  /** Deterministic uncompressed AVI with a PLANTED scene cut: 6 stored
    * 18×16 frames; frames before index `1 + id mod 4` render scene 0's
    * block pattern, the rest scene 1's (independent hash fields →
    * consecutive cross-scene frames differ in ~half their dHash bits,
    * within-scene frames are identical). The cut position is a pure
    * function of the id — the closed-form oracle of the q278 query.
    */
  def syntheticAviScenes(id: Long): Array[Byte] = {
    val w = 18; val h = 16; val nf = 6
    val cut = 1 + (id % 4).toInt
    val stride = (w * 3 + 3) & ~3
    val frameBytes = stride * h
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val hdrlSize = 68
    val moviSize = 4 + nf * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)).putInt(riffSize)
      .put("AVI ".getBytes(ascii))
    bb.put("LIST".getBytes(ascii)).putInt(hdrlSize)
      .put("hdrl".getBytes(ascii))
    bb.put("avih".getBytes(ascii)).putInt(56)
    bb.putInt(40000).putInt(0).putInt(0).putInt(0)
      .putInt(nf).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put("LIST".getBytes(ascii)).putInt(moviSize)
      .put("movi".getBytes(ascii))
    var f = 0
    while (f < nf) {
      bb.put("00db".getBytes(ascii)).putInt(frameBytes)
      val scene = if (f < cut) 0L else 1L
      var row = h - 1
      while (row >= 0) {
        var x = 0
        while (x < w) {
          var nz = (id * 2 + scene) * 0x9E3779B97F4A7C15L ^
            ((x / 2).toLong * 0xC2B2AE3D27D4EB4FL) ^
            ((row / 2).toLong * 0x165667B19E3779F9L)
          nz *= 0xFF51AFD7ED558CCDL; nz ^= nz >>> 33
          val v = (nz & 255).toByte
          bb.put(v).put(v).put(v)
          x += 1
        }
        var pad = stride - w * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        row -= 1
      }
      f += 1
    }
    bb.array()
  }

  /** Uncompressed AVI from per-frame grayscale fields (row-major,
    * top-down; written bottom-up with DIB stride padding) — the shared
    * writer behind the planted-fixture generators.
    */
  private def aviFromGray(frames: Seq[Array[Int]], w: Int,
      h: Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val frameBytes = stride * h
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val hdrlSize = 68
    val moviSize = 4 + frames.size * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)).putInt(riffSize)
      .put("AVI ".getBytes(ascii))
    bb.put("LIST".getBytes(ascii)).putInt(hdrlSize)
      .put("hdrl".getBytes(ascii))
    bb.put("avih".getBytes(ascii)).putInt(56) // 14 dwords follow
      .putInt(40000).putInt(0).putInt(0).putInt(0)
      .putInt(frames.size).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put("LIST".getBytes(ascii)).putInt(moviSize)
      .put("movi".getBytes(ascii))
    frames.foreach { g =>
      bb.put("00db".getBytes(ascii)).putInt(frameBytes)
      var row = h - 1 // DIB rows are bottom-up
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val v = g(row * w + x).toByte
          bb.put(v).put(v).put(v) // gray: B = G = R
          x += 1
        }
        var pad = stride - w * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        row -= 1
      }
    }
    bb.array()
  }

  /** The per-shot luminance field: a sinusoid family plus dHash-grid
    * block noise, keyed per SHOT. Unlike [[syntheticPngNear]]'s mix,
    * the NOISE is the dominant term (±64 against 25/18/12 sinusoid
    * amplitudes): at high drawn frequencies a sinusoid-dominated
    * field degenerates to its periodic sign pattern and two keys
    * sharing a frequency bucket land within a few dHash bits
    * (measured: cross-group collisions at 5k videos) — iid per-cell
    * noise keeps every key ~32 independent bits. The range
    * 128 ± 119 never clamps, so no saturation plateaus either.
    */
  private def shotField(key: Long, w: Int, h: Int): Array[Int] = {
    var hsh = key * 6364136223846793005L + 1442695040888963407L
    hsh ^= hsh >>> 32
    val fx = 1 + (hsh & 7).toInt
    val fy = 1 + ((hsh >>> 3) & 7).toInt
    val fd = 1 + ((hsh >>> 6) & 7).toInt
    val p1 = ((hsh >>> 9) & 255).toInt / 255.0 * 2 * StrictMath.PI
    val p2 = ((hsh >>> 17) & 255).toInt / 255.0 * 2 * StrictMath.PI
    val p3 = ((hsh >>> 25) & 255).toInt / 255.0 * 2 * StrictMath.PI
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var nz = (key * 0x9E3779B97F4A7C15L) ^
          ((x / 2).toLong * 0xC2B2AE3D27D4EB4FL) ^
          ((y / 2).toLong * 0x165667B19E3779F9L)
        nz *= 0xFF51AFD7ED558CCDL; nz ^= nz >>> 33
        val v0 = 128 +
          25 * StrictMath.sin(2 * StrictMath.PI * fx * x / w + p1) +
          18 * StrictMath.cos(2 * StrictMath.PI * fy * y / h + p2) +
          12 * StrictMath.sin(2 * StrictMath.PI * fd * (x + y) / (w + h) + p3) +
          ((nz & 127) - 64)
        out(y * w + x) = math.max(0, math.min(255, v0.toInt))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Deterministic uncompressed AVI with PLANTED video-level
    * near-duplicates: ids sharing `id div 3` render the same four
    * per-(group, shot) fields, two frames per shot. Variant 0 is the
    * original; variant 1 is a TRIMMED copy (the first shot cut —
    * shots shift, content survives); variant 2 is a RE-ENCODED copy
    * (per-id ±1 pixel noise — the few dHash bits a lossy round-trip
    * moves). Distinct groups get independent fields, so their shot
    * hashes differ in ~half the bits.
    */
  def syntheticAviNearDup(id: Long): Array[Byte] = {
    val group = id / 3; val variant = (id % 3).toInt
    val w = 18; val h = 16
    val shots = if (variant == 1) 1 to 3 else 0 to 3
    val frames = shots.flatMap { s =>
      val base = shotField(group * 0x100000001B3L + s, w, h)
      val g =
        if (variant != 2) base
        else base.zipWithIndex.map { case (v, i) =>
          var nz = (id * 0xD6E8FEB86659FD93L) ^
            (i.toLong * 0xA0761D6478BD642FL)
          nz ^= nz >>> 32
          math.max(0, math.min(255, v + (((nz & 1) << 1) - 1).toInt)) // ±1
        }
      Seq(g, g) // two identical frames per shot
    }
    aviFromGray(frames, w, h)
  }

  /** Video-only media table with [[syntheticAviNearDup]] content —
    * the fixture for video-level perceptual dedup (every 3 ids form a
    * planted original/trimmed/re-encoded group).
    */
  def syntheticNearDupVideos(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r => Row(r.getLong(0), syntheticAviNearDup(r.getLong(0))) }
    }(enc)
  }

  /** Video-only media table with [[syntheticAviScenes]] content. */
  def syntheticSceneVideos(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r => Row(r.getLong(0), syntheticAviScenes(r.getLong(0))) }
    }(enc)
  }

  /** REAL per-frame video decode for uncompressed AVI: walks the RIFF
    * 'movi' list and returns each '00db'/'00dc' chunk's raw DIB
    * payload (bottom-up BGR, 4-byte-aligned stride — interpret with
    * [[readAvi]]'s width/height). Empty for AVIs without stored frames
    * or non-AVI bytes. Pure JDK byte parsing of the public format.
    */
  def readAviFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
      fourcc(bytes, 8) != "AVI ") return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 12
    while (off + 8 <= bytes.length) {
      val sz = u32(bytes, off + 4).toInt
      if (sz < 0) return out.toSeq
      if (fourcc(bytes, off) == "LIST" && sz >= 4 &&
        off + 12 <= bytes.length && fourcc(bytes, off + 8) == "movi") {
        var in = off + 12
        val end = math.min(off + 8 + sz, bytes.length)
        while (in + 8 <= end) {
          val csz = u32(bytes, in + 4).toInt
          if (csz < 0 || in + 8 + csz > bytes.length) return out.toSeq
          val cc = fourcc(bytes, in)
          if (cc == "00db" || cc == "00dc")
            out += java.util.Arrays.copyOfRange(bytes, in + 8, in + 8 + csz)
          in += 8 + csz + (csz & 1)
        }
      }
      off += 8 + sz + (sz & 1)
    }
    out.toSeq
  }

  /** Real video features: luminance histogram over the DECODED frame
    * pixels of an uncompressed AVI (same luma weights and bucketing as
    * [[imageFeatures]], accumulated across every stored frame). Null
    * when the bytes aren't an AVI with stored frames.
    */
  private def videoFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val avi = readAvi(bytes)
    if (avi == null) return null
    val frames = readAviFrames(bytes)
    if (frames.isEmpty) return null
    val stride = (avi.width * 3 + 3) & ~3
    val v = new Array[Float](dim)
    frames.foreach { fr =>
      var row = 0
      while (row < avi.height && (row + 1) * stride <= fr.length) {
        var x = 0
        while (x < avi.width) {
          val base = row * stride + x * 3
          val lum = ((fr(base + 2) & 0xff) * 299 + (fr(base + 1) & 0xff) * 587 +
            (fr(base) & 0xff) * 114) / 1000
          v(lum * dim / 256) += 1f
          x += 1
        }
        row += 1
      }
    }
    l2(v)
  }

  /** Synthesizes a deterministic media table from the documents table —
    * the test/bench corpus. Image rows carry REAL PNG bytes
    * ([[syntheticPng]]), audio rows REAL WAV bytes ([[syntheticWav]]),
    * video rows REAL AVI header bytes ([[syntheticAvi]] — metadata
    * parseable, frames absent).
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id"), col("text"), col("n_chars"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val typ = Seq("image", "audio", "video")((id % 3).toInt)
          val content = typ match {
            case "image" => syntheticPng(id)
            case "audio" => syntheticWav(id)
            case _ => syntheticAvi(id)
          }
          val durMs =
            if (typ == "audio") (400 + (id % 50) * 40) * 1000L / 8000L
            else (id % 50) * 40L // video: n_frames at 25 fps
          Row(id, typ, content,
            Row(null, null, null, 8000, durMs, (id % 50).toInt))
        }
      }(enc)
  }
}
