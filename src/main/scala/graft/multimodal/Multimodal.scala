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
  * The actual codec calls are STUBS — this container has no image/audio
  * libraries — marked `// STUB:` below with a deterministic fake so the
  * plumbing (schema, batch shape, partitioning, downstream joins) is
  * real and testable. Swapping in javacv/ffmpeg changes only the stub
  * bodies.
  *
  * Scale notes: each transform is narrow (no shuffle); media bytes
  * never leave their partition, and decoded outputs drop the `content`
  * column as early as possible so downstream stages shuffle metadata +
  * features, not pixels.
  */
object Multimodal {

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
    StructField("ok", BooleanType)))

  /** Decode pass: binary -> dimensions/validity. Batch-shaped
    * partition-wise transform; output drops `content`.
    */
  def decode(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "media_type", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val typ = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        // STUB: real impl calls an image codec (e.g. ImageIO/javacv).
        // Deterministic fake: dimensions derived from the byte content
        // so tests are stable and collisions meaningful.
        if (bytes == null || bytes.length < 4) Row(id, typ, null, null, null, false)
        else {
          val h = java.util.Arrays.hashCode(bytes)
          Row(id, typ, 16 + math.abs(h % 64), 16 + math.abs((h >> 8) % 64),
            1 + math.abs((h >> 16) % 4), true)
        }
      }
    }(enc)
  }

  /** Feature extraction: binary -> fixed-dim Float embedding, ready for
    * [[graft.operators.Similarity]] / [[graft.operators.Dedup]] ops.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val enc = RowEncoder.encoderFor(schema)
    media.select("media_id", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        // STUB: real impl runs a vision/audio encoder model here.
        // Deterministic fake: byte histogram folded into `dim` buckets,
        // L2-normalized — preserves "similar bytes => similar vectors".
        val v = new Array[Float](dim)
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) { v((bytes(i) & 0xff) % dim) += 1f; i += 1 }
          val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
          if (n > 0) { var j = 0; while (j < dim) { v(j) /= n; j += 1 } }
        }
        Row(r.getLong(0), v.toSeq)
      }
    }(enc)
  }

  /** Image resize: partition-wise binary->binary transform; metadata
    * updated in lockstep.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("media_id", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        // STUB: real impl decodes, scales, re-encodes. Fake: resample
        // bytes to w*h length deterministically.
        val out = new Array[Byte](w * h)
        if (bytes != null && bytes.nonEmpty) {
          var i = 0
          while (i < out.length) {
            out(i) = bytes((i.toLong * bytes.length / out.length).toInt); i += 1
          }
        }
        Row(r.getLong(0), out, w, h)
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

  /** Synthesizes a deterministic media table from the documents table —
    * the test/bench corpus (no real media in the container).
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val types = array(lit("image"), lit("audio"), lit("video"))
    docs.select(
      col("doc_id").as("media_id"),
      element_at(types, (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("channels"),
        lit(44100).as("sample_rate"),
        (col("n_chars") * 10).cast(LongType).as("duration_ms"),
        pmod(col("doc_id"), lit(50)).cast(IntegerType).as("n_frames")).as("meta"))
  }
}
