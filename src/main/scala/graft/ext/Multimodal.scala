package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * plus a typed metadata struct, with decode / feature-extract / resize /
  * frame-sample stages. The Spark-side machinery — schema contracts,
  * per-partition batch iteration (the Scala analog of `mapInPandas`
  * batches), partition sizing, column pruning before the heavy stage — is
  * real and tested; the actual codecs are STUBBED with deterministic fakes
  * (image/audio libraries are not in this container), each clearly marked.
  *
  * At 100 TB: binary payloads never shuffle — decode/featurize are
  * narrow (mapPartitions) stages; only extracted features (fixed-width
  * arrays) and metadata flow into joins/aggregations downstream.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a text corpus as a fake media corpus: payload = UTF-8 bytes.
    * Stands in for `spark.read.format("binaryFile")` at test scale.
    */
  def asMedia(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("media_id"),
                encode(col(textCol), "UTF-8").as("payload"))

  // ---- STUB codec ------------------------------------------------------
  // A real deployment plugs libjpeg/ffmpeg here; the fake derives metadata
  // and pixels deterministically from the payload so the pipeline is
  // testable end-to-end (and oracle-expressible: width/height/channels are
  // closed-form in n_bytes).
  private[ext] def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    val width = (n % 512) + 1
    val height = (n / 512) + 1
    (width, height, 3)
  }

  /** Decode stage: binary → metadata struct. mapPartitions so a real codec
    * amortizes per-partition init (model load, JNI context) exactly like a
    * `mapInPandas` batch fn would.
    */
  def decode(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(media.schema.fields :+
      StructField("meta", mediaMetaType))
    val idx = media.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(schema)
    media.mapPartitions { it =>
      // per-partition init happens here (codec context in the real impl)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val (w, h, c) = fakeDecode(bytes) // STUB: real codec goes here
        Row.fromSeq(r.toSeq :+ Row(w, h, c, bytes.length.toLong))
      }
    }
  }

  /** Resize stage: metadata-only transform (real impl rewrites pixels);
    * pure expressions — stays in codegen.
    */
  def resize(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("meta.width"), col("meta.height")).cast("double"))
    decoded.withColumn("meta", struct(
      ceil(col("meta.width") * scale).cast("int").as("width"),
      ceil(col("meta.height") * scale).cast("int").as("height"),
      col("meta.channels").as("channels"),
      col("meta.n_bytes").as("n_bytes")))
  }

  /** Frame sampling for "video" payloads: every strideBytes-th window marks
    * a frame; emits (media_id, frame_no, frame_bytes). Real impl seeks
    * keyframes; the batch shape (one row in → n frame rows out, payload
    * chunked not copied whole) is the load-bearing part.
    */
  def sampleFrames(media: DataFrame, strideBytes: Int = 64,
                   payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val pIdx = media.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(outSchema)
    media.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        (0 until math.max(1, bytes.length / strideBytes)).iterator.map { f =>
          // STUB: real impl decodes the keyframe at this offset
          val start = f * strideBytes
          val end = math.min(bytes.length, start + strideBytes)
          Row(id, f, java.util.Arrays.copyOfRange(bytes, start, end))
        }
      }
    }
  }

  /** Feature extraction: payload → fixed-width float vector. STUB derives
    * features from byte histograms (deterministic); real impl runs a vision
    * encoder per partition-batch. Output feeds Similarity.* directly.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = media.schema.fieldIndex("media_id")
    val pIdx = media.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(schema)
    media.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        // STUB: byte-bucket histogram normalized by length
        val hist = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) {
          hist(((bytes(i) & 0xff) * dim) / 256) += 1f
          i += 1
        }
        val n = math.max(1, bytes.length).toFloat
        Row(r.getLong(idIdx), hist.map(_ / n).toSeq)
      }
    }
  }
}
