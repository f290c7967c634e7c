package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata structs, processed by batched partition-level
  * decoders (the Scala analog of `mapInPandas` — one iterator pass per
  * partition, vectorizable batch shape).
  *
  * The actual codec calls are STUBBED (this container ships no image/audio
  * libraries): [[decodeImageStub]] derives deterministic fake metadata from
  * the bytes. The Spark-side plumbing — binary schema, partition batching,
  * output struct shape, deterministic partitioning — is real and tested;
  * swap `decodeBytes` for a JNI/javacv call in production.
  */
object Multimodal {

  /** Metadata produced per blob by the (stubbed) decoder. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("first_byte", IntegerType),
    StructField("last_byte", IntegerType),
    StructField("n_frames", LongType)))

  /** STUB decode: in production this is the image/audio codec; here the
    * metadata is a deterministic function of the raw bytes so tests and
    * oracles can verify the plumbing end-to-end. "Frames" are 256-byte
    * chunks (the video frame-sampling analog).
    */
  def decodeBytes(bytes: Array[Byte]): (Long, Int, Int, Long) = {
    val len = bytes.length.toLong
    val first = if (bytes.nonEmpty) bytes(0) & 0xff else -1
    val last = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else -1
    val frames = (len + 255) / 256
    (len, first, last, frames)
  }

  /** Decode a binary column to a metadata struct via one batched partition
    * pass. `idCol` must be first in `df`; the binary column second.
    */
  def decodeImageStub(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.take(1) ++ MetaSchema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (len, first, last, frames) = decodeBytes(r.getAs[Array[Byte]](1))
        Row(r.get(0), len, first, last, frames)
      }
    }(Encoders.row(outSchema))
  }

  /** STUB resize: in production the image resampler; here a deterministic
    * byte decimation to `targetLen` (every ceil(len/target)-th byte) so the
    * blob→blob plumbing — binary in, smaller binary out, length contract —
    * is real and testable. Output replaces the binary column's content.
    */
  def resizeStub(df: DataFrame, idCol: String, binCol: String,
      targetLen: Int): DataFrame = {
    require(targetLen >= 1, "targetLen must be >= 1")
    val outSchema = StructType(Seq(df.schema(idCol),
      StructField("resized", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val step = math.max(1, math.ceil(bytes.length.toDouble / targetLen).toInt)
        val out = bytes.indices.collect {
          case i if i % step == 0 => bytes(i)
        }.take(targetLen).toArray
        Row(r.get(idIdx), out)
      }
    }(Encoders.row(outSchema))
  }

  /** STUB feature extraction: in production the embedding model; here the
    * 16-bin high-nibble byte histogram — a deterministic `Array[Float]`
    * whose shape (fixed-dim dense vector per blob) is exactly what the
    * ANN machinery ([[graft.text.Embeddings]]) consumes, so blob →
    * features → similarity search composes end-to-end today and only the
    * extractor body changes in production.
    */
  def featureExtractStub(df: DataFrame, idCol: String, binCol: String)
      : DataFrame = {
    val outSchema = StructType(Seq(df.schema(idCol),
      StructField("features", ArrayType(FloatType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val hist = new Array[Float](16)
        bytes.foreach(b => hist((b & 0xff) >> 4) += 1f)
        Row(r.get(idIdx), hist.toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling for "video" blobs: every nth 256-byte frame, exploded
    * to one row per sampled frame with its frame index.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      everyNth: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", LongType),
      StructField("frame", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val nFrames = (bytes.length + 255) / 256
        (0L until nFrames).filter(_ % everyNth == 0).map { i =>
          val from = (i * 256).toInt
          val until = math.min(from + 256, bytes.length)
          Row(r.get(idIdx), i, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
    }(Encoders.row(outSchema))
  }
}
