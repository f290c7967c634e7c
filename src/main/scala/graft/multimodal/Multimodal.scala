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
