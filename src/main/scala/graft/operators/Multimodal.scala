package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with a typed metadata struct —
  * the Spark-side schema, partitioning, and batched kernel shape are real and
  * tested; the codec itself is a clearly-marked deterministic STUB because no
  * image/audio library ships in this offline container (the reference ran
  * InceptionV3 offline the same way — one .npy per image, imagess/
  * dir_image.py:94-152 — features joined back as a column).
  */
object Multimodal {

  case class MediaRow(id: Long, media: Array[Byte], mime: String,
                      width: Int, height: Int)
  case class MediaFeatures(id: Long, dim: Int, features: Array[Float])

  /** Attach a media column derived from text bytes (fixture-side helper:
    * stands in for reading real image bytes from the lake). */
  def withFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("image/fake").as("mime"),
      (pmod(xxhash64(col(idCol)), lit(640)) + 64).cast("int").as("width"),
      (pmod(xxhash64(col(idCol), lit(1)), lit(480)) + 64).cast("int").as("height"))

  /** ==== STUB ==== deterministic fake of the decode→resize→CNN-embed step.
    * Real deployments swap this body for an actual codec + model runtime;
    * everything around it (schema, batching, partitioning) is production
    * shape. Features are a content hash folded into `dim` floats, so tests
    * can assert determinism and join behavior. */
  def stubDecodeEmbed(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= (h << 13); h ^= (h >>> 7); h ^= (h << 17)
      out(j) = (h.toDouble / 9.223372036854776e18).toFloat
      j += 1
    }
    out
  }

  /** Batched feature extraction over the media column: one kernel invocation
    * per partition iterator (the `tf.data` batch analog, dir_image.py:117-119),
    * emitting a fixed-dim embedding per row. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => MediaFeatures(id, dim, stubDecodeEmbed(bytes, dim)) }
      }
  }

  /** Frame-sampling stub for video-like payloads: deterministic byte-range
    * slices standing in for decoded frames; the explode/partition plumbing
    * is the real shape. */
  def sampleFrames(media: DataFrame, everyNBytes: Int = 64): DataFrame =
    media.select(col("id"), posexplode(split(base64(col("media")), s"(?<=\\G.{$everyNBytes})")))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_b64")
}
