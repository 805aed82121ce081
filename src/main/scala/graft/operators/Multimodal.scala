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

  /** First base64 data-URI image payload embedded in an html byte column
    * (the web-native media carrier) as decoded bytes; empty binary when the
    * page embeds no image. Pure codegen expression chain — no UDF. */
  def dataUriPayload(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unbase64(regexp_extract(decode(html, "UTF-8"),
      "data:image/[a-zA-Z]+;base64,([A-Za-z0-9+/=]+)", 1))

  /** html → pooled image feature vector for the ER scorer (M9): extract the
    * embedded image, block-average-pool it to `dim` centered floats
    * (graft.functions.Similarity.avgPool). The reference feeds precomputed
    * per-image CNN features through the same dense head as text features
    * (deeper_models.py:603-655, projection :627-630); this is that column,
    * with the CNN replaced by the deterministic pooling featurizer (no
    * image runtime ships offline — kernel swap is one line in a real
    * deployment, the plumbing and fusion are the product). Empty array when
    * the page has no image (the scorer zero-gates image features on it). */
  def imageVecFromHtml(html: org.apache.spark.sql.Column, dim: Int = 32): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.avg_pool_embed(dataUriPayload(html), dim)

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
    * shape. Features are the md5 digest of the content mapped to `dim`
    * floats in [0,1) (byte k / 256 — a power-of-two divisor, so the float
    * is exact and a SQL oracle recomputes it bit-for-bit:
    * `('0x'||substr(md5(x),1,2))::INT / 256.0` is feature 0). Digests chain
    * (md5 of md5) for dim > 16. */
  def stubDecodeEmbed(bytes: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var digest = md.digest(bytes)
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      if (j > 0 && j % 16 == 0) digest = md.digest(digest)
      out(j) = (digest(j % 16) & 0xFF) / 256.0f
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
