package graft.operators

import graft.functions.BinaryFunctions
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column processing (north-star "multimodal columns"): media as
  * opaque binary columns with typed metadata, processed per-partition in
  * batches — the Scala analog of `mapInPandas`: one setup per partition
  * (codec tables, buffers), then a tight loop over rows, instead of
  * per-row UDF dispatch.
  *
  * Decode/feature-extract is REAL for JDK rasters (javax.imageio);
  * video/audio frame-sampling is a STUB — this environment ships no
  * av codecs — but the Spark-side plumbing (schema, partitioning, batch
  * shape, null-for-undecodable contract) is the production shape and is
  * what the tests pin down.
  */
object MultimodalOps {

  /** media row schema: content + mime + source key. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("mime", StringType),
    StructField("bytes", BinaryType)))

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** Decode + feature-extract a DataFrame of media rows, one partition at a
    * time. Undecodable rows (no codec / corrupt bytes) yield nulls in the
    * feature columns — errors are data, never exceptions. */
  def imageFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imageFeatureSchema)
    media.select("key", "bytes").mapPartitions { rows =>
      // per-partition setup happens HERE (once), not per row
      rows.map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val fmt = if (bytes == null) null else BinaryFunctions.sniffFormat(bytes)
        val img = fmt match {
          case "png" | "jpeg" | "gif" | "bmp" =>
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
          case _ => None
        }
        img match {
          case Some(i) =>
            var sum = 0.0
            val (w, h) = (i.getWidth, i.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = i.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) * 0.299 +
                  ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114)
                x += 1
              }
              y += 1
            }
            Row(key, fmt, w, h, sum / (w.toLong * h))
          case None => Row(key, fmt, null, null, null)
        }
      }
    }(enc).toDF()
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Video frame sampling — STUB: no av codec ships in this environment, so
    * frames are deterministic synthetic PNGs derived from (key, index).
    * The real implementation swaps ONLY the body of `fakeFrame`; schema,
    * fan-out shape (one row per sampled frame) and partitioning are final. */
  def sampleFrames(media: DataFrame, everyNth: Int, maxFrames: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    def fakeFrame(key: String, idx: Int): Array[Byte] =
      BinaryFunctions.syntheticPng(key.hashCode.toLong * 31 + idx, 16, 12)
    media.select("key", "bytes").flatMap { r =>
      val key = r.getString(0)
      (0 until maxFrames).map(i => Row(key, i * everyNth,
        fakeFrame(key, i * everyNth)))
    }(enc).toDF()
  }

  /** Embedding stub for media rows (the decode→embed path of a training
    * pipeline): a deterministic D-dim vector from the content hash, so the
    * similarity-search operators (SimilarityQueries) compose with media
    * inputs end to end. */
  def fakeEmbedding(media: DataFrame, dim: Int = 16): DataFrame =
    media.select(col("key"),
      array((0 until dim).map(j =>
        (pmod(xxhash64(col("bytes"), lit(j)), lit(1000)).cast("double")
          / 500.0 - 1.0)): _*).as("emb"))
}
