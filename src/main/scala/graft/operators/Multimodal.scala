package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (builder prompt):
  * image/audio/video as opaque `binary` columns with typed metadata
  * structs; decode / feature-extract / resize / frame-sample implemented
  * as `mapPartitions` over typed rows so each task touches one batch of
  * payloads (the Scala analog of `mapInPandas` batches).
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): `FakeCodec` derives deterministic pixels/samples from the
  * payload bytes. Every Spark-side concern — schema, binary payload
  * transport, per-partition batching, metadata pushdown (payload column
  * pruned unless needed) — is real and tested; swap `FakeCodec` for a real
  * decoder (e.g. TwelveMonkeys/JavaCV) without touching the plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType), StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))), nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  final case class MediaRow(
      media_id: String, kind: String,
      width: Int, height: Int, channels: Int, sample_rate: Int, n_frames: Int,
      payload: Array[Byte])

  final case class Features(
      media_id: String, kind: String,
      n_bytes: Long, width: Int, height: Int,
      mean: Double, std: Double, embedding: Seq[Float])

  /** STUB codec — deterministic fake decode, clearly marked. A real
    * deployment replaces exactly this object. */
  object FakeCodec {
    /** "Decode" payload → per-pixel/sample values (deterministic from
      * bytes; byte i of the payload cycles through the raster). */
    def decode(payload: Array[Byte], n: Int): Array[Double] = {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = (payload(i % payload.length) & 0xff).toDouble
        i += 1
      }
      out
    }
  }

  /** Feature extraction over batches: one partition = one batch of
    * payloads decoded together (the mapInPandas batch shape). Emits basic
    * stats + a 16-d embedding (mean of byte histogram buckets). */
  def featurize(spark: SparkSession, media: DataFrame): Dataset[Features] = {
    import spark.implicits._
    media.select(
        col("media_id"), col("kind"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"), col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val n = math.max(1, r.width * r.height)
          val px = FakeCodec.decode(r.payload, n)
          val mean = px.sum / px.length
          val std = math.sqrt(px.map(v => (v - mean) * (v - mean)).sum / px.length)
          val hist = new Array[Float](16)
          px.foreach(v => hist((v / 16).toInt.min(15)) += 1f)
          val total = px.length.toFloat
          Features(r.media_id, r.kind, r.payload.length.toLong,
            r.width, r.height, mean, std, hist.map(_ / total).toSeq)
        }
      }
  }

  /** Image resize (nearest) over the stubbed decode — returns new payload
    * bytes + updated metadata. The resample loop is the real kernel from
    * graft.raster; only the codec is fake. */
  def resize(spark: SparkSession, media: DataFrame, outW: Int, outH: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"), col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val src = new graft.raster.Bitmap(r.width, r.height, 1,
            graft.core.DType.UInt8, FakeCodec.decode(r.payload, r.width * r.height))
          val out = new Array[Double](outW * outH)
          var y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              val sx = (x + 0.5) * r.width / outW
              val sy = (y + 0.5) * r.height / outH
              out(y * outW + x) = graft.raster.Sampler.near(src, 0, sx, sy, Double.NaN)
              x += 1
            }
            y += 1
          }
          val bytes = new graft.raster.Bitmap(outW, outH, 1,
            graft.core.DType.UInt8, out).toBytes
          (r.media_id, r.kind, outW, outH, bytes)
        }
      }
      .toDF("media_id", "kind", "width", "height", "payload")
  }

  /** Video frame sampling: every k-th frame index (metadata-only — no
    * payload scan; Catalyst prunes the binary column from the read). */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames").as("n_frames"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
}
