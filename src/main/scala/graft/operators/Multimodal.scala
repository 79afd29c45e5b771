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
  * Codecs are REAL and JDK-only ([[MediaCodec]]): PNG/JPEG/BMP/GIF via
  * javax.imageio, WAV/AU/AIFF PCM via javax.sound, and MJPEG-AVI video
  * via the RIFF parser (each frame chunk is a complete JPEG, which
  * ImageIO decodes — the one video codec a JDK-only engine can truly
  * decode; H.26x-family payloads still parse for metadata but fall back
  * to raw-gray for pixels). Payloads that are no known container use the
  * documented raw-gray interpretation (bytes = 8-bit samples of the
  * metadata-declared raster).
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

  /** Feature extraction over batches: one partition = one batch of
    * payloads decoded together (the mapInPandas batch shape). Emits basic
    * stats + a 16-d embedding (normalized 16-bucket histogram). Image and
    * audio containers decode for real; anything else is raw-gray. The
    * reported width/height are the DECODED dims when a container decodes
    * (metadata otherwise). */
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
          // (samples, w, h, bucketOffset, bucketDiv): the 16-bucket
          // histogram normalizes by the DECODED sample range, not a
          // hard-coded 0..255 — a 16-bit PNG (0..65535) would otherwise
          // clamp every pixel into bucket 15 and signed 16-bit audio
          // (−32768..32767) into buckets 0/15, collapsing the embedding
          // to ~1 bit and making near-dup detection match everything.
          // 8-bit paths keep offset 0 / div 16 — bit-identical to the
          // old v/16 bucketing (the DuckDB oracle's integer replay).
          val (px, w, h, bOff, bDiv) = r.kind match {
            case "image" => MediaCodec.decodeImageWithDepth(r.payload) match {
              case Some((dw, dh, _, bits, samples)) =>
                (samples, dw, dh, 0.0,
                  math.max(16.0, (1L << bits).toDouble / 16.0))
              case None =>
                val n = math.max(1, r.width * r.height)
                (MediaCodec.rawGray(r.payload, n), r.width, r.height, 0.0, 16.0)
            }
            case "audio" => MediaCodec.decodeAudio(r.payload) match {
              case Some((_, _, bits, samples)) =>
                if (bits <= 8) (samples, r.width, r.height, 0.0, 16.0)
                else (samples, r.width, r.height, // signed → shift to 0-based
                  (1L << (bits - 1)).toDouble, (1L << bits).toDouble / 16.0)
              case None =>
                (MediaCodec.rawGray(r.payload, math.max(1, r.payload.length)),
                  r.width, r.height, 0.0, 16.0)
            }
            case "video" =>
              // MJPEG-AVI: stats over the first decodable frame (JPEG
              // frames decode 8-bit)
              MediaCodec.decodeAvi(r.payload)
                .flatMap(v => v.frames.iterator.flatMap(MediaCodec.decodeImage)
                  .nextOption())
              match {
                case Some((dw, dh, _, samples)) => (samples, dw, dh, 0.0, 16.0)
                case None =>
                  val n = math.max(1, r.width * r.height)
                  (MediaCodec.rawGray(r.payload, n), r.width, r.height, 0.0, 16.0)
              }
            case _ =>
              val n = math.max(1, r.width * r.height)
              (MediaCodec.rawGray(r.payload, n), r.width, r.height, 0.0, 16.0)
          }
          // a decodable container can still carry ZERO samples (empty WAV
          // data chunk): report 0-stats, not NaNs that pass/fail every
          // downstream threshold silently
          val n = px.length
          val mean = if (n == 0) 0.0 else px.sum / n
          val std =
            if (n == 0) 0.0
            else math.sqrt(px.map(v => (v - mean) * (v - mean)).sum / n)
          val hist = new Array[Float](16)
          px.foreach(v =>
            hist(math.max(0, math.min(15, ((v + bOff) / bDiv).toInt))) += 1f)
          val total = math.max(1, n).toFloat
          Features(r.media_id, r.kind, r.payload.length.toLong,
            w, h, mean, std, hist.map(_ / total).toSeq)
        }
      }
  }

  /** Image resize (nearest) — the resample loop is the graft.raster
    * kernel. Real image containers decode via ImageIO, resize every
    * channel, and re-encode as PNG (`format = "png"`); raw-gray payloads
    * stay raw (`format = "raw-gray"`). */
  def resize(spark: SparkSession, media: DataFrame, outW: Int, outH: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"), col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          def resample(src: graft.raster.Bitmap): Array[Double] = {
            val ch = src.bands
            val out = new Array[Double](outW * outH * ch)
            var b = 0
            while (b < ch) {
              var y = 0
              while (y < outH) {
                var x = 0
                while (x < outW) {
                  val sx = (x + 0.5) * src.width / outW
                  val sy = (y + 0.5) * src.height / outH
                  out(b * outW * outH + y * outW + x) =
                    graft.raster.Sampler.near(src, b, sx, sy, Double.NaN)
                  x += 1
                }
                y += 1
              }
              b += 1
            }
            out
          }
          MediaCodec.decodeImageWithDepth(r.payload) match {
            case Some((w, h, ch, bits, samples0)) =>
              // encodePng clamps to 0..255: rescale deeper rasters first
              // (a 16-bit PNG decodes 0..65535 — unscaled, nearly every
              // pixel saturates and the output is all-white with no error)
              val samples =
                if (bits <= 8) samples0
                else {
                  val s = 255.0 / ((1L << bits) - 1).toDouble
                  samples0.map(_ * s)
                }
              val src = new graft.raster.Bitmap(w, h, ch,
                graft.core.DType.Float64, samples)
              (r.media_id, r.kind, outW, outH, "png",
                MediaCodec.encodePng(outW, outH, ch, resample(src)))
            case None =>
              // clamp unknown/zero metadata dims to 1 (featurize's guard):
              // a 0×0 source would make every sampled pixel NaN and ship
              // a garbage payload with no error
              val sw = math.max(1, r.width)
              val sh = math.max(1, r.height)
              val src = new graft.raster.Bitmap(sw, sh, 1,
                graft.core.DType.UInt8,
                MediaCodec.rawGray(r.payload, sw * sh))
              (r.media_id, r.kind, outW, outH, "raw-gray",
                new graft.raster.Bitmap(outW, outH, 1,
                  graft.core.DType.UInt8, resample(src)).toBytes)
          }
        }
      }
      .toDF("media_id", "kind", "width", "height", "format", "payload")
  }

  /** Video frame sampling: every k-th frame index (metadata-only — no
    * payload scan; Catalyst prunes the binary column from the read). */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame = {
    require(everyK >= 1, s"sample every $everyK frames")
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames").as("n_frames"))
      // n_frames = 0 (unknown/empty) has nothing to sample — and
      // sequence(0, -1) throws, the same Spark pitfall duplicateSpans
      // and wordGramList guard
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
  }

  /** Real frame EXTRACTION for MJPEG-AVI payloads: every k-th frame of
    * each video row, emitted as standalone JPEG payloads (frames are
    * complete JPEGs in the container — no re-encode, no decode on this
    * path; downstream image ops decode on demand). One task per batch of
    * videos, frames of one video stay on one executor. */
  def decodeFrames(spark: SparkSession, media: DataFrame, everyK: Int): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          MediaCodec.decodeAvi(payload).toSeq.flatMap { v =>
            v.frames.zipWithIndex.collect {
              case (jpeg, i) if i % everyK == 0 =>
                (id, i, v.width, v.height, "jpeg", jpeg)
            }
          }
        }
      }
      .toDF("media_id", "frame_idx", "width", "height", "format", "payload")
  }
}
