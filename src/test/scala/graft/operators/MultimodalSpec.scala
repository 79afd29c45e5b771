package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def media(): org.apache.spark.sql.DataFrame = {
    val rows = Seq(
      Row("img1", "image", Row(4, 4, 1, 0, 0), Array.tabulate[Byte](16)(i => i.toByte)),
      Row("img2", "image", Row(2, 2, 1, 0, 0), Array[Byte](10, 20, 30, 40)),
      Row("vid1", "video", Row(8, 8, 3, 0, 10), Array[Byte](1, 2, 3)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("featurize: deterministic raw-gray fallback, batched mapPartitions") {
    val f = Multimodal.featurize(spark, media()).collect()
      .map(r => r.media_id -> r).toMap
    assert(f("img1").n_bytes == 16)
    // img1 pixels = 0..15 → mean 7.5
    assert(math.abs(f("img1").mean - 7.5) < 1e-9)
    assert(f("img1").embedding.sum === 1.0f) // normalized histogram
    assert(f("img2").mean === 25.0)
    // deterministic: same input → same features
    val again = Multimodal.featurize(spark, media()).collect()
      .map(r => r.media_id -> r).toMap
    assert(again("img1").std === f("img1").std)
  }

  test("resize halves an image with nearest sampling") {
    val out = Multimodal.resize(spark, media().filter("media_id = 'img1'"), 2, 2)
      .collect().head
    assert(out.getAs[Int]("width") == 2 && out.getAs[Int]("height") == 2)
    val bm = graft.raster.Bitmap.fromBytes(
      out.getAs[Array[Byte]]("payload"), 2, 2, 1, graft.core.DType.UInt8)
    // nearest of 4×4 ramp at (0.5,0.5)·2 → pixel (1,1) = 5
    assert(bm.get(0, 0, 0) == 5.0)
  }

  test("real PNG payloads decode through ImageIO: featurize + resize") {
    // a real 8×8 grayscale PNG with a left-dark / right-bright split
    val samples = Array.tabulate(64)(i => if (i % 8 < 4) 10.0 else 250.0)
    val png = MediaCodec.encodePng(8, 8, 1, samples)
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val rows = Seq(Row("png1", "image", Row(8, 8, 1, 0, 0), png))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)

    val f = Multimodal.featurize(spark, df).collect().head
    assert(f.width == 8 && f.height == 8) // decoded dims, not metadata echo
    assert(math.abs(f.mean - 130.0) < 1e-9) // (10+250)/2
    assert(math.abs(f.embedding(0) - 0.5f) < 1e-6) // bucket 0 = the 10s
    assert(math.abs(f.embedding(15) - 0.5f) < 1e-6) // bucket 15 = the 250s

    val out = Multimodal.resize(spark, df, 4, 4).collect().head
    assert(out.getAs[String]("format") == "png")
    val dec = MediaCodec.decodeImage(out.getAs[Array[Byte]]("payload")).get
    assert(dec._1 == 4 && dec._2 == 4)
    val px = dec._4
    assert(px(0) == 10.0 && px(3) == 250.0) // split survives the resize
  }

  test("real WAV payloads decode through javax.sound") {
    // 8-bit unsigned mono PCM ramp in a WAV container
    val pcm = Array.tabulate[Byte](64)(i => (i * 4).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val (rate, ch, bits, samples) = MediaCodec.decodeAudio(wav).get
    assert(rate == 8000 && ch == 1 && bits == 8)
    assert(samples.toSeq == pcm.map(b => (b & 0xff).toDouble).toSeq)

    // the featurize path takes the audio branch on the container bytes
    val rows = Seq(Row("wav1", "audio", Row(0, 0, 1, 8000, 0), wav))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val f = Multimodal.featurize(spark, df).collect().head
    assert(math.abs(f.mean - samples.sum / samples.length) < 1e-9)
  }

  test("sampleFrames is metadata-only frame explosion") {
    val frames = Multimodal.sampleFrames(media(), everyK = 3).collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[String]("media_id") == "vid1"))
  }

  test("sampleFrames: zero-frame videos drop instead of crashing sequence()") {
    val rows = Seq(Row("vid0", "video", Row(4, 4, 1, 0, 0), Array[Byte](1)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    // n_frames = 0 → sequence(0, -1) would throw; the row must drop
    assert(Multimodal.sampleFrames(df, everyK = 2).count() == 0)
    assertThrows[IllegalArgumentException](Multimodal.sampleFrames(df, everyK = 0))
  }

  test("featurize: zero-sample audio reports 0-stats, never NaN") {
    val emptyWav = MediaCodec.encodeWavPcm8(8000, Array.empty[Byte])
    val rows = Seq(Row("wav0", "audio", Row(0, 0, 1, 8000, 0), emptyWav))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val f = Multimodal.featurize(spark, df).collect().head
    assert(f.mean == 0.0 && f.std == 0.0)
    assert(f.embedding.forall(!_.isNaN))
  }

  /** A 4×4 five-frame MJPEG AVI: frame f is a JPEG of constant gray
    * 40·f + 20. */
  private def mjpegAvi(): Array[Byte] = {
    val frames = (0 until 5).map(f =>
      MediaCodec.encodeJpeg(4, 4, 1, Array.fill(16)(40.0 * f + 20)))
    MediaCodec.encodeMjpegAvi(4, 4, fps = 10, frames)
  }

  test("MJPEG AVI round trip: encode → parse header + frames → decode pixels") {
    val avi = mjpegAvi()
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    val v = MediaCodec.decodeAvi(avi).get
    assert(v.width == 4 && v.height == 4 && v.nFrames == 5)
    assert(v.microSecPerFrame == 100000)
    assert(v.frames.size == 5)
    // every frame decodes as a JPEG through the image path; constant-gray
    // frames survive JPEG compression exactly (single DC coefficient)
    val decoded = v.frames.map(f => MediaCodec.decodeImage(f).get)
    assert(decoded.forall { case (w, h, _, _) => w == 4 && h == 4 })
    val means = decoded.map(_._4).map(px => px.sum / px.length)
    assert(means.zipWithIndex.forall { case (m, f) => math.abs(m - (40 * f + 20)) <= 2 })
    // garbage is rejected, not misparsed
    assert(MediaCodec.decodeAvi(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodec.decodeAvi("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("video featurize + decodeFrames run the real MJPEG path") {
    val avi = mjpegAvi()
    val rows = Seq(Row("v1", "video", Row(4, 4, 3, 0, 5), avi))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    // featurize: stats from the DECODED first frame (gray 20), not raw bytes
    val f = Multimodal.featurize(spark, df).collect().head
    assert(f.width == 4 && f.height == 4)
    assert(math.abs(f.mean - 20.0) <= 2)
    // frame extraction: every 2nd frame as standalone JPEG payloads
    val frames = Multimodal.decodeFrames(spark, df, everyK = 2).collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2, 4))
    val f2 = frames(1).getAs[Array[Byte]]("payload")
    val (w2, _, _, px2) = MediaCodec.decodeImage(f2).get
    assert(w2 == 4 && math.abs(px2.sum / px2.length - 100.0) <= 2)
  }

  test("empty payload: raw-gray fallback reports 0-stats, never divides by zero") {
    assert(MediaCodec.rawGray(Array.emptyByteArray, 4).toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    val rows = Seq(Row("e1", "image", Row(2, 2, 1, 0, 0), Array.emptyByteArray))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val f = Multimodal.featurize(spark, df).collect().head
    assert(f.mean == 0.0 && f.std == 0.0)
  }

  test("16-bit gray PNG: resize rescales instead of whiting out; histogram spreads") {
    // a 16-bit gradient: TYPE_USHORT_GRAY, samples 0..65535
    val im = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val raster = im.getRaster
    for (y <- 0 until 16; x <- 0 until 16)
      raster.setSample(x, y, 0, (y * 16 + x) * 257) // 0..65535 spread
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val png16 = bos.toByteArray
    val (_, _, _, bits, _) = MediaCodec.decodeImageWithDepth(png16).get
    assert(bits == 16)
    // resize: the old depth-ignoring path clamped nearly every pixel to
    // 255 (all-white); rescaled, the gradient survives
    val rows = Seq(Row("g16", "image", Row(16, 16, 1, 0, 0), png16))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val out = Multimodal.resize(spark, df, 8, 8).collect().head
    val (_, _, _, outPx) = MediaCodec.decodeImage(
      out.getAs[Array[Byte]]("payload")).get
    assert(outPx.min < 32 && outPx.max > 223) // gradient, not all-white
    assert(outPx.distinct.length > 8)
    // featurize: histogram buckets by the 16-bit range — the uniform
    // gradient spreads across (nearly) all 16 buckets instead of
    // collapsing into bucket 15
    val f = Multimodal.featurize(spark, df).collect().head
    assert(f.embedding.count(_ > 0f) >= 12)
    assert(f.embedding.max < 0.5f)
  }
}
