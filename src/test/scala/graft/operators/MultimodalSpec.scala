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

  test("featurize: deterministic stub decode, batched mapPartitions") {
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

  test("sampleFrames is metadata-only frame explosion") {
    val frames = Multimodal.sampleFrames(media(), everyK = 3).collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[String]("media_id") == "vid1"))
  }
}
