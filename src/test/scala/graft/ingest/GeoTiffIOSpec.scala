package graft.ingest

import graft.catalog.Catalog
import graft.core.DType
import graft.geo.{Affine, CRS}
import graft.raster.{Bitmap, GeoTiff}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GeoTiffIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val root: String = java.nio.file.Files.createTempDirectory("graft-tiffio").toString
  val cat: Catalog = Catalog(root)

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
    rm(new java.io.File(root))
  }

  test("import .tif files distributed, then export round-trips") {
    // write two 2-image stacks to disk
    val dir = java.nio.file.Files.createTempDirectory("tifs")
    for (f <- Seq("a", "b")) {
      val imgs = Seq(
        GeoTiff.Image(new Bitmap(2, 2, 1, DType.UInt8, Array(1, 2, 3, 4)),
          Affine.northUp(0, 2, 1, -1), CRS.WGS84),
        GeoTiff.Image(new Bitmap(2, 2, 1, DType.UInt8, Array(5, 6, 7, 8)),
          Affine.northUp(0, 2, 1, -1), CRS.WGS84))
      java.nio.file.Files.write(dir.resolve(s"$f.tif"), GeoTiff.write(imgs))
    }
    GeoTiffIO.importFiles(spark, cat, s"$dir/*.tif")
    val tiles = cat.read(spark, "tiles").collect()
    assert(tiles.length == 4) // 2 files × 2 subdirs
    assert(tiles.map(_.getAs[String]("subdir")).toSet == Set("GTIFF_DIR:1", "GTIFF_DIR:2"))
    assert(cat.read(spark, "containers").count() == 2)

    // export one container back to tif and compare pixels
    val uri = tiles.head.getAs[String]("container_uri")
    val bytes = GeoTiffIO.exportContainer(spark, cat, uri)
    val dirs = GeoTiff.read(bytes)
    assert(dirs.size == 2)
    assert(dirs.head.image.bitmap.pixels.toSeq == Seq(1.0, 2, 3, 4))
    assert(dirs(1).image.bitmap.pixels.toSeq == Seq(5.0, 6, 7, 8))
  }

  test("file-backed -ovr AUTO read: coarse requests decode the overview IFD") {
    val dir = java.nio.file.Files.createTempDirectory("tifs-ovr")
    // 64×64 COG (tiled + deflate) with overviews 32 and 16, res 1°/px
    val base = GeoTiff.Image(
      new Bitmap(64, 64, 1, DType.UInt8,
        Array.tabulate(64 * 64)(i => (i % 199).toDouble)),
      Affine.northUp(0, 64, 1, -1), CRS.WGS84)
    java.nio.file.Files.write(dir.resolve("c.tif"),
      GeoTiff.write(Seq(base), overviewsMinSize = 16, compress = true, tileSize = 16))

    val fine = GeoTiffIO.readTilesForResolution(spark, s"$dir/*.tif", 1.0).collect()
    assert(fine.length == 1 && fine.head.getAs[Int]("width") == 64)
    val mid = GeoTiffIO.readTilesForResolution(spark, s"$dir/*.tif", 2.4).collect()
    assert(mid.head.getAs[Int]("width") == 32)
    assert(mid.head.getAs[scala.collection.Seq[Double]]("transform")(1) == 2.0)
    val coarse = GeoTiffIO.readTilesForResolution(spark, s"$dir/*.tif", 50.0).collect()
    assert(coarse.head.getAs[Int]("width") == 16)
    // payload is the decoded overview, not the full image
    assert(coarse.head.getAs[Array[Byte]]("payload").length == 16 * 16)
  }
}
