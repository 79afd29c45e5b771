package graft.ingest

import graft.catalog.Catalog
import graft.operators.MediaCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class WorldImageIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val root: String = java.nio.file.Files.createTempDirectory("graft-wld").toString
  val cat: Catalog = Catalog(root)

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
    rm(new java.io.File(root))
  }

  test("world-file affine: center-of-pixel convention to corner origin") {
    val a = WorldImageIO.worldFileToAffine("2.0\n0.0\n0.0\n-2.0\n101.0\n199.0\n")
    // centers at (101,199), 2x2 m pixels -> corner (100,200)
    assert(a.c0 == 100.0 && a.c3 == 200.0 && a.rx == 2.0 && a.ry == -2.0)
  }

  test("PNG + .pgw + .prj import as catalog tiles; sidecar-less files skip") {
    val dir = java.nio.file.Files.createTempDirectory("wld-in")
    // 4x4 gray PNG: ramp values
    val png = MediaCodec.encodePng(4, 4, 1, Array.tabulate(16)(_.toDouble * 10))
    java.nio.file.Files.write(dir.resolve("a.png"), png)
    java.nio.file.Files.write(dir.resolve("a.pgw"),
      "0.5\n0\n0\n-0.5\n10.25\n49.75\n".getBytes) // corner (10, 50)
    // authority-free LAEA WKT in the .prj — exercises the round-3 parser
    java.nio.file.Files.write(dir.resolve("a.prj"),
      """PROJCS["u",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]]],
         PROJECTION["Lambert_Azimuthal_Equal_Area"],
         PARAMETER["latitude_of_center",52],PARAMETER["longitude_of_center",10],
         PARAMETER["false_easting",4321000],PARAMETER["false_northing",3210000],
         UNIT["metre",1]]""".getBytes)
    // a second PNG without any world file -> must be skipped, not crash
    java.nio.file.Files.write(dir.resolve("b.png"),
      MediaCodec.encodePng(2, 2, 1, Array(1.0, 2, 3, 4)))

    val (imported, skipped) = WorldImageIO.importFiles(spark, cat, s"$dir/*.png")
    assert(imported == 1 && skipped == 1)

    // uppercase sidecars (.PGW) resolve too, and are never decoded as images
    val dirU = java.nio.file.Files.createTempDirectory("wld-upper")
    java.nio.file.Files.write(dirU.resolve("c.png"),
      MediaCodec.encodePng(2, 2, 1, Array(9.0, 9, 9, 9)))
    java.nio.file.Files.write(dirU.resolve("c.PGW"),
      "1\n0\n0\n-1\n0.5\n-0.5\n".getBytes)
    val catU = Catalog(java.nio.file.Files.createTempDirectory("wld-upper-cat").toString)
    val (impU, skipU) = WorldImageIO.importFiles(spark, catU, s"$dirU/*")
    assert(impU == 1 && skipU == 0, s"imported=$impU skipped=$skipU")

    val t = cat.read(spark, "tiles").collect().head
    assert(t.getAs[Int]("width") == 4 && t.getAs[Int]("bands") == 1)
    val tf = t.getAs[scala.collection.Seq[Double]]("transform")
    assert(tf(0) == 10.0 && tf(3) == 50.0 && tf(1) == 0.5 && tf(5) == -0.5)
    // CRS came from the .prj, serialized parseable (proj4 laea)
    val crs = t.getAs[String]("crs")
    assert(crs.startsWith("+proj=laea"), crs)
    val parsed = graft.geo.CRS.parse(crs)
    val (x, y) = parsed.fromLonLat(10, 52)
    assert(math.abs(x - 4321000) < 1e-6 && math.abs(y - 3210000) < 1e-6)
    // pixels round-tripped through PNG decode
    val bm = graft.raster.Bitmap.fromBytes(
      t.getAs[Array[Byte]]("payload"), 4, 4, 1, graft.core.DType.UInt8)
    assert(bm.get(1, 0, 0) == 10.0 && bm.get(3, 3, 0) == 150.0)
    // container row registered
    assert(cat.read(spark, "containers")
      .filter(col("uri").endsWith("a.png")).count() == 1)
  }

  test("16-bit grayscale PNG imports as uint16 — values past 255 survive") {
    val dir = java.nio.file.Files.createTempDirectory("wld-16bit")
    // TYPE_USHORT_GRAY: ImageIO round-trips 16-bit samples through PNG
    val im = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    im.getRaster.setSamples(0, 0, 2, 2, 0, Array(100, 300, 40000, 65535))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    java.nio.file.Files.write(dir.resolve("d.png"), bos.toByteArray)
    java.nio.file.Files.write(dir.resolve("d.pgw"),
      "1\n0\n0\n-1\n0.5\n-0.5\n".getBytes)
    val cat16 = Catalog(java.nio.file.Files.createTempDirectory("wld-16-cat").toString)
    val (imp, _) = WorldImageIO.importFiles(spark, cat16, s"$dir/*.png")
    assert(imp == 1)
    val t = cat16.read(spark, "tiles").collect().head
    assert(t.getAs[String]("dtype") == "uint16")
    val bm = graft.raster.Bitmap.fromBytes(
      t.getAs[Array[Byte]]("payload"), 2, 2, 1, graft.core.DType.UInt16)
    assert(bm.pixels.toSeq == Seq(100.0, 300.0, 40000.0, 65535.0))
  }
}
