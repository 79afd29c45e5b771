package graft.cube

import graft.core._
import graft.raster.Bitmap
import org.scalatest.funsuite.AnyFunSuite

class ServingSpec extends AnyFunSuite {

  val gray: Palette = Palette("gray", Seq(
    Palette.ColorPoint(0f, 0, 0, 0, 255), Palette.ColorPoint(1f, 255, 255, 255, 255)))

  val rgb: Palette = Palette("rgb", Seq(
    Palette.ColorPoint(0f, 255, 0, 0, 255),
    Palette.ColorPoint(0.5f, 0, 255, 0, 255),
    Palette.ColorPoint(1f, 0, 0, 255, 255)))

  test("paletteN interpolates linearly between points") {
    val lut = rgb.paletteN(255)
    assert(lut.length == 255)
    // first point: red
    assert((lut(0) >>> 24) == 255 && ((lut(0) >> 16) & 0xff) == 0)
    // middle: green
    val mid = lut(127)
    assert(((mid >> 16) & 0xff) > 250)
    // last: blue
    assert(((lut(254) >> 8) & 0xff) == 255)
  }

  test("palette validation") {
    assertThrows[IllegalArgumentException](
      Palette("bad", Seq(Palette.ColorPoint(0f, 0, 0, 0, 0))))
    assertThrows[IllegalArgumentException](
      Palette("bad", Seq(Palette.ColorPoint(0.2f, 0, 0, 0, 0), Palette.ColorPoint(1f, 0, 0, 0, 0))))
  }

  test("toPng encodes a valid PNG with transparent nodata") {
    val m = DataMapping(
      DataFormat(DType.UInt8, 255.0, NumRange(0, 254)), NumRange(0, 254), 1.0)
    val bm = new Bitmap(2, 2, 1, DType.UInt8, Array(0.0, 127.0, 254.0, 255.0))
    val png = Palette.toPng(bm, m, Some(gray))
    // PNG magic
    assert(png.take(8).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 2 && img.getHeight == 2)
    // nodata pixel (1,1) transparent
    assert(((img.getRGB(1, 1) >>> 24) & 0xff) == 0)
    // (0,0)=0 → black opaque; (0,1)=254 → white
    assert(((img.getRGB(0, 0) >>> 24) & 0xff) == 255)
    assert((img.getRGB(0, 1) & 0xff) > 250)
  }

  test("grayscale (no palette) PNG") {
    val m = DataMapping(
      DataFormat(DType.UInt8, 255.0, NumRange(0, 254)), NumRange(0, 254), 1.0)
    val bm = new Bitmap(1, 1, 1, DType.UInt8, Array(127.0))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Palette.toPng(bm, m, None)))
    assert((img.getRGB(0, 0) & 0xff) == 127)
  }

  test("getTileFromFile: catalog-free XYZ serving off a COG via range reads") {
    import graft.geo.{Affine, CRS}
    import graft.raster.GeoTiff
    // world-extent WebMercator COG, constant 100, with overviews
    val ext = 20037508.342789244
    val res = 2 * ext / 64
    val src = GeoTiff.Image(
      new Bitmap(64, 64, 1, DType.UInt8, Array.fill(64 * 64)(100.0)),
      Affine.northUp(-ext, ext, res, -res), CRS.WebMercator)
    val dir = java.nio.file.Files.createTempDirectory("xyz-file")
    val path = dir.resolve("world.tif")
    java.nio.file.Files.write(path,
      GeoTiff.write(Seq(src), overviewsMinSize = 16, compress = true, tileSize = 16))

    val png = XYZTile.getTileFromFile(
      new org.apache.hadoop.conf.Configuration(), path.toString, "GTIFF_DIR:1",
      x = 0, y = 0, z = 0)
    assert(png.isDefined)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png.get))
    assert(img.getWidth == 256 && img.getHeight == 256)
    assert((img.getRGB(128, 128) & 0xff) == 100)
    assert((img.getRGB(10, 200) & 0xff) == 100)
  }
}
