package graft.cube

import graft.catalog.Catalog
import graft.core.{DataFormat, DataMapping, DType, NumRange}
import graft.layout.Grid
import graft.raster.Bitmap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The interactive XYZ tile read path (§3.3, reference
  * internal/svc/catalog.go:415-506 + getMosaic :629-668): z/x/y →
  * WebMercator 256×256 descriptor → GetCube plan (all matching records
  * merged into ONE mosaic) → optional min/max rescale → palette → PNG. */
object XYZTile {

  /** PNG bytes for tile (x, y, z); None when no dataset intersects or too
    * few valid pixels. */
  def getTile(spark: SparkSession, cat: Catalog, instanceId: String,
      x: Long, y: Long, z: Int,
      minOverride: Double = 0, maxOverride: Double = 0,
      palette: Option[Palette] = None): Option[Array[Byte]] = {

    // all records merged into one slice: a single group of every matching
    // record (getMosaic consolidates the full scan into one image)
    val req = CubeRequest(
      instanceIds = Seq(instanceId),
      crs = "EPSG:3857",
      transform = Grid.xyzTransform(x, y, z),
      width = 256, height = 256,
      validPixPc = 0)

    val out = GetCube.prepare(spark, cat, req)
    val tiles = GetCube.datasetTiles(spark, cat, req, out).collect()
    if (tiles.isEmpty) return None

    val slice = GetCube.buildSliceForMosaic(tiles, out)
    if (slice.isEmpty) return None
    val bm = Bitmap.fromBytes(slice.get, out.width, out.height,
      out.bands, out.mapping.format.dtype)

    // min/max rescale (getXYZTile :469-471): override the displayed range
    val mapping =
      if (minOverride < maxOverride)
        DataMapping(
          DataFormat(out.mapping.format.dtype, out.mapping.format.noData,
            NumRange(minOverride, maxOverride)),
          out.mapping.rangeExt, out.mapping.exponent)
      else out.mapping
    Some(Palette.toPng(bm, mapping, palette))
  }
}
