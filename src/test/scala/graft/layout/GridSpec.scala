package graft.layout

import graft.geo.{BBox, CRS, GeomOps}
import org.scalatest.funsuite.AnyFunSuite

class GridSpec extends AnyFunSuite {

  test("regular grid: cell pixToCrs and uri round trip") {
    val g = RegularGrid(CRS.WebMercator, 256, 256, 100.0, -20000000, 20000000)
    val c = g.cell("3/2")
    // cell origin = grid origin + (i*cellSizeX, j*cellSizeY) pixels
    val (x0, y0) = c.pixToCrs.transform(0, 0)
    assert(x0 === -20000000 + 3 * 256 * 100.0)
    assert(y0 === 20000000 - 2 * 256 * 100.0)
    assert(c.sizeX == 256 && c.sizeY == 256)
  }

  test("regular grid covers: every cell intersects, aoi fully covered") {
    val g = RegularGrid(CRS.WGS84, 10, 10, 0.1) // 1°×1° cells at origin 0,0
    // AOI: lon [0.5, 2.5], lat [-1.5, 0.5]
    val aoi = GeomOps.polygonFromBBox(BBox(0.5, -1.5, 2.5, 0.5))
    val uris = g.covers(aoi).toSeq
    // cells are 1°×1°: i in {0,1,2}, j in {-1(top? ) ...}
    assert(uris.nonEmpty)
    val cells = uris.map(g.cell)
    // every returned cell intersects the AOI
    assert(cells.forall(c => c.nativeRing.intersects(aoi)))
    // the union of cells covers the AOI
    val union = org.locationtech.jts.operation.union.UnaryUnionOp.union(
      java.util.Arrays.asList(cells.map(_.nativeRing): _*))
    assert(union.covers(aoi))
    // no duplicates
    assert(uris.distinct.size == uris.size)
  }

  test("regular grid covers excludes cells off the AOI") {
    val g = RegularGrid(CRS.WGS84, 10, 10, 0.1)
    val aoi = GeomOps.polygonFromBBox(BBox(0.05, 0.05, 0.95, 0.95)) // inside cell 0/-1..? j
    val uris = g.covers(aoi).toSeq
    assert(uris.size == 1)
  }

  test("covers fails LOUDLY when the cell-index range degenerates (no silent zero cells)") {
    // a sub-micro-degree grid: a whole-hemisphere AOI's cell indices
    // blow past Int — `.toInt` saturation used to wrap
    // Iterator.range(j0, Int.MaxValue+1) into an EMPTY iterator and
    // return no cells with no error
    val fine = RegularGrid(CRS.WGS84, 1, 1, 1e-8)
    val hemisphere = GeomOps.polygonFromBBox(BBox(-90, -45, 90, 45))
    val e = intercept[IllegalArgumentException](fine.covers(hemisphere).size)
    assert(e.getMessage.contains("degenerate or past Int"))
  }

  test("single-cell grid: one cell spanning the aoi bbox") {
    val g = SingleCellGrid(CRS.WebMercator, 100.0)
    val aoi = GeomOps.polygonFromBBox(BBox(1, 1, 2, 2)) // lon/lat
    val uris = g.covers(aoi).toSeq
    assert(uris.size == 1)
    val c = g.cell(uris.head)
    // cell covers the projected aoi bbox
    val (x1, _) = CRS.WebMercator.fromLonLat(1, 1)
    val (x2, _) = CRS.WebMercator.fromLonLat(2, 2)
    val widthPx = math.round(math.abs(x2 - x1) / 100.0)
    assert(c.sizeX == widthPx)
  }

  test("grid from layout parameters (regular + singlecell + errors)") {
    val r = Grid.fromLayout(Seq("regular"),
      Map("crs" -> "EPSG:3857", "resolution" -> "50", "cell_size" -> "128",
        "ox" -> "-100", "oy" -> "100"))
    assert(r.isInstanceOf[RegularGrid])
    val s = Grid.fromLayout(Seq("singlecell"), Map("crs" -> "EPSG:4326", "resolution" -> "0.1"))
    assert(s.isInstanceOf[SingleCellGrid])
    assertThrows[IllegalArgumentException](
      Grid.fromLayout(Seq("regular"), Map("cell_size" -> "10")))
    assertThrows[IllegalArgumentException](
      Grid.fromLayout(Seq("mgrs"), Map("resolution" -> "10")))
  }

  test("layout covers dedups by geometry hash") {
    val l = Layout("l1", Seq("regular"),
      Map("crs" -> "EPSG:4326", "resolution" -> "0.1", "cell_size" -> "10"))
    val aoi = GeomOps.polygonFromBBox(BBox(0.2, 0.2, 1.8, 1.8))
    val cells = l.covers(aoi).toSeq
    assert(cells.map(_.uri).distinct.size == cells.size)
    assert(cells.size == 4) // 2×2 cells of 1°
  }

  test("xyz tile transform matches webmercator tiling") {
    // z=0: one tile covering the world
    val t0 = Grid.xyzTransform(0, 0, 0)
    val (x0, y0) = t0.transform(0, 0)
    assert(math.abs(x0 + Grid.WebMercatorOrigin) < 1e-6)
    assert(math.abs(y0 - Grid.WebMercatorOrigin) < 1e-6)
    val (x256, y256) = t0.transform(256, 256)
    assert(math.abs(x256 - Grid.WebMercatorOrigin) < 1e-6)
    assert(math.abs(y256 + Grid.WebMercatorOrigin) < 1e-6)
    // z=1: tile (1,0) starts at x=0
    val t1 = Grid.xyzTransform(1, 0, 1)
    assert(math.abs(t1.transform(0, 0)._1) < 1e-6)
  }

  test("tileAoiBatches batches cells") {
    val l = Layout("l1", Seq("regular"),
      Map("crs" -> "EPSG:4326", "resolution" -> "0.1", "cell_size" -> "10"))
    val aoi = GeomOps.polygonFromBBox(BBox(0, 0, 5, 5))
    val batches = Layout.tileAoiBatches(l, aoi, batchSize = 10).toSeq
    assert(batches.map(_.size).sum == 25)
    assert(batches.forall(_.size <= 10))
  }
}
