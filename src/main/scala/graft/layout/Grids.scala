package graft.layout

import graft.geo.{Affine, BBox, CRS, GeomOps}
import org.locationtech.jts.geom.Geometry

/** One grid cell: URI + CRS + pixel grid + native/geographic footprints —
  * the reference's Cell (internal/utils/grid/abstractgrid.go:68-90). */
final case class Cell(
    uri: String,
    crs: CRS,
    pixToCrs: Affine,
    sizeX: Int,
    sizeY: Int) {
  def nativeRing: Geometry =
    GeomOps.polygonFromBBox(BBox.fromExtent(pixToCrs, sizeX, sizeY))
  /** Footprint in lon/lat, corners reprojected (densification as in
    * GeomOps.geographicRingFromExtent). */
  def geographicRing: Geometry =
    GeomOps.geographicRingFromExtent(pixToCrs, sizeX, sizeY, crs)
}

/** Grid abstraction (G1-G5): Covers(aoi) streams cell URIs; Cell(uri)
  * materializes one cell. Implementations are pure Scala so `covers` can
  * run driver-side (small AOIs) or inside a flatMap generator over
  * many AOIs (the Spark form of the reference's streamed channel). */
sealed trait Grid {
  def covers(aoiLonLat: Geometry): Iterator[String]
  def cell(uri: String): Cell
}

/** Regular grid (regulargrid.go): CRS + cell size (pixels) + resolution +
  * origin. URI format "i/j". Instead of the reference's rasterize-the-AOI
  * approach we test each candidate cell's bbox directly against the
  * (prepared) projected AOI — no O(width×height) buffer, no memory-limit
  * guard needed; cells stream lazily. */
final case class RegularGrid(
    crs: CRS,
    cellSizeX: Int,
    cellSizeY: Int,
    resolution: Double,
    originX: Double = 0,
    originY: Double = 0) extends Grid {

  /** pixel→CRS for the whole grid (regulargrid.go:121). */
  val pixToCrs: Affine =
    Affine.translation(originX, originY).multiply(Affine.scale(resolution, -resolution))

  def cell(uri: String): Cell = {
    val parts = uri.split("/")
    require(parts.length == 2, s"Cell format must be 'i/j': $uri")
    val (i, j) = (parts(0).toInt, parts(1).toInt)
    val cellToCrs = pixToCrs.multiply(
      Affine.translation(i.toDouble * cellSizeX, j.toDouble * cellSizeY))
    Cell(uri, crs, cellToCrs, cellSizeX, cellSizeY)
  }

  def covers(aoiLonLat: Geometry): Iterator[String] = {
    // project AOI into grid CRS (corner-wise; adequate for the whitelisted
    // conformal CRS at cell granularity)
    val projected = projectToCrs(aoiLonLat, crs)
    val prep = GeomOps.prepared(projected)
    val env = projected.getEnvelopeInternal
    val crsToPix = pixToCrs.inverse
    // candidate (i,j) range from the AOI bbox in fractional cell coords
    val corners = Seq(
      crsToPix.transform(env.getMinX, env.getMinY),
      crsToPix.transform(env.getMaxX, env.getMinY),
      crsToPix.transform(env.getMinX, env.getMaxY),
      crsToPix.transform(env.getMaxX, env.getMaxY))
    // fail LOUDLY on degenerate corner math: a NaN from a projection
    // blowup or a cell-index range past Int (where `.toInt` saturates
    // and `Iterator.range(j0, Int.MaxValue + 1)` wraps to an EMPTY
    // iterator) would otherwise return zero cells with no error
    val is = corners.map(_._1 / cellSizeX)
    val js = corners.map(_._2 / cellSizeY)
    require((is ++ js).forall(v => !v.isNaN && math.abs(v) < (Int.MaxValue - 1).toDouble),
      s"grid cover: cell index range degenerate or past Int " +
        s"(i=${is.min}..${is.max}, j=${js.min}..${js.max})")
    val i0 = math.floor(is.min).toInt
    val i1 = math.ceil(is.max).toInt
    val j0 = math.floor(js.min).toInt
    val j1 = math.ceil(js.max).toInt
    // prepared fast-reject, then interior-intersects (T********): a cell
    // merely touching the AOI boundary has zero coverage and is not
    // emitted (matches the reference's rasterize-then-scan, which never
    // lights a pixel for a zero-area touch)
    for {
      j <- Iterator.range(j0, j1 + 1)
      i <- Iterator.range(i0, i1 + 1)
      c = cell(s"$i/$j")
      ring = c.nativeRing
      if prep.intersects(ring) && GeomOps.interiorIntersects(projected, ring)
    } yield c.uri
  }

  private[layout] def projectToCrs(aoiLonLat: Geometry, crs: CRS): Geometry = {
    val g = aoiLonLat.copy()
    g.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: org.locationtech.jts.geom.Coordinate): Unit = {
        val (x, y) = crs.fromLonLat(c.x, c.y)
        c.x = x; c.y = y
      }
    })
    g.geometryChanged()
    g
  }
}

/** Single-cell grid (singlecellgrid.go:53-105): the AOI's CRS bbox as one
  * cell at a given resolution. URI "originX/originY/sizeX/sizeY". */
final case class SingleCellGrid(crs: CRS, resolution: Double) extends Grid {

  def covers(aoiLonLat: Geometry): Iterator[String] = {
    require(!aoiLonLat.isEmpty, "SingleCellGrid.Covers: empty AOI")
    val projected = RegularGrid(crs, 1, 1, resolution).projectToCrs(aoiLonLat, crs)
    val b = projected.getEnvelopeInternal
    // clamp to ≥1 px (same policy as CustomGrid.cell): a point/sliver AOI
    // narrower than resolution/2 would otherwise round to a 0-sized cell
    val width = math.max(1L,
      math.round(math.abs(b.getMinX - b.getMaxX) / math.abs(resolution)))
    val height = math.max(1L,
      math.round(math.abs(b.getMinY - b.getMaxY) / math.abs(resolution)))
    Iterator.single(s"${fmt(b.getMinX)}/${fmt(b.getMaxY)}/$width/$height")
  }

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  def cell(uri: String): Cell = {
    val parts = uri.split("/")
    require(parts.length == 4, s"Cell format must be originX/originY/sizeX/sizeY: $uri")
    val pixToCrs = Affine.translation(parts(0).toDouble, parts(1).toDouble)
      .multiply(Affine.scale(resolution, -resolution))
    Cell(uri, crs, pixToCrs, parts(2).toInt, parts(3).toInt)
  }
}

/** G4 — Custom grid (internal/geocube/customgrid.go:26-108): cells are
  * catalog rows (the `cells` table, user-defined shapes like MGRS) rather
  * than a formula. `covers` runs the S6/J4 FindCells spatial join (bbox
  * prune → JTS intersects → intersection geometry) and, when a subgrid is
  * configured, refines each covered cell by covering the AOI∩cell
  * intersection with it — URIs are "cellID" or "cellID/subURI"
  * (customgrid.go:49-76). `cell` materializes either the custom cell's own
  * bbox grid at `resolution`, or delegates the sub-cell to the subgrid in
  * the custom cell's CRS.
  *
  * Scale note: `cell()` lookups go through a driver-collected id→geometry
  * map — correct for broadcast-sized grids (MGRS ≈ 1.2k zone cells, any
  * catalog grid in the MB range, matching the reference's per-cell DB
  * lookups). For larger cell tables keep the DataFrame form
  * (CatalogQueries.findCells) and join instead of materializing. */
final case class CustomGrid(
    spark: org.apache.spark.sql.SparkSession,
    cat: graft.catalog.TableStore,
    gridName: String,
    resolution: Double,
    subgridOf: Option[CRS => Grid] = None) extends Grid {

  private lazy val rows: Map[String, (CRS, Geometry)] = {
    import org.apache.spark.sql.functions.col
    cat.read(spark, "cells").filter(col("grid") === gridName)
      .select("id", "crs", "coordinates_wkb").collect()
      .map { r =>
        r.getAs[String]("id") -> (
          (CRS.parse(r.getAs[String]("crs")),
            GeomOps.readWkb(r.getAs[Array[Byte]]("coordinates_wkb"))))
      }.toMap
  }

  def covers(aoiLonLat: Geometry): Iterator[String] = {
    val found = graft.catalog.CatalogQueries
      .findCells(spark, cat, gridName, aoiLonLat)
      .select("id", "crs", "intersection_wkb").collect()
    found.iterator.flatMap { r =>
      val id = r.getAs[String]("id")
      subgridOf match {
        case None => Iterator.single(id)
        case Some(mk) =>
          val crs = CRS.parse(r.getAs[String]("crs"))
          val inter = GeomOps.readWkb(r.getAs[Array[Byte]]("intersection_wkb"))
          mk(crs).covers(inter).map(sub => s"$id/$sub")
      }
    }
  }

  def cell(uri: String): Cell = {
    val (id, sub) = uri.split("/", 2) match {
      case Array(i) => (i, None)
      case Array(i, s) => (i, Some(s))
    }
    val (crs, geomLonLat) = rows.getOrElse(id,
      throw new IllegalArgumentException(s"unknown cell '$id' in grid '$gridName'"))
    (sub, subgridOf) match {
      case (Some(s), Some(mk)) =>
        val c = mk(crs).cell(s)
        c.copy(uri = uri)
      case (None, _) =>
        // the cell's own pixel grid: native-CRS bbox at `resolution`
        val native = RegularGrid(crs, 1, 1, resolution).projectToCrs(geomLonLat, crs)
        val env = native.getEnvelopeInternal
        val w = math.max(1, math.round(env.getWidth / resolution)).toInt
        val h = math.max(1, math.round(env.getHeight / resolution)).toInt
        Cell(uri, crs,
          Affine.translation(env.getMinX, env.getMaxY)
            .multiply(Affine.scale(resolution, -resolution)), w, h)
      case (Some(s), None) =>
        throw new IllegalArgumentException(s"no subgrid configured for sub-URI '$s'")
    }
  }
}

object Grid {
  /** Grid from layout flags + parameters (abstractgrid.go:52-66 +
    * regulargrid.go:57-132): flags name the grid kind; parameters carry
    * crs/resolution/cell size/origin. */
  def fromLayout(flags: Seq[String], params: Map[String, String]): Grid = {
    val kind = flags.headOption.getOrElse("regular")
    val crs = CRS.parse(params.getOrElse("crs", "EPSG:4326"))
    val resolution = params.getOrElse("resolution",
      throw new IllegalArgumentException("must contain a valid 'resolution'")).toDouble
    require(resolution > 0, "must contain a valid 'resolution'")
    kind match {
      case "regular" =>
        val (cx, cy) = params.get("cell_size") match {
          case Some(s) => (s.toInt, s.toInt)
          case None => (params("cell_x_size").toInt, params("cell_y_size").toInt)
        }
        RegularGrid(crs, cx, cy, resolution,
          params.get("ox").map(_.toDouble).getOrElse(0.0),
          params.get("oy").map(_.toDouble).getOrElse(0.0))
      case "singlecell" => SingleCellGrid(crs, resolution)
      case g => throw new IllegalArgumentException(s"unsupported grid: $g")
    }
  }

  /** Layout grids including catalog-defined custom grids
    * (customgrid.go:26-41: any flag that isn't a built-in kind names a
    * `cells`-table grid; optional "subgrid" parameter = regular/singlecell
    * refinement of each cell). */
  def fromLayout(flags: Seq[String], params: Map[String, String],
      spark: org.apache.spark.sql.SparkSession,
      cat: graft.catalog.TableStore): Grid = {
    val kind = flags.headOption.getOrElse("regular")
    if (kind == "regular" || kind == "singlecell") fromLayout(flags, params)
    else {
      val resolution = params.getOrElse("resolution",
        throw new IllegalArgumentException("must contain a valid 'resolution'")).toDouble
      require(resolution > 0, "must contain a valid 'resolution'")
      val sub = params.get("subgrid").map { s =>
        (crs: CRS) => fromLayout(Seq(s),
          params + ("crs" -> graft.geo.CRS.serialize(crs)))
      }
      // eager subgrid validation: constructing it once against a dummy
      // CRS surfaces an unsupported subgrid kind or missing cell sizes at
      // layout-resolution time (create), not first covers
      sub.foreach(f => f(CRS.parse("EPSG:4326")))
      CustomGrid(spark, cat, kind, resolution, sub)
    }
  }

  /** XYZ web-tile math (G7, catalog.go:483-506): z/x/y → WebMercator
    * 256×256 descriptor. Origin at (-πR, πR), res = 2πR / (256·2^z). */
  val WebMercatorOrigin: Double = 20037508.342789244
  def xyzTransform(x: Long, y: Long, z: Int): Affine = {
    val res = 2 * WebMercatorOrigin / (256L.toDouble * (1L << z))
    Affine.northUp(
      -WebMercatorOrigin + x * 256 * res,
      WebMercatorOrigin - y * 256 * res,
      res, -res)
  }
}
