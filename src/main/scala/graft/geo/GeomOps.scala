package graft.geo

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader}

/** JTS-backed geometry operations: the engine's substitute for PostGIS
  * (predicates, §2.2 P5/P9) and for the proj ring helpers
  * (internal/utils/proj/proj.go:287-331, 478-510).
  *
  * Geometries travel as WKB `BinaryType` columns with bbox struct
  * companions for coarse pruning (SURVEY §1.3); JTS objects exist only
  * inside expression evaluation — never in shuffles.
  */
object GeomOps {
  val factory = new GeometryFactory(new PrecisionModel(), 4326)

  // WKB codecs are stateful but reusable — thread-local reuse keeps the
  // per-row expression paths (every spatial predicate decodes 1-2 WKBs
  // per row) from constructing a fresh reader/writer each call
  private val wkbReader: ThreadLocal[WKBReader] =
    ThreadLocal.withInitial(() => new WKBReader(factory))
  private val wkbWriter: ThreadLocal[WKBWriter] =
    ThreadLocal.withInitial(() => new WKBWriter())

  def readWkb(b: Array[Byte]): Geometry = wkbReader.get().read(b)
  def writeWkb(g: Geometry): Array[Byte] = wkbWriter.get().write(g)
  def readWkt(s: String): Geometry = new WKTReader(factory).read(s)

  def bbox(g: Geometry): BBox = {
    val e = g.getEnvelopeInternal
    BBox(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  }

  /** SHA-1 of WKB — the AOI dedup key (reference record.go:33-46). */
  def geometryHash(g: Geometry): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(writeWkb(g)).map("%02x".format(_)).mkString
  }

  def prepared(g: Geometry): PreparedGeometry =
    PreparedGeometryFactory.prepare(g)

  /** Interior-intersects — the refined spatial predicate the reference uses
    * when SRIDs match: ST_Relate(a, b, 'T********')
    * (pg_containers.go:302-311).
    *
    * Rectangle fast path: for two axis-aligned rectangles the interiors
    * (open boxes) intersect iff the envelopes STRICTLY overlap on both
    * axes — exactly the T********-cell value, without JTS building the
    * full intersection matrix (two topology graphs + node/edge
    * computation per call). This is the inner predicate of the p5/f7
    * fine stage, evaluated once per coarse-surviving pair. */
  def interiorIntersects(a: Geometry, b: Geometry): Boolean =
    if (a.isRectangle && b.isRectangle) {
      val ea = a.getEnvelopeInternal
      val eb = b.getEnvelopeInternal
      ea.getMinX < eb.getMaxX && ea.getMaxX > eb.getMinX &&
        ea.getMinY < eb.getMaxY && ea.getMaxY > eb.getMinY
    } else a.relate(b).matches("T********")

  /** Intersection with a rectangle×rectangle fast path: two axis-aligned
    * rectangles overlapping with positive width AND height intersect in a
    * rectangle, built directly as the CW ring of the envelope overlap —
    * the same point set, area and envelope as the JTS overlay result
    * (pinned by a GeoSpec property sweep; only the ring's start phase may
    * differ from OverlayNG's node-dependent choice, which no consumer
    * observes) — skipping the full overlay graph per call. Degenerate
    * contact (edge/corner → line/point) and non-rectangles fall back to
    * the JTS overlay. This is the inner loop of the f7/A3 area
    * aggregation (one call per overlapping pair). */
  def intersection(a: Geometry, b: Geometry): Geometry =
    if (a.isRectangle && b.isRectangle) {
      val ea = a.getEnvelopeInternal
      val eb = b.getEnvelopeInternal
      val xmin = math.max(ea.getMinX, eb.getMinX)
      val xmax = math.min(ea.getMaxX, eb.getMaxX)
      val ymin = math.max(ea.getMinY, eb.getMinY)
      val ymax = math.min(ea.getMaxY, eb.getMaxY)
      if (xmin < xmax && ymin < ymax)
        factory.createPolygon(Array(
          new Coordinate(xmin, ymax), new Coordinate(xmax, ymax),
          new Coordinate(xmax, ymin), new Coordinate(xmin, ymin),
          new Coordinate(xmin, ymax)))
      else a.intersection(b)
    } else a.intersection(b)

  def polygonFromBBox(b: BBox): Polygon =
    factory.createPolygon(Array(
      new Coordinate(b.xmin, b.ymin), new Coordinate(b.xmax, b.ymin),
      new Coordinate(b.xmax, b.ymax), new Coordinate(b.xmin, b.ymax),
      new Coordinate(b.xmin, b.ymin)))

  /** Ring in geographic coordinates covering a planar grid extent, edges
    * densified until the reprojected polyline deviates from the true edge
    * by less than ~1% of the edge length (NewGeographicRingFromExtent +
    * densifyEdge, proj.go:287-293, 365-371, 472-510: relative accuracy
    * `accuracyPc = 0.01`, midpoint recursion, depth ≤ 5). */
  def geographicRingFromExtent(
      pixToCrs: Affine, width: Int, height: Int, crs: CRS,
      accuracyPc: Double = 0.01, maxRecursion: Int = 5): Polygon = {
    if (crs.isGeographic) return polygonFromBBox(BBox.fromExtent(pixToCrs, width, height))
    val b = BBox.fromExtent(pixToCrs, width, height)
    val corners = Array(
      (b.xmin, b.ymin), (b.xmax, b.ymin), (b.xmax, b.ymax), (b.xmin, b.ymax), (b.xmin, b.ymin))
    val coords = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
    var i = 0
    while (i < 4) {
      val (x1, y1) = corners(i); val (x2, y2) = corners(i + 1)
      val (lon1, lat1) = crs.toLonLat(x1, y1)
      val (lon2, lat2) = crs.toLonLat(x2, y2)
      val accuracy = math.hypot(lon2 - lon1, lat2 - lat1) * accuracyPc
      coords += new Coordinate(lon1, lat1)
      densify(crs, x1, y1, x2, y2, lon1, lat1, lon2, lat2, accuracy, maxRecursion, coords)
      i += 1
    }
    val (lon0, lat0) = crs.toLonLat(corners(0)._1, corners(0)._2)
    coords += new Coordinate(lon0, lat0)
    factory.createPolygon(coords.toArray)
  }

  private def densify(
      crs: CRS, x1: Double, y1: Double, x2: Double, y2: Double,
      lon1: Double, lat1: Double, lon2: Double, lat2: Double,
      accuracy: Double, depth: Int,
      out: scala.collection.mutable.ArrayBuffer[Coordinate]): Unit = {
    val xm = (x1 + x2) / 2; val ym = (y1 + y2) / 2
    val (lonm, latm) = crs.toLonLat(xm, ym)
    val lonm2 = (lon1 + lon2) / 2; val latm2 = (lat1 + lat2) / 2
    val dist = math.hypot(lonm - lonm2, latm - latm2)
    if (dist <= accuracy) return
    if (depth == 0) { out += new Coordinate(lonm, latm); return }
    densify(crs, x1, y1, xm, ym, lon1, lat1, lonm, latm, accuracy, depth - 1, out)
    out += new Coordinate(lonm, latm)
    densify(crs, xm, ym, x2, y2, lonm, latm, lon2, lat2, accuracy, depth - 1, out)
  }

  /** mod-360 into [-180, 180] (proj.go mod180). */
  def mod180(f: Double): Double =
    ((f % 360) + 540) % 360 - 180

  /** Split a lon/lat multipolygon crossing the antimeridian into translated
    * pieces so geographic predicates stay correct — ingest-time
    * normalization (reference pg_containers.go:124-167 splitGeom; §2.2 P9).
    * Geometries whose longitudes exceed ±180 are cut at the meridian and
    * shifted back into range. */
  def normalizeAntimeridian(g: Geometry): Geometry = {
    val env = g.getEnvelopeInternal
    if (env.getMinX >= -180 && env.getMaxX <= 180) return g
    val parts = scala.collection.mutable.ArrayBuffer.empty[Geometry]
    // cut into [-540,-180], [-180,180], [180,540] slabs and translate
    val slabs = Seq((-540.0, -180.0, 360.0), (-180.0, 180.0, 0.0), (180.0, 540.0, -360.0))
    for ((lo, hi, shift) <- slabs) {
      val slab = factory.toGeometry(new Envelope(lo, hi, -90, 90))
      val piece = g.intersection(slab)
      if (!piece.isEmpty) {
        val translated =
          if (shift == 0) piece
          else {
            val t = piece.copy()
            t.apply(new CoordinateFilter {
              override def filter(c: Coordinate): Unit = { c.x += shift }
            })
            t.geometryChanged()
            t
          }
        parts += translated
      }
    }
    if (parts.size == 1) parts.head
    else factory.buildGeometry(java.util.Arrays.asList(parts.toArray: _*)).union()
  }
}
