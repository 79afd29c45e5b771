package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {

  test("affine transform / inverse / multiply") {
    val a = Affine.northUp(699960.0, 5100060.0, 10.0, -10.0)
    val (x, y) = a.transform(0, 0)
    assert(x === 699960.0 && y === 5100060.0)
    val (x2, y2) = a.transform(256, 256)
    assert(x2 === 699960.0 + 2560 && y2 === 5100060.0 - 2560)
    val inv = a.inverse
    val (px, py) = inv.transform(x2, y2)
    assert(math.abs(px - 256) < 1e-9 && math.abs(py - 256) < 1e-9)
    // multiply: pixel→crs then crs→pixel = identity
    val id = inv.multiply(a)
    assert(math.abs(id.c0) < 1e-9 && math.abs(id.c1 - 1) < 1e-12 &&
      math.abs(id.c5 - 1) < 1e-12)
  }

  test("webmercator known values and round trip") {
    val (x, _) = CRS.WebMercator.fromLonLat(180, 0)
    assert(math.abs(x - 20037508.342789244) < 1e-6)
    val (_, y) = CRS.WebMercator.fromLonLat(0, CRS.WebMercator.MaxLat)
    assert(math.abs(y - 20037508.342789244) < 1e-3)
    for (lon <- Seq(-179.9, -42.0, 0.0, 13.37, 179.9); lat <- Seq(-84.0, -45.0, 0.0, 48.8566, 84.0)) {
      val (px, py) = CRS.WebMercator.fromLonLat(lon, lat)
      val (lon2, lat2) = CRS.WebMercator.toLonLat(px, py)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("utm central meridian maps to 500000 easting") {
    val utm31 = CRS.UTM(31, north = true)
    val (e0, n0) = utm31.fromLonLat(3.0, 0.0)
    assert(math.abs(e0 - 500000.0) < 1e-6)
    assert(math.abs(n0 - 0.0) < 1e-6)
  }

  test("utm against independent Snyder-series computation") {
    // zone 31N, lon 2.2945, lat 48.8584 (Eiffel tower); expected values
    // computed with Snyder's TM formulas (USGS PP 1395), an independent
    // derivation from our Krüger series — they agree to < 1 cm.
    val utm31 = CRS.UTM(31, north = true)
    val (e, n) = utm31.fromLonLat(2.2945, 48.8584)
    assert(math.abs(e - 448252.001) < 0.01, s"easting $e")
    assert(math.abs(n - 5411954.910) < 0.01, s"northing $n")
  }

  test("utm round trip, both hemispheres") {
    for ((zone, north, lon, lat) <- Seq(
        (31, true, 2.35, 48.85), (33, true, 13.4, 52.5),
        (60, true, 176.0, -0.5), (23, false, -43.2, -22.9))) {
      val u = CRS.UTM(zone, north)
      val (x, y) = u.fromLonLat(lon, lat)
      val (lon2, lat2) = u.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8,
        s"zone $zone: ($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
  }

  test("crs parse / srid registry") {
    assert(CRS.parse("EPSG:4326") == CRS.WGS84)
    assert(CRS.parse("epsg:3857") == CRS.WebMercator)
    assert(CRS.parse("EPSG:32633") == CRS.UTM(33, north = true))
    assert(CRS.fromSrid(32723) == CRS.UTM(23, north = false))
    assert(CRS.fromSrid(2154).isInstanceOf[CRS.LambertConformalConic]) // Lambert-93
    assertThrows[IllegalArgumentException](CRS.fromSrid(4269)) // NAD83 geographic
  }

  test("+proj=utm honors a declared non-WGS84 ellipsoid; +proj=merc refuses ellipsoidal") {
    // ED50-style UTM: dropping +ellps=intl projected on WGS84, ~100-200 m off
    val ed50 = CRS.parse("+proj=utm +zone=31 +ellps=intl")
    val wgs = CRS.parse("+proj=utm +zone=31")
    val (x1, y1) = ed50.fromLonLat(5.0, 45.0)
    val (x2, y2) = wgs.fromLonLat(5.0, 45.0)
    assert(math.hypot(x1 - x2, y1 - y2) > 50,
      s"intl vs WGS84 UTM differ by ${math.hypot(x1 - x2, y1 - y2)} m")
    // PROJ's bare `merc` is the ELLIPSOIDAL Mercator (EPSG:3395): ~37 km
    // from spherical 3857 at lat 60 — refusing beats silently substituting
    intercept[IllegalArgumentException](CRS.parse("+proj=merc"))
    intercept[IllegalArgumentException](CRS.parse("+proj=merc +ellps=WGS84"))
  }

  test("proj4 string parsing: longlat, merc, utm, tmerc") {
    assert(CRS.parse("+proj=longlat +datum=WGS84 +no_defs") == CRS.WGS84)
    assert(CRS.parse("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 " +
      "+x_0=0 +y_0=0 +k=1 +units=m +no_defs") == CRS.WebMercator)
    assert(CRS.parse("+proj=utm +zone=33 +datum=WGS84 +units=m +no_defs") ==
      CRS.UTM(33, north = true))
    assert(CRS.parse("+proj=utm +zone=23 +south +datum=WGS84") ==
      CRS.UTM(23, north = false))
    // a tmerc with exact UTM parameters resolves to the UTM zone (EPSG id)
    assert(CRS.parse("+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=500000 " +
      "+y_0=0 +datum=WGS84") == CRS.UTM(33, north = true))
    // laea is accepted since round 3 (see the azimuthal tests below)
    assert(CRS.parse("+proj=laea +lat_0=52 +lon_0=10").isInstanceOf[CRS.LAEA])
    // aea is accepted since round 7 (see the Albers tests below)
    assert(CRS.parse("+proj=aea +lat_1=29.5 +lat_2=45.5")
      .isInstanceOf[CRS.AlbersEqualArea])
    assertThrows[IllegalArgumentException](CRS.parse("+proj=robin +lon_0=0"))
    assertThrows[IllegalArgumentException](CRS.parse("+proj=utm +datum=WGS84"))
  }

  test("custom tmerc: natural origin maps to (x_0, y_0), round trips") {
    // Gauss-Krüger-style zone: origin at (9E, 50N), k0=1, offsets
    val tm = CRS.TransverseMercator(lon0Deg = 9, lat0Deg = 50,
      k0 = 1.0, fe = 3500000, fnParam = 200000)
    val (x0, y0) = tm.fromLonLat(9, 50)
    assert(math.abs(x0 - 3500000) < 1e-6 && math.abs(y0 - 200000) < 1e-6)
    // agreement with UTM-equivalent at lat_0=0
    val tmUtmLike = CRS.TransverseMercator(15, 0, 0.9996, 500000, 0)
    val u = CRS.UTM(33, north = true)
    for ((lon, lat) <- Seq((14.5, 48.2), (16.1, -12.7), (15.0, 0.0))) {
      val (xa, ya) = tmUtmLike.fromLonLat(lon, lat)
      val (xb, yb) = u.fromLonLat(lon, lat)
      assert(math.abs(xa - xb) < 1e-9 && math.abs(ya - yb) < 1e-9)
    }
    // round trip at the shifted origin
    for ((lon, lat) <- Seq((8.3, 47.9), (10.2, 53.6))) {
      val (x, y) = tm.fromLonLat(lon, lat)
      val (lon2, lat2) = tm.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8)
    }
  }

  test("wkt parsing resolves through the EPSG authority id") {
    val wkt1 = """PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",
      DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563,
      AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],
      AUTHORITY["EPSG","4326"]],PROJECTION["Transverse_Mercator"],
      UNIT["metre",1],AUTHORITY["EPSG","32633"]]"""
    assert(CRS.parse(wkt1) == CRS.UTM(33, north = true))
    val wkt2 = """GEOGCRS["WGS 84", DATUM["World Geodetic System 1984"],
      ID["EPSG",4326]]"""
    assert(CRS.parse(wkt2) == CRS.WGS84)
    assertThrows[IllegalArgumentException](CRS.parse("""PROJCS["no authority"]"""))
    // authority-free WKT: Transverse_Mercator parameters are parsed;
    // exact UTM parameterizations resolve to the zone
    val tmWkt = """PROJCS["custom TM",GEOGCS["WGS 84"],
      PROJECTION["Transverse_Mercator"],
      PARAMETER["latitude_of_origin",50],PARAMETER["central_meridian",9],
      PARAMETER["scale_factor",1],PARAMETER["false_easting",3500000],
      PARAMETER["false_northing",200000],UNIT["metre",1]]"""
    assert(CRS.parse(tmWkt) ==
      CRS.TransverseMercator(9, 50, 1.0, 3500000, 200000))
    val utmWkt = """PROJCS["utm-ish",GEOGCS["WGS 84"],
      PROJECTION["Transverse_Mercator"],
      PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",15],
      PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],
      PARAMETER["false_northing",0]]"""
    assert(CRS.parse(utmWkt) == CRS.UTM(33, north = true))
    assert(CRS.parse("""GEOGCS["WGS 84",DATUM["WGS_1984"]]""") == CRS.WGS84)
    // INNER authorities (the GEOGCS id, the UNIT's EPSG:9001) must never
    // resolve the whole CRS: a custom PROJCS without a whole-CRS id
    // parses through its parameters instead of throwing on 9001 or
    // silently coming back geographic
    val innerAuth = """PROJCS["custom TM",GEOGCS["WGS 84",
      AUTHORITY["EPSG","4326"]],PROJECTION["Transverse_Mercator"],
      PARAMETER["latitude_of_origin",50],PARAMETER["central_meridian",9],
      PARAMETER["scale_factor",1],PARAMETER["false_easting",3500000],
      PARAMETER["false_northing",200000],
      UNIT["metre",1,AUTHORITY["EPSG","9001"]]]"""
    assert(CRS.parse(innerAuth) ==
      CRS.TransverseMercator(9, 50, 1.0, 3500000, 200000))
  }

  test("wkb round trip + geometry hash is deterministic") {
    val p = GeomOps.polygonFromBBox(BBox(0, 0, 10, 10))
    val b = GeomOps.writeWkb(p)
    val p2 = GeomOps.readWkb(b)
    assert(p2.equalsExact(p))
    assert(GeomOps.geometryHash(p) == GeomOps.geometryHash(p2))
    assert(GeomOps.geometryHash(p).length == 40)
  }

  test("interior intersects (T********) vs plain intersects") {
    val a = GeomOps.polygonFromBBox(BBox(0, 0, 10, 10))
    val touching = GeomOps.polygonFromBBox(BBox(10, 0, 20, 10)) // shares edge only
    val overlapping = GeomOps.polygonFromBBox(BBox(5, 5, 15, 15))
    assert(a.intersects(touching))
    assert(!GeomOps.interiorIntersects(a, touching)) // interiors don't meet
    assert(GeomOps.interiorIntersects(a, overlapping))
  }

  test("geographic ring from extent densifies reprojected edges") {
    val utm = CRS.UTM(31, north = true)
    // 1000 km × 1000 km at 1 km/px — large enough that the reprojected
    // edges curve more than 1% of their length in lon/lat
    val a = Affine.northUp(200000, 6500000, 1000, -1000)
    val ring = GeomOps.geographicRingFromExtent(a, 1000, 1000, utm)
    assert(ring.isValid)
    assert(ring.getExteriorRing.getNumPoints > 5) // got densified
    // ring covers the reprojected corners
    val (lonUL, latUL) = utm.toLonLat(200000, 6500000)
    assert(ring.getEnvelopeInternal.contains(lonUL, latUL))
  }

  test("antimeridian normalization splits out-of-range polygons") {
    // polygon spanning lon 170..190 (i.e. crossing +180)
    val g = GeomOps.polygonFromBBox(BBox(170, 10, 190, 20))
    val norm = GeomOps.normalizeAntimeridian(g)
    val env = norm.getEnvelopeInternal
    assert(env.getMinX >= -180 && env.getMaxX <= 180)
    // area preserved (degrees²)
    assert(math.abs(norm.getArea - g.getArea) < 1e-9)
    // in-range geometry untouched
    val ok = GeomOps.polygonFromBBox(BBox(-10, 0, 10, 5))
    assert(GeomOps.normalizeAntimeridian(ok) eq ok)
  }

  test("bbox intersects / union / fromExtent") {
    assert(BBox(0, 0, 10, 10).intersects(BBox(10, 10, 20, 20))) // touching counts
    assert(!BBox(0, 0, 10, 10).intersects(BBox(11, 0, 20, 10)))
    val u = BBox(0, 0, 1, 1).union(BBox(5, 5, 6, 7))
    assert(u === BBox(0, 0, 6, 7))
    val b = BBox.fromExtent(Affine.northUp(100, 200, 1, -1), 10, 20)
    assert(b === BBox(100, 180, 110, 200)) // y flipped by negative res
  }

  test("LAEA (EPSG 9820): published ETRS-LAEA example + round trips") {
    // IOGP Guidance Note 7-2 worked example for ETRS89-extended LAEA
    // Europe (EPSG:3035): φ=50°N λ=5°E → E 3962799.45, N 2999718.85
    // (GRS80 vs WGS84 flattening differs < 1 mm)
    val laea = CRS.fromSrid(3035)
    val (x, y) = laea.fromLonLat(5.0, 50.0)
    assert(math.abs(x - 3962799.45) < 0.5, s"E=$x")
    assert(math.abs(y - 2999718.85) < 0.5, s"N=$y")
    val (lon, lat) = laea.toLonLat(x, y)
    assert(math.abs(lon - 5.0) < 1e-8 && math.abs(lat - 50.0) < 1e-8)
    // origin maps to the false origin
    val (ox, oy) = laea.fromLonLat(10, 52)
    assert(math.abs(ox - 4321000) < 1e-6 && math.abs(oy - 3210000) < 1e-6)
    // polar aspect round-trips
    val polar = CRS.LAEA(0, 90)
    val (px, py) = polar.fromLonLat(30, 80)
    val (plon, plat) = polar.toLonLat(px, py)
    assert(math.abs(plon - 30) < 1e-8 && math.abs(plat - 80) < 1e-8)
  }

  test("polar stereographic (EPSG 9810/9829): published UPS example + variant B") {
    // IOGP Guidance Note 7-2 example for UPS North (EPSG:5041, variant A,
    // k0=0.994, FE=FN=2 000 000): φ=73°N λ=44°E → E 3320416.75, N 632668.43
    val ups = CRS.fromSrid(5041)
    val (x, y) = ups.fromLonLat(44.0, 73.0)
    assert(math.abs(x - 3320416.75) < 0.5, s"E=$x")
    assert(math.abs(y - 632668.43) < 0.5, s"N=$y")
    val (lon, lat) = ups.toLonLat(x, y)
    assert(math.abs(lon - 44.0) < 1e-8 && math.abs(lat - 73.0) < 1e-8)
    // variant B: at the standard parallel the scale is exactly 1 —
    // a 1° arc along φF measures its true ellipsoidal length
    val ant = CRS.fromSrid(3031) // Antarctic Polar Stereographic, φF=-71
    val (x1, y1) = ant.fromLonLat(0, -71)
    val (lon1, lat1) = ant.toLonLat(x1, y1)
    assert(math.abs(lon1) < 1e-8 && math.abs(lat1 + 71) < 1e-8)
    // southern aspect round-trips off-meridian too
    val (x2, y2) = ant.fromLonLat(137.25, -80.5)
    val (lon2, lat2) = ant.toLonLat(x2, y2)
    assert(math.abs(lon2 - 137.25) < 1e-8 && math.abs(lat2 + 80.5) < 1e-8)
  }

  test("oblique stereographic (EPSG 9809): origin, scale, round trips") {
    val st = CRS.ObliqueStereographic(5.38763889, 52.15616056, 0.9999079,
      155000.0, 463000.0) // RD-New parameters (on WGS84 here)
    val (ox, oy) = st.fromLonLat(5.38763889, 52.15616056)
    assert(math.abs(ox - 155000.0) < 1e-6 && math.abs(oy - 463000.0) < 1e-6)
    // scale at the origin ≈ k0: a tiny eastward step measures k0 × arc
    val dLon = 1e-6
    val (sx, _) = st.fromLonLat(5.38763889 + dLon, 52.15616056)
    val arc = dLon * math.Pi / 180 *
      (6378137.0 / math.sqrt(1 - 0.00669438 * math.pow(math.sin(52.156 * math.Pi / 180), 2))) *
      math.cos(52.15616056 * math.Pi / 180)
    assert(math.abs((sx - 155000.0) / arc - 0.9999079) < 1e-4)
    val (lon, lat) = st.toLonLat(st.fromLonLat(4.2, 51.1)._1, st.fromLonLat(4.2, 51.1)._2)
    assert(math.abs(lon - 4.2) < 1e-8 && math.abs(lat - 51.1) < 1e-8)
  }

  test("authority-free WKT: LAEA and stereographic parameter parsing") {
    val laeaWkt = """PROJCS["unnamed",GEOGCS["WGS 84",DATUM["WGS_1984",
      SPHEROID["WGS 84",6378137,298.257223563]]],
      PROJECTION["Lambert_Azimuthal_Equal_Area"],
      PARAMETER["latitude_of_center",52],PARAMETER["longitude_of_center",10],
      PARAMETER["false_easting",4321000],PARAMETER["false_northing",3210000],
      UNIT["metre",1]]"""
    val parsed = CRS.parse(laeaWkt)
    assert(parsed.isInstanceOf[CRS.LAEA])
    val (x, y) = parsed.fromLonLat(5.0, 50.0)
    assert(math.abs(x - 3962799.45) < 0.5 && math.abs(y - 2999718.85) < 0.5)

    // polar stereographic variant B: standard parallel, no scale factor
    val polarWkt = """PROJCS["unnamed",GEOGCS["WGS 84",DATUM["WGS_1984",
      SPHEROID["WGS 84",6378137,298.257223563]]],
      PROJECTION["Polar_Stereographic"],
      PARAMETER["latitude_of_origin",-71],PARAMETER["central_meridian",0],
      PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    val polar = CRS.parse(polarWkt).asInstanceOf[CRS.PolarStereographic]
    assert(!polar.north)
    val ref = CRS.fromSrid(3031)
    val (a1, b1) = polar.fromLonLat(100, -75)
    val (a2, b2) = ref.fromLonLat(100, -75)
    assert(math.abs(a1 - a2) < 1e-6 && math.abs(b1 - b2) < 1e-6)

    // oblique stereographic WKT
    val obWkt = """PROJCS["unnamed",GEOGCS["WGS 84",DATUM["WGS_1984",
      SPHEROID["WGS 84",6378137,298.257223563]]],
      PROJECTION["Oblique_Stereographic"],
      PARAMETER["latitude_of_origin",52.15616056],
      PARAMETER["central_meridian",5.38763889],
      PARAMETER["scale_factor",0.9999079],
      PARAMETER["false_easting",155000],PARAMETER["false_northing",463000],
      UNIT["metre",1]]"""
    val ob = CRS.parse(obWkt).asInstanceOf[CRS.ObliqueStereographic]
    assert(math.abs(ob.fromLonLat(5.38763889, 52.15616056)._1 - 155000.0) < 1e-6)

    // WKT routing: "Oblique_Stereographic"/"Double_Stereographic" are the
    // EPSG 9809 double projection; a plain "Stereographic" projection
    // name is the single (Snyder) form
    assert(CRS.parse(obWkt.replace("Oblique_Stereographic", "Double_Stereographic"))
      .isInstanceOf[CRS.ObliqueStereographic])
    assert(CRS.parse(obWkt.replace("Oblique_Stereographic", "Stereographic"))
      .isInstanceOf[CRS.StereographicProper])

    // serialize → parse round-trips the user-defined forms
    for (crs <- Seq(CRS.LAEA(10.5, 47.25, 100, 200),
        CRS.PolarStereographic(-45, north = true, 0.97, 10, 20),
        CRS.ObliqueStereographic(5.4, 52.2, 0.9999, 155000, 463000),
        CRS.StereographicProper(5.4, 52.2, 0.9999, 155000, 463000))) {
      val again = CRS.parse(CRS.serialize(crs))
      val (x0, y0) = crs.fromLonLat(6.0, 51.0)
      val (x1b, y1b) = again.fromLonLat(6.0, 51.0)
      assert(math.abs(x0 - x1b) < 1e-9 && math.abs(y0 - y1b) < 1e-9, crs.toString)
    }
  }

  test("stereographic proper (+proj=stere oblique): Snyder worked example") {
    // Snyder 1987, Map Projections — A Working Manual, numerical example
    // for the SPHERICAL oblique stereographic (p. 307): R=1, k0=1,
    // φ1=40°N, λ0=100°W; point φ=30°N λ=75°W → x=0.3807224, y=−0.1263802.
    // flattening=0 reduces the ellipsoidal form exactly to the spherical
    // projection; our fixed a=6378137 plays R, so compare x/a, y/a.
    val a = 6378137.0
    val sphere = CRS.StereographicProper(-100, 40, 1.0, 0, 0, None, 0.0)
    val (x, y) = sphere.fromLonLat(-75, 30)
    assert(math.abs(x / a - 0.3807224) < 1e-6, s"x/R=${x / a}")
    assert(math.abs(y / a - -0.1263802) < 1e-6, s"y/R=${y / a}")
    // Snyder's inverse example: the same (x, y) recovers φ=30°, λ=−75°
    val (lon, lat) = sphere.toLonLat(x, y)
    assert(math.abs(lon + 75) < 1e-7 && math.abs(lat - 30) < 1e-7)

    // ellipsoidal form: origin maps to (fe, fn), scale at origin ≈ k0
    val st = CRS.StereographicProper(-100, 40, 0.9996, 1000, 2000)
    val (ox, oy) = st.fromLonLat(-100, 40)
    assert(math.abs(ox - 1000) < 1e-6 && math.abs(oy - 2000) < 1e-6)
    val dLon = 1e-6
    val (sx, _) = st.fromLonLat(-100 + dLon, 40)
    val nu = a / math.sqrt(1 - 0.00669437999014132 * math.pow(math.sin(40 * math.Pi / 180), 2))
    val arc = dLon * math.Pi / 180 * nu * math.cos(40 * math.Pi / 180)
    assert(math.abs((sx - 1000) / arc - 0.9996) < 1e-6)
    // round-trips far from the origin
    for ((lo, la) <- Seq((-75.0, 30.0), (-130.0, 55.0), (-100.0, -10.0), (20.0, 40.0))) {
      val (px, py) = st.fromLonLat(lo, la)
      val (rlon, rlat) = st.toLonLat(px, py)
      assert(math.abs(rlon - lo) < 1e-8 && math.abs(rlat - la) < 1e-8, s"($lo,$la)")
    }
    // parse routing: plain stere (non-polar) is the proper projection,
    // sterea stays the 9809 double projection, and they genuinely differ
    // away from the origin (meters — the reason both exist)
    val viaParse = CRS.parse("+proj=stere +lat_0=40 +lon_0=-100")
    assert(viaParse.isInstanceOf[CRS.StereographicProper])
    val double = CRS.parse("+proj=sterea +lat_0=40 +lon_0=-100")
    assert(double.isInstanceOf[CRS.ObliqueStereographic])
    val (pxs, pys) = viaParse.fromLonLat(-75, 30)
    val (pxd, pyd) = double.fromLonLat(-75, 30)
    assert(math.hypot(pxs - pxd, pys - pyd) > 1.0) // distinct projections
    assert(math.hypot(pxs - pxd, pys - pyd) < 2000.0) // but the same family
  }

  test("Lambert conformal conic (EPSG 9801/9802): IOGP worked examples") {
    // IOGP GN 7-2 §3.1.1, LCC 1SP — Jamaica 1969 / Jamaica National Grid
    // (Clarke 1866: a=6378206.400 m, 1/f=294.97870): φ0=18°N λ0=77°W k0=1,
    // FE=250000, FN=150000. Test point φ=17°55'55.80"N λ=76°56'37.26"W →
    // E 255966.58, N 142493.51.
    val jng = CRS.LambertConformalConic(-77, 18, 18, 18, 1.0, 250000, 150000,
      None, 6378206.400, 1.0 / 294.97870)
    val lat = 17 + 55.0 / 60 + 55.80 / 3600
    val lon = -(76 + 56.0 / 60 + 37.26 / 3600)
    val (x, y) = jng.fromLonLat(lon, lat)
    assert(math.abs(x - 255966.58) < 0.05, s"E=$x")
    assert(math.abs(y - 142493.51) < 0.05, s"N=$y")
    val (rlon, rlat) = jng.toLonLat(x, y)
    assert(math.abs(rlon - lon) < 1e-9 && math.abs(rlat - lat) < 1e-9)

    // IOGP GN 7-2 §3.1.1, LCC 2SP — NAD27 / Texas South Central, worked
    // in US survey feet (a = 20925832.16 ft, e² = 0.00676866):
    // φF=27°50' λF=99°W, φ1=28°23' φ2=30°17', EF=2000000 NF=0.
    // Test point φ=28°30'N λ=96°W → E 2963503.91, N 254759.80 (US ft).
    val tx = CRS.LambertConformalConic(-99, 27 + 50.0 / 60,
      28 + 23.0 / 60, 30 + 17.0 / 60, 1.0, 2000000, 0,
      None, 20925832.16, 1 - math.sqrt(1 - 0.00676866))
    val (ex, ny) = tx.fromLonLat(-96, 28.5)
    assert(math.abs(ex - 2963503.91) < 0.1, s"E=$ex")
    assert(math.abs(ny - 254759.80) < 0.1, s"N=$ny")
    val (tlon, tlat) = tx.toLonLat(ex, ny)
    assert(math.abs(tlon + 96) < 1e-9 && math.abs(tlat - 28.5) < 1e-9)
  }

  test("LCC: Lambert-93 instance, conformal-scale property, routing") {
    val l93 = CRS.fromSrid(2154).asInstanceOf[CRS.LambertConformalConic]
    // false origin maps to (FE, FN) exactly
    val (ox, oy) = l93.fromLonLat(3.0, 46.5)
    assert(math.abs(ox - 700000) < 1e-6 && math.abs(oy - 6600000) < 1e-6)
    // conformal with two standard parallels: scale is exactly 1 on both —
    // a tiny eastward arc along φ1/φ2 measures its true ellipsoidal length
    for (sp <- Seq(44.0, 49.0)) {
      val dLon = 1e-6
      val (x0, y0) = l93.fromLonLat(3.0, sp)
      val (x1, y1) = l93.fromLonLat(3.0 + dLon, sp)
      val nu = 6378137.0 /
        math.sqrt(1 - 0.00669437999014132 * math.pow(math.sin(sp * math.Pi / 180), 2))
      val arc = dLon * math.Pi / 180 * nu * math.cos(sp * math.Pi / 180)
      assert(math.abs(math.hypot(x1 - x0, y1 - y0) / arc - 1.0) < 1e-6, s"φ=$sp")
    }
    // round trips across the usable domain (metropolitan France + the
    // overseas domain the projection still resolves, incl. southern lat)
    for ((lo, la) <- Seq((2.35, 48.85), (-4.5, 48.4), (9.5, 41.9),
        (55.5, -21.1), (-61.5, 16.25))) {
      val (px, py) = l93.fromLonLat(lo, la)
      val (rl, rb) = l93.toLonLat(px, py)
      assert(math.abs(rl - lo) < 1e-8 && math.abs(rb - la) < 1e-8, s"($lo,$la)")
    }
    // proj4 routing matches the EPSG instance; serialize round-trips
    val viaProj = CRS.parse(
      "+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000")
    assert(viaProj.isInstanceOf[CRS.LambertConformalConic])
    val (vx, vy) = viaProj.fromLonLat(2.35, 48.85)
    val (gx, gy) = l93.fromLonLat(2.35, 48.85)
    assert(math.abs(vx - gx) < 1e-6 && math.abs(vy - gy) < 1e-6)
    val again = CRS.parse(CRS.serialize(viaProj))
    val (ax, ay) = again.fromLonLat(2.35, 48.85)
    assert(math.abs(ax - vx) < 1e-9 && math.abs(ay - vy) < 1e-9)
    // WKT routing: the 2SP name reads both parallels; the 1SP name takes
    // the origin latitude as the standard parallel
    val wkt2sp = """PROJCS["RGF93 / Lambert-93",GEOGCS["RGF93",DATUM["RGF93",
      SPHEROID["GRS 80",6378137,298.257222101]]],
      PROJECTION["Lambert_Conformal_Conic_2SP"],
      PARAMETER["standard_parallel_1",44],PARAMETER["standard_parallel_2",49],
      PARAMETER["latitude_of_origin",46.5],PARAMETER["central_meridian",3],
      PARAMETER["false_easting",700000],PARAMETER["false_northing",6600000],
      UNIT["metre",1]]"""
    // the SPHEROID node resolves GRS 80 (true Lambert-93 ellipsoid), so
    // the WKT instance differs from the WGS84-flattening EPSG shortcut by
    // the documented < 1 mm
    val (wx, wy) = CRS.parse(wkt2sp).fromLonLat(2.35, 48.85)
    assert(math.abs(wx - gx) < 1e-3 && math.abs(wy - gy) < 1e-3)
    val wkt1sp = """PROJCS["unnamed",GEOGCS["WGS 84",DATUM["WGS_1984",
      SPHEROID["WGS 84",6378137,298.257223563]]],
      PROJECTION["Lambert_Conformal_Conic_1SP"],
      PARAMETER["latitude_of_origin",18],PARAMETER["central_meridian",-77],
      PARAMETER["scale_factor",1],
      PARAMETER["false_easting",250000],PARAMETER["false_northing",150000],
      UNIT["metre",1]]"""
    val w1 = CRS.parse(wkt1sp).asInstanceOf[CRS.LambertConformalConic]
    assert(w1.lat1Deg == 18 && w1.lat2Deg == 18)
    // southern-cone aspect (n < 0) round-trips through the sign-flipped
    // inverse (IOGP note on negative n)
    val south = CRS.LambertConformalConic(-60, -40, -35, -45)
    for ((lo, la) <- Seq((-58.4, -34.6), (-70.65, -33.45), (-47.9, -15.8))) {
      val (px, py) = south.fromLonLat(lo, la)
      val (rl, rb) = south.toLonLat(px, py)
      assert(math.abs(rl - lo) < 1e-8 && math.abs(rb - la) < 1e-8, s"($lo,$la)")
    }
  }

  test("non-WGS84 ellipsoids: OSGB on Airy 1830 (IOGP vector), routing, round trips") {
    // IOGP GN 7-2 Transverse Mercator worked example — OSGB 1936 /
    // British National Grid (Airy 1830: a=6377563.396, 1/f=299.3249646;
    // φ0=49°N λ0=2°W k0=0.9996012717 FE=400000 FN=−100000):
    // φ=50°30'N λ=00°30'E → E 577274.99, N 69740.50.
    val bng = CRS.fromSrid(27700)
    val (e1, n1) = bng.fromLonLat(0.5, 50.5)
    assert(math.abs(e1 - 577274.99) < 0.02, s"E=$e1")
    assert(math.abs(n1 - 69740.50) < 0.02, s"N=$n1")
    val (rlon, rlat) = bng.toLonLat(e1, n1)
    assert(math.abs(rlon - 0.5) < 1e-9 && math.abs(rlat - 50.5) < 1e-9)
    // the same grid on WGS84 differs by real meters — the ellipsoid is used
    val wgsTm = CRS.TransverseMercator(-2, 49, 0.9996012717, 400000, -100000)
    val (ew, nw) = wgsTm.fromLonLat(0.5, 50.5)
    assert(math.hypot(ew - e1, nw - n1) > 5, "Airy vs WGS84 must diverge")
    // proj4 +ellps routing matches the EPSG instance
    val viaProj = CRS.parse("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717" +
      " +x_0=400000 +y_0=-100000 +ellps=airy")
    val (ep, np) = viaProj.fromLonLat(0.5, 50.5)
    assert(math.abs(ep - e1) < 1e-6 && math.abs(np - n1) < 1e-6)
    // +a/+rf form and serialize round-trip
    val viaARf = CRS.parse(CRS.serialize(viaProj))
    val (ea, na) = viaARf.fromLonLat(0.5, 50.5)
    assert(math.abs(ea - e1) < 1e-9 && math.abs(na - n1) < 1e-9)
    // authority-free WKT resolves the SPHEROID node
    val wkt = """PROJCS["OSGB 1936 / British National Grid",GEOGCS["OSGB 1936",
      DATUM["OSGB_1936",SPHEROID["Airy 1830",6377563.396,299.3249646]]],
      PROJECTION["Transverse_Mercator"],
      PARAMETER["latitude_of_origin",49],PARAMETER["central_meridian",-2],
      PARAMETER["scale_factor",0.9996012717],
      PARAMETER["false_easting",400000],PARAMETER["false_northing",-100000],
      UNIT["metre",1]]"""
    val viaWkt = CRS.parse(wkt)
    val (ek, nk) = viaWkt.fromLonLat(0.5, 50.5)
    assert(math.abs(ek - e1) < 1e-6 && math.abs(nk - n1) < 1e-6)
    // Gauss-Krüger zone 4 on Bessel round-trips
    val gk4 = CRS.parse("+proj=tmerc +lat_0=0 +lon_0=12 +k=1 +x_0=4500000 +y_0=0 +ellps=bessel")
    for ((lo, la) <- Seq((11.57, 48.14), (13.4, 52.52), (9.99, 53.55))) {
      val (px, py) = gk4.fromLonLat(lo, la)
      val (rl, rb) = gk4.toLonLat(px, py)
      assert(math.abs(rl - lo) < 1e-9 && math.abs(rb - la) < 1e-9, s"($lo,$la)")
    }
    // a UTM parameterization on a non-WGS84 ellipsoid must NOT claim the
    // EPSG UTM code
    val notUtm = CRS.parse("+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=500000 +y_0=0 +ellps=intl")
    assert(notUtm.isInstanceOf[CRS.TransverseMercator])
    assert(notUtm.srid == 32767)
  }

  test("Albers equal-area conic (EPSG 9822): Snyder example, area property, routing") {
    // Snyder 1987 §14 ellipsoidal numerical example (Clarke 1866,
    // e²=0.00676866): φ1=29.5° φ2=45.5° φ0=23° λ0=−96°; point φ=35°
    // λ=−75° → x = 1885472.7, y = 1535925.0.
    val sn = CRS.AlbersEqualArea(-96, 23, 29.5, 45.5, 0, 0,
      None, 6378206.4, 1 - math.sqrt(1 - 0.00676866))
    val (x, y) = sn.fromLonLat(-75, 35)
    assert(math.abs(x - 1885472.7) < 0.5, s"x=$x")
    assert(math.abs(y - 1535925.0) < 0.5, s"y=$y")
    val (rlon, rlat) = sn.toLonLat(x, y)
    assert(math.abs(rlon + 75) < 1e-8 && math.abs(rlat - 35) < 1e-8)

    // equal-area property on WGS84 CONUS Albers: the projected area of a
    // 1°×1° quad equals its authalic-sphere area to < 1e-6 relative
    val conus = CRS.fromSrid(5070).asInstanceOf[CRS.AlbersEqualArea]
    val quad = Seq((-100.0, 40.0), (-99.0, 40.0), (-99.0, 41.0), (-100.0, 41.0))
    // shoelace over a densified boundary (the edges curve under the cone)
    val ring = (0 until 4).flatMap { i =>
      val (ax, ay) = quad(i); val (bx, by) = quad((i + 1) % 4)
      (0 until 64).map(j => (ax + (bx - ax) * j / 64.0, ay + (by - ay) * j / 64.0))
    }
    val proj = ring.map { case (lo, la) => conus.fromLonLat(lo, la) }
    val area = math.abs((proj :+ proj.head).sliding(2).map {
      case Seq((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1
    }.sum / 2)
    // ellipsoidal quad area via the authalic q: A = a²/2·Δλ·(q(φ2)−q(φ1))
    val e2 = 0.00669437999014132; val e = math.sqrt(e2)
    def qv(latDeg: Double): Double = {
      val s = math.sin(latDeg * math.Pi / 180)
      (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    val truth = 6378137.0 * 6378137.0 / 2 * (math.Pi / 180) * (qv(41) - qv(40))
    assert(math.abs(area / truth - 1) < 1e-6, s"area=$area truth=$truth")

    // southern cone (Australian Albers, n < 0): round-trips + EPSG id
    val aus = CRS.fromSrid(3577)
    for ((lo, la) <- Seq((133.88, -23.7), (151.2, -33.87), (115.86, -31.95), (147.3, -42.9))) {
      val (px, py) = aus.fromLonLat(lo, la)
      val (rl, rb) = aus.toLonLat(px, py)
      assert(math.abs(rl - lo) < 1e-8 && math.abs(rb - la) < 1e-8, s"($lo,$la)")
    }
    // proj4 + WKT routing and serialize round-trip
    val viaProj = CRS.parse("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96")
    assert(viaProj.isInstanceOf[CRS.AlbersEqualArea])
    val (vx, vy) = viaProj.fromLonLat(-100, 40)
    val (cx, cy) = conus.fromLonLat(-100, 40)
    assert(math.abs(vx - cx) < 1e-6 && math.abs(vy - cy) < 1e-6)
    val again = CRS.parse(CRS.serialize(viaProj))
    val (ax2, ay2) = again.fromLonLat(-100, 40)
    assert(math.abs(ax2 - vx) < 1e-9 && math.abs(ay2 - vy) < 1e-9)
    val wkt = """PROJCS["unnamed",GEOGCS["WGS 84",DATUM["WGS_1984",
      SPHEROID["WGS 84",6378137,298.257223563]]],
      PROJECTION["Albers_Conic_Equal_Area"],
      PARAMETER["standard_parallel_1",29.5],PARAMETER["standard_parallel_2",45.5],
      PARAMETER["latitude_of_center",23],PARAMETER["longitude_of_center",-96],
      PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    val w = CRS.parse(wkt)
    assert(w.isInstanceOf[CRS.AlbersEqualArea])
    val (wx, wy) = w.fromLonLat(-100, 40)
    assert(math.abs(wx - cx) < 1e-6 && math.abs(wy - cy) < 1e-6)
  }

  test("Albers spherical limit (+ellps=sphere): finite coords, Snyder §14 sphere vector") {
    // e = 0 made the authalic q's (1/2e)·ln(…) term ∞·0 = NaN (round-7
    // advice); the spherical limit is q = 2 sin φ
    val sph = CRS.parse("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=sphere")
      .asInstanceOf[CRS.AlbersEqualArea]
    // Snyder 1987 §14 spherical example (R=1): φ1=29.5 φ2=45.5 φ0=23
    // λ0=−96, point (−75, 35) → x=0.2952720, y=0.2416774 (Snyder p. 291)
    val r = 6371000.0
    val (x, y) = sph.fromLonLat(-75, 35)
    assert(!x.isNaN && !y.isNaN, s"spherical AEA produced NaN: ($x,$y)")
    assert(math.abs(x / r - 0.2952720) < 1e-6, s"x/R=${x / r}")
    assert(math.abs(y / r - 0.2416774) < 1e-6, s"y/R=${y / r}")
    val (lon, lat) = sph.toLonLat(x, y)
    assert(math.abs(lon + 75) < 1e-8 && math.abs(lat - 35) < 1e-8, s"($lon,$lat)")
  }

  test("towgs84 datum shift: IOGP 9606 vector, OSGB36 chain, parse/serialize") {
    // IOGP GN 7-2 §4.4.4.1 position-vector worked example (WGS72→WGS84):
    // (0, 0, +4.5 m, 0", 0", +0.554", +0.219 ppm)
    val h = CRS.Helmert(0, 0, 4.5, 0, 0, 0.554, 0.219)
    val (x, y, z) = h.forward(3657660.66, 255768.55, 5201382.11)
    assert(math.abs(x - 3657660.78) < 0.01, s"x=$x")
    assert(math.abs(y - 255778.43) < 0.01, s"y=$y")
    assert(math.abs(z - 5201387.75) < 0.01, s"z=$z")
    val (bx, by, bz) = h.inverse(x, y, z)
    assert(math.abs(bx - 3657660.66) < 1e-3 &&
      math.abs(by - 255768.55) < 1e-3 && math.abs(bz - 5201382.11) < 1e-3)

    // OSGB36 National Grid with the published 7-param Helmert; the OS
    // worked example (Caister tower, E 651409.903 N 313177.270) lands on
    // ETRS89 (52.65797861, 1.71605194) — Helmert-level agreement
    val osgb = CRS.parse("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 " +
      "+x_0=400000 +y_0=-100000 +ellps=airy " +
      "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894")
    assert(osgb.isInstanceOf[CRS.DatumShifted])
    val (lon, lat) = CRS.transform(osgb, CRS.WGS84, 651409.903, 313177.270)
    assert(math.abs(lon - 1.7160519) < 2e-5, s"lon=$lon")
    assert(math.abs(lat - 52.6579786) < 2e-5, s"lat=$lat")
    // the same grid point WITHOUT the shift sits ~100 m off — the silent
    // error the datum layer closes
    val bare = CRS.parse("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 " +
      "+x_0=400000 +y_0=-100000 +ellps=airy")
    val (lon0, lat0) = CRS.transform(bare, CRS.WGS84, 651409.903, 313177.270)
    val dM = math.hypot((lon - lon0) * 111320 * math.cos(lat * math.Pi / 180),
      (lat - lat0) * 110574)
    assert(dM > 50 && dM < 200, s"datum displacement $dM m")
    // round-trip through WGS84 back onto the grid (mm-level)
    val (gx2, gy2) = CRS.transform(CRS.WGS84, osgb, lon, lat)
    assert(math.abs(gx2 - 651409.903) < 1e-3 && math.abs(gy2 - 313177.270) < 1e-3,
      s"($gx2,$gy2)")
    // serialize → parse round-trip keeps the datum
    assert(CRS.parse(CRS.serialize(osgb)) == osgb)
    // geographic CRS on a datum: longlat+towgs84 shifts lon/lat themselves
    val ed50ish = CRS.parse("+proj=longlat +ellps=intl +towgs84=-87,-98,-121")
    val (elon, elat) = CRS.transform(ed50ish, CRS.WGS84, 12.0, 52.0)
    val dM2 = math.hypot((elon - 12.0) * 111320 * math.cos(52 * math.Pi / 180),
      (elat - 52.0) * 110574)
    assert(dM2 > 50 && dM2 < 250, s"ED50 displacement $dM2 m")
    // WKT TOWGS84 node parses to the same datum-shifted CRS
    val wkt = """PROJCS["OSGB",GEOGCS["OSGB 1936",DATUM["OSGB_1936",
      SPHEROID["Airy 1830",6377563.396,299.3249646],
      TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]],
      PRIMEM["Greenwich",0]],PROJECTION["Transverse_Mercator"],
      PARAMETER["latitude_of_origin",49],PARAMETER["central_meridian",-2],
      PARAMETER["scale_factor",0.9996012717],
      PARAMETER["false_easting",400000],PARAMETER["false_northing",-100000],
      UNIT["metre",1]]"""
    val fromWkt = CRS.parse(wkt)
    assert(fromWkt.isInstanceOf[CRS.DatumShifted])
    val (wlon, wlat) = CRS.transform(fromWkt, CRS.WGS84, 651409.903, 313177.270)
    assert(math.abs(wlon - lon) < 1e-9 && math.abs(wlat - lat) < 1e-9)

    // PROJ +datum= shorthand expands from the registry at the same
    // full-precision pj_datums values as the explicit chain above — the
    // two routes must agree to numerical noise, not meters
    val viaDatum = CRS.parse("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 " +
      "+x_0=400000 +y_0=-100000 +datum=OSGB36")
    assert(viaDatum.isInstanceOf[CRS.DatumShifted])
    val (dlon, dlat) = CRS.transform(viaDatum, CRS.WGS84, 651409.903, 313177.270)
    assert(math.abs(dlon - lon) < 1e-9 && math.abs(dlat - lat) < 1e-9,
      s"($dlon,$dlat) vs ($lon,$lat)")
    // WGS84-equivalent datums stay unwrapped; grid-shift datums refuse
    assert(CRS.parse("+proj=longlat +datum=WGS84") == CRS.WGS84)
    assert(!CRS.parse("+proj=longlat +datum=NAD83").isInstanceOf[CRS.DatumShifted])
    intercept[IllegalArgumentException] {
      CRS.parse("+proj=longlat +datum=NAD27")
    }
  }

  test("conic inverse longitude wrap is total (tiny cone constant)") {
    // n = sin(1°) ≈ 0.0175 amplifies θ/n: plane points whose bearing from
    // the cone apex approaches ±π unwind to |θ/n + λ0| in the thousands of
    // degrees, where the old (v+540)%360−180 idiom (sign-preserving %)
    // returned < −180
    val c = CRS.LambertConformalConic(0, 1, 1, 1)
    val (ax, ay) = c.fromLonLat(0, 90) // cone apex (t(90°)=0 ⇒ r=0)
    for (ang <- Seq(-3.1, -2.0, 2.0, 3.1); r <- Seq(1e5, 5e6)) {
      val (lon, _) = c.toLonLat(ax + r * math.sin(ang), ay - r * math.cos(ang))
      assert(lon >= -180 && lon < 180,
        s"wrapped lon out of range: $lon (bearing=$ang r=$r)")
    }
    // in-range bearings still invert exactly
    for (lonIn <- Seq(-179.5, -90.0, 90.0, 179.5)) {
      val (px, py) = c.fromLonLat(lonIn, 40)
      val (lon, lat) = c.toLonLat(px, py)
      assert(math.abs(lon - lonIn) < 1e-7 && math.abs(lat - 40) < 1e-8,
        s"($lon,$lat) vs ($lonIn,40)")
    }
  }

  test("rect×rect intersection fast path equals the JTS overlay as a geometry") {
    // the r15 fast path (GeomOps.intersection) must be SEMANTICALLY
    // transparent: identical point set, emptiness, area and envelope.
    // (Ring START PHASE may differ from OverlayNG's — JTS picks a
    // node-dependent start — which no consumer observes: s6_find_cells /
    // findCells derive area+envelope, Layout.covers runs geometric
    // predicates, and no declared query emits or hashes intersection WKB
    // bytes.) Deterministic LCG sweep over overlapping, touching (edge +
    // corner), disjoint, contained and identical pairs.
    var state = 12345L
    def next(): Double = {
      state = (state * 1103515245L + 12345L) & 0x7fffffffL
      (state % 2000L) / 10.0 - 100.0
    }
    def rect(x0: Double, y0: Double, w: Double, h: Double) =
      GeomOps.polygonFromBBox(BBox(x0, y0, x0 + w, y0 + h))
    val cases = Seq.fill(200) {
      val (x, y) = (next(), next())
      val (w1, h1) = (math.abs(next()) % 30 + 0.1, math.abs(next()) % 30 + 0.1)
      val (dx, dy) = (next() % 40, next() % 40)
      val (w2, h2) = (math.abs(next()) % 30 + 0.1, math.abs(next()) % 30 + 0.1)
      (rect(x, y, w1, h1), rect(x + dx, y + dy, w2, h2))
    } ++ Seq(
      (rect(0, 0, 10, 10), rect(10, 0, 10, 10)),   // shared edge → line
      (rect(0, 0, 10, 10), rect(10, 10, 5, 5)),    // shared corner → point
      (rect(0, 0, 10, 10), rect(20, 20, 5, 5)),    // disjoint → empty
      (rect(0, 0, 10, 10), rect(2, 2, 3, 3)),      // contained
      (rect(0, 0, 10, 10), rect(0, 0, 10, 10)))    // identical
    cases.foreach { case (a, b) =>
      val fast = GeomOps.intersection(a, b)
      val jts = a.intersection(b)
      assert(fast.isEmpty == jts.isEmpty, s"emptiness diverged: $a ∩ $b")
      if (!jts.isEmpty) {
        assert(fast.equalsExact(jts.norm(), 0.0) || fast.norm().equalsExact(jts.norm(), 0.0),
          s"point set diverged for $a ∩ $b: fast=$fast jts=$jts")
        assert(fast.getArea == jts.getArea,
          s"area diverged for $a ∩ $b: ${fast.getArea} vs ${jts.getArea}")
        assert(fast.getEnvelopeInternal == jts.getEnvelopeInternal,
          s"envelope diverged for $a ∩ $b")
      }
    }
    // non-rectangle operand takes the overlay path untouched
    val tri = GeomOps.factory.createPolygon(Array(
      new org.locationtech.jts.geom.Coordinate(0, 0),
      new org.locationtech.jts.geom.Coordinate(10, 0),
      new org.locationtech.jts.geom.Coordinate(0, 10),
      new org.locationtech.jts.geom.Coordinate(0, 0)))
    val r = rect(1, 1, 2, 2)
    assert(java.util.Arrays.equals(
      GeomOps.writeWkb(GeomOps.intersection(tri, r)),
      GeomOps.writeWkb(tri.intersection(r))))
  }
}
