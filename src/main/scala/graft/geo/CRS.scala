package graft.geo

/** Coordinate reference systems with closed-form transforms.
  *
  * The reference delegates to PROJ (internal/utils/proj/proj.go:26-75); we
  * scope to the CRS whitelist SURVEY §7.4 calls for — WGS84 geographic
  * (EPSG:4326), WebMercator (EPSG:3857), and UTM zones (EPSG:326xx/327xx)
  * — with standard public formulas (spherical Mercator; Krüger series
  * transverse Mercator as published in the PROJ/Snyder literature).
  * All transforms are (lon, lat) degrees ↔ planar (x, y) meters.
  */
sealed trait CRS {
  def srid: Int
  /** planar → lon/lat degrees */
  def toLonLat(x: Double, y: Double): (Double, Double)
  /** lon/lat degrees → planar */
  def fromLonLat(lon: Double, lat: Double): (Double, Double)
  def isGeographic: Boolean = false
}

object CRS {
  private val A = 6378137.0 // WGS84 semi-major
  private val F = 1.0 / 298.257223563
  private val D2R = math.Pi / 180.0
  private val R2D = 180.0 / math.Pi

  case object WGS84 extends CRS {
    val srid = 4326
    def toLonLat(x: Double, y: Double): (Double, Double) = (x, y)
    def fromLonLat(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    override def isGeographic: Boolean = true
  }

  /** Spherical WebMercator, EPSG:3857. */
  case object WebMercator extends CRS {
    val srid = 3857
    val MaxLat = 85.05112877980659 // atan(sinh(pi)) — the square-world limit
    def fromLonLat(lon: Double, lat: Double): (Double, Double) = {
      val la = math.max(-MaxLat, math.min(MaxLat, lat))
      (A * lon * D2R, A * math.log(math.tan(math.Pi / 4 + la * D2R / 2)))
    }
    def toLonLat(x: Double, y: Double): (Double, Double) =
      (x / A * R2D, (2 * math.atan(math.exp(y / A)) - math.Pi / 2) * R2D)
  }

  /** Ellipsoidal transverse Mercator on WGS84 via 6th-order Krüger series
    * (public PROJ/Karney math) at an arbitrary natural origin — the
    * engine's `+proj=tmerc`; UTM zones are fixed-parameter instances.
    * All members are lazy because subclasses supply the parameters. */
  sealed abstract class KruegerTM extends CRS {
    def lon0Deg: Double
    def lat0Deg: Double
    def k0: Double
    def fe: Double
    /** declared false northing (before the lat_0 origin shift) */
    protected def fn0: Double

    private lazy val lon0 = lon0Deg * D2R

    // Krüger series coefficients on the third flattening n
    private val n = F / (2 - F)
    private val n2 = n * n; private val n3 = n2 * n
    private val n4 = n3 * n; private val n5 = n4 * n; private val n6 = n5 * n
    private val aCap = A / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    private val alpha = Array(
      0.0,
      n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
      13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
      61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
      49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
      34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
      212378941.0 / 319334400 * n6)
    private val beta = Array(
      0.0,
      n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5 + 96199.0 / 604800 * n6,
      1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 + 46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
      17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
      4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
      4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
      20648693.0 / 638668800 * n6)
    private val e2 = F * (2 - F)
    private val e = math.sqrt(e2)

    /** (eta, xi) gauss-krüger coords of (lon-lon0, lat), before scaling. */
    private def project(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = latDeg * D2R
      val lon = lonDeg * D2R - lon0
      // conformal latitude
      val t = math.sinh(atanh(math.sin(lat)) - e * atanh(e * math.sin(lat)))
      val xiP = math.atan2(t, math.cos(lon))
      val etaP = asinh(math.sin(lon) / math.hypot(t, math.cos(lon)))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 6) {
        xi += alpha(j) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
        eta += alpha(j) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
        j += 1
      }
      (eta, xi)
    }

    /** Effective false northing: fn0 shifted so (lon0, lat0) maps to
      * (fe, fn0) — the meridian-arc origin shift of `+lat_0=`. */
    private lazy val fn = if (lat0Deg == 0) fn0 else fn0 - k0 * aCap * project(lon0Deg, lat0Deg)._2

    def fromLonLat(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val (eta, xi) = project(lonDeg, latDeg)
      (fe + k0 * aCap * eta, fn + k0 * aCap * xi)
    }

    def toLonLat(xM: Double, yM: Double): (Double, Double) = {
      val xi = (yM - fn) / (k0 * aCap)
      val eta = (xM - fe) / (k0 * aCap)
      var xiP = xi; var etaP = eta
      var j = 1
      while (j <= 6) {
        xiP -= beta(j) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        etaP -= beta(j) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        j += 1
      }
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      val lat = latFromConformal(chi)
      val lon = math.atan2(math.sinh(etaP), math.cos(xiP))
      ((lon + lon0) * R2D, lat * R2D)
    }

    /** Invert the conformal-latitude relation by fixed-point iteration. */
    private def latFromConformal(chi: Double): Double = {
      var lat = chi
      var i = 0
      while (i < 10) {
        val s = math.sin(lat)
        val next = math.asin(math.tanh(atanh(math.sin(chi)) + e * atanh(e * s)))
        if (math.abs(next - lat) < 1e-14) return next
        lat = next
        i += 1
      }
      lat
    }
  }

  /** UTM on WGS84: zone meridian, k0=0.9996, 500 km false easting. */
  final case class UTM(zone: Int, north: Boolean) extends KruegerTM {
    require(zone >= 1 && zone <= 60, s"bad UTM zone $zone")
    val srid: Int = (if (north) 32600 else 32700) + zone
    def lon0Deg: Double = (zone - 1) * 6 - 180 + 3
    def lat0Deg: Double = 0.0
    def k0: Double = 0.9996
    def fe: Double = 500000.0
    protected def fn0: Double = if (north) 0.0 else 10000000.0
  }

  /** Arbitrary-origin transverse Mercator (`+proj=tmerc`). No EPSG id —
    * srid is the TIFF GeoKey "user-defined" sentinel 32767. */
  final case class TransverseMercator(lon0Deg: Double, lat0Deg: Double = 0.0,
      k0: Double = 1.0, fe: Double = 0.0, fnParam: Double = 0.0) extends KruegerTM {
    val srid: Int = 32767
    protected def fn0: Double = fnParam
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
  private def asinh(x: Double): Double = math.log(x + math.hypot(x, 1.0))

  /** CRS from user input: "EPSG:4326", "epsg:32633", srid int. */
  def fromSrid(srid: Int): CRS = srid match {
    case 4326 => WGS84
    case 3857 => WebMercator
    case s if s >= 32601 && s <= 32660 => UTM(s - 32600, north = true)
    case s if s >= 32701 && s <= 32760 => UTM(s - 32700, north = false)
    case s => throw new IllegalArgumentException(s"unsupported SRID: $s")
  }

  /** CRS from user input, mirroring the reference's CRSFromUserInput
    * (proj.go:26-75): EPSG codes ("EPSG:32633" / "32633"), PROJ strings
    * ("+proj=utm +zone=33 ..."), and WKT (resolved through its EPSG
    * authority id). */
  def parse(text: String): CRS = {
    val t = text.trim
    val up = t.toUpperCase
    if (t.startsWith("+")) parseProj4(t)
    else if (up.startsWith("EPSG:")) fromSrid(up.stripPrefix("EPSG:").toInt)
    else if (t.contains("[")) parseWkt(t)
    else fromSrid(t.toInt)
  }

  /** PROJ.4 parameter strings for the supported projection families:
    * longlat, merc/webmerc (spherical WebMercator parameters), utm, tmerc. */
  private def parseProj4(s: String): CRS = {
    val kv = s.split("\\s+").filter(_.startsWith("+")).map(_.stripPrefix("+"))
      .map(_.split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> ""
      }).toMap
    def d(k: String, dflt: Double): Double = kv.get(k).map(_.toDouble).getOrElse(dflt)
    kv.get("proj") match {
      case Some("longlat") | Some("latlong") => WGS84
      case Some("merc") | Some("webmerc") => WebMercator
      case Some("utm") =>
        val zone = kv.getOrElse("zone",
          throw new IllegalArgumentException(s"+proj=utm needs +zone=: $s")).toInt
        UTM(zone, north = !kv.contains("south"))
      case Some("tmerc") =>
        tmercOrUtm(d("lon_0", 0), d("lat_0", 0), d("k", d("k_0", 1.0)),
          d("x_0", 0), d("y_0", 0))
      case p => throw new IllegalArgumentException(
        s"unsupported proj4 ${p.map("+proj=" + _).getOrElse(s)}")
    }
  }

  /** Recognise exact UTM parameterizations so they keep their EPSG id. */
  private def tmercOrUtm(lon0: Double, lat0: Double, k0: Double,
      fe: Double, fn: Double): CRS = {
    val zone = ((lon0 + 180) / 6 + 1).toInt
    if (lat0 == 0 && k0 == 0.9996 && fe == 500000.0 &&
        zone >= 1 && zone <= 60 && (zone - 1) * 6 - 180 + 3 == lon0 &&
        (fn == 0.0 || fn == 10000000.0))
      UTM(zone, north = fn == 0.0)
    else TransverseMercator(lon0, lat0, k0, fe, fn)
  }

  /** WKT1/WKT2: resolved via the outermost EPSG authority/id when present
    * (the last AUTHORITY/ID node — WKT puts the whole-CRS id at the end);
    * otherwise parameter-level parsing of the Transverse_Mercator family
    * (PROJECTION + PARAMETER nodes) and the WGS84-geographic fallback. */
  private def parseWkt(s: String): CRS = {
    val re = """(?i)(?:AUTHORITY|ID)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]""".r
    re.findAllMatchIn(s).toSeq.lastOption match {
      case Some(m) => fromSrid(m.group(1).toInt)
      case None =>
        val projRe = """(?i)PROJECTION\s*\[\s*"([^"]+)"""".r
        val proj = projRe.findFirstMatchIn(s).map(_.group(1).toLowerCase)
        val paramRe = """(?i)PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-0-9.eE+]+)""".r
        lazy val params = paramRe.findAllMatchIn(s)
          .map(m => m.group(1).toLowerCase -> m.group(2).toDouble).toMap
        def p(name: String, dflt: Double) = params.getOrElse(name, dflt)
        proj match {
          case Some(name) if name.contains("transverse") =>
            tmercOrUtm(p("central_meridian", 0), p("latitude_of_origin", 0),
              p("scale_factor", 1.0), p("false_easting", 0), p("false_northing", 0))
          case Some(name) if name.contains("mercator") => WebMercator
          case None if s.toUpperCase.startsWith("GEOGCS") ||
            s.toUpperCase.startsWith("GEOGCRS") => WGS84
          case _ => throw new IllegalArgumentException(
            s"WKT not resolvable (no EPSG id, unsupported projection): ${s.take(60)}...")
        }
    }
  }

  /** Canonical storage string for a CRS, round-trippable through [[parse]]:
    * "EPSG:nnnn" for real EPSG codes, a proj4 parameter string for
    * user-defined systems (their srid is the TIFF "user-defined" sentinel
    * 32767, which parse rightly rejects as an EPSG code). */
  def serialize(crs: CRS): String = crs match {
    case t: TransverseMercator =>
      s"+proj=tmerc +lat_0=${t.lat0Deg} +lon_0=${t.lon0Deg} +k=${t.k0}" +
        s" +x_0=${t.fe} +y_0=${t.fnParam}"
    case c => s"EPSG:${c.srid}"
  }

  /** Planar transform between two CRS (via lon/lat). */
  def transform(from: CRS, to: CRS, x: Double, y: Double): (Double, Double) = {
    if (from == to) (x, y)
    else {
      val (lon, lat) = from.toLonLat(x, y)
      to.fromLonLat(lon, lat)
    }
  }
}
