package graft.geo

/** Coordinate reference systems with closed-form transforms.
  *
  * The reference delegates to PROJ (internal/utils/proj/proj.go:26-75); we
  * scope to the CRS whitelist SURVEY §7.4 calls for — WGS84 geographic
  * (EPSG:4326), WebMercator (EPSG:3857), UTM zones (EPSG:326xx/327xx) —
  * plus the azimuthal families round 2/3 added: arbitrary-origin
  * transverse Mercator, Lambert azimuthal equal-area (EPSG 9820),
  * polar stereographic variants A/B (EPSG 9810/9829), oblique
  * (double) stereographic (EPSG 9809), the oblique/equatorial
  * stereographic proper (PROJ `+proj=stere` away from the poles),
  * and the conic family: Lambert conformal conic 1SP/2SP
  * (EPSG 9801/9802 — Lambert-93, State Plane, Canada Atlas).
  * All with standard public formulas (Snyder 1987; IOGP Guidance
  * Note 7-2; PROJ/Karney Krüger series).
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

  /** Plain geographic CRS on an arbitrary ellipsoid — the carrier for
    * `+proj=longlat +ellps=...` (coordinates are lon/lat degrees on that
    * datum; pair with [[DatumShifted]] for the transformation to WGS84). */
  final case class Geographic(a: Double = A, f: Double = F) extends CRS {
    val srid: Int = 32767
    def toLonLat(x: Double, y: Double): (Double, Double) = (x, y)
    def fromLonLat(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    override def isGeographic: Boolean = true
  }

  /** 7-parameter Helmert datum transformation to WGS84 in the
    * POSITION-VECTOR rotation convention (EPSG method 9606 — the
    * convention PROJ's `+towgs84` parameters use; IOGP GN 7-2 §4.4.4.1).
    * Rotations in arc-seconds, scale in parts-per-million. The reference
    * gets datum shifts from PROJ's CRS resolution (proj.go:26-75). */
  final case class Helmert(dx: Double, dy: Double, dz: Double,
      rx: Double = 0, ry: Double = 0, rz: Double = 0, dsPpm: Double = 0) {
    def isIdentity: Boolean =
      dx == 0 && dy == 0 && dz == 0 && rx == 0 && ry == 0 && rz == 0 && dsPpm == 0
    private val sec2rad = math.Pi / 648000.0
    private val rxr = rx * sec2rad
    private val ryr = ry * sec2rad
    private val rzr = rz * sec2rad
    private val m = 1.0 + dsPpm * 1e-6
    /** source-datum geocentric → WGS84 geocentric (meters). */
    def forward(x: Double, y: Double, z: Double): (Double, Double, Double) = (
      dx + m * (x - rzr * y + ryr * z),
      dy + m * (rzr * x + y - rxr * z),
      dz + m * (-ryr * x + rxr * y + z))
    /** WGS84 geocentric → source-datum geocentric: transposed rotation on
      * the de-translated/de-scaled vector — exact to O(rotation²), below
      * 0.1 mm for any published datum rotation. */
    def inverse(x: Double, y: Double, z: Double): (Double, Double, Double) = {
      val xm = (x - dx) / m; val ym = (y - dy) / m; val zm = (z - dz) / m
      (xm + rzr * ym - ryr * zm,
        -rzr * xm + ym + rxr * zm,
        ryr * xm - rxr * ym + zm)
    }
  }

  /** A CRS whose geodetic coordinates sit on a non-WGS84 datum, carrying
    * the declared towgs84 Helmert. Projection math delegates to the base;
    * [[CRS.transform]] applies the geocentric datum chain whenever source
    * and target datums differ. */
  final case class DatumShifted(base: CRS, shift: Helmert) extends CRS {
    require(!base.isInstanceOf[DatumShifted], "nested datum shift")
    val srid: Int = 32767
    def toLonLat(x: Double, y: Double): (Double, Double) = base.toLonLat(x, y)
    def fromLonLat(lon: Double, lat: Double): (Double, Double) =
      base.fromLonLat(lon, lat)
    override def isGeographic: Boolean = base.isGeographic
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

  /** Ellipsoidal transverse Mercator via 6th-order Krüger series (public
    * PROJ/Karney math) at an arbitrary natural origin — the engine's
    * `+proj=tmerc`; UTM zones are fixed-parameter instances. Defaults to
    * WGS84; `semiMajor`/`flattening` are overridable so national grids on
    * other ellipsoids (OSGB on Airy 1830, Gauss-Krüger on Bessel, NAD27
    * State Plane on Clarke 1866) project correctly — the reference gets
    * this from PROJ's ellipsoid registry (proj.go:26-75). Datum SHIFTS
    * (towgs84) are out of scope; coordinates stay on the declared datum.
    * All members are lazy because subclasses supply the parameters. */
  sealed abstract class KruegerTM extends CRS {
    def lon0Deg: Double
    def lat0Deg: Double
    def k0: Double
    def fe: Double
    /** declared false northing (before the lat_0 origin shift) */
    protected def fn0: Double
    protected def semiMajor: Double = A
    protected def flattening: Double = F

    private lazy val lon0 = lon0Deg * D2R

    // Krüger series coefficients on the third flattening n
    private lazy val n = flattening / (2 - flattening)
    private lazy val n2 = n * n; private lazy val n3 = n2 * n
    private lazy val n4 = n3 * n; private lazy val n5 = n4 * n
    private lazy val n6 = n5 * n
    private lazy val aCap = semiMajor / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    private lazy val alpha = Array(
      0.0,
      n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
      13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
      61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
      49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
      34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
      212378941.0 / 319334400 * n6)
    private lazy val beta = Array(
      0.0,
      n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5 + 96199.0 / 604800 * n6,
      1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 + 46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
      17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
      4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
      4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
      20648693.0 / 638668800 * n6)
    private lazy val e2 = flattening * (2 - flattening)
    private lazy val e = math.sqrt(e2)

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

  /** Arbitrary-origin transverse Mercator (`+proj=tmerc`), optionally on
    * a non-WGS84 ellipsoid (semi-major + flattening). `sridOpt` lets
    * named EPSG instances (27700 …) keep their code; parameter-only
    * instances carry the TIFF "user-defined" sentinel 32767. */
  final case class TransverseMercator(lon0Deg: Double, lat0Deg: Double = 0.0,
      k0: Double = 1.0, fe: Double = 0.0, fnParam: Double = 0.0,
      sridOpt: Option[Int] = None,
      a: Double = A, f: Double = F) extends KruegerTM {
    val srid: Int = sridOpt.getOrElse(32767)
    protected def fn0: Double = fnParam
    override protected def semiMajor: Double = a
    override protected def flattening: Double = f
  }

  /** Named ellipsoids (semi-major, flattening) — the subset of PROJ's
    * registry that national grids actually use. */
  val ellipsoids: Map[String, (Double, Double)] = Map(
    "wgs84" -> ((A, F)),
    "grs80" -> ((6378137.0, 1.0 / 298.257222101)),
    "airy" -> ((6377563.396, 1.0 / 299.3249646)),
    "mod_airy" -> ((6377340.189, 1.0 / 299.3249646)),
    "bessel" -> ((6377397.155, 1.0 / 299.1528128)),
    "clrk66" -> ((6378206.4, 1.0 / 294.9786982)),
    "clrk80ign" -> ((6378249.2, 1.0 / 293.4660213)),
    "intl" -> ((6378388.0, 1.0 / 297.0)),
    "krass" -> ((6378245.0, 1.0 / 298.3)),
    "sphere" -> ((6371000.0, 0.0)))

  /** PROJ's `+datum=` shorthand registry (the towgs84-expressible subset
    * of PROJ's public datum table — grid-shift datums like NAD27 need
    * distortion grids and are out of scope): name → (ellipsoid name,
    * towgs84 parameter string or empty for WGS84-equivalent). */
  val datums: Map[String, (String, String)] = Map(
    "wgs84" -> (("", "")), // default ellipsoid, no shift
    "nad83" -> (("grs80", "")),
    // full-precision PROJ pj_datums values — the truncated 3-dp rotations
    // put +datum=OSGB36 ~1-2 m off the explicit +towgs84 chain
    "osgb36" -> (("airy", "446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894")),
    "ire65" -> (("mod_airy", "482.530,-130.596,564.557,-1.042,-0.214,-0.631,8.15")),
    "potsdam" -> (("bessel", "598.1,73.7,418.2,0.202,0.045,-2.455,6.7")),
    "nzgd49" -> (("intl", "59.47,-5.04,187.44,0.47,-0.1,1.024,-4.5993")),
    "hermannskogel" -> (("bessel", "577.326,90.129,463.919,5.137,1.474,5.297,2.4232")),
    "carthage" -> (("clrk80ign", "-263.0,6.0,431.0")))

  /** Resolve (a, f) from proj4-style params: +ellps name, or explicit
    * +a with +b / +rf / +f; default WGS84. */
  private def ellipsoidOf(kv: Map[String, String]): (Double, Double) = {
    kv.get("ellps").map(_.toLowerCase) match {
      case Some(name) => ellipsoids.getOrElse(name,
        throw new IllegalArgumentException(s"unknown ellipsoid: $name"))
      case None =>
        kv.get("a").map(_.toDouble) match {
          case Some(a) =>
            val f = kv.get("rf").map(rf => 1.0 / rf.toDouble)
              .orElse(kv.get("f").map(_.toDouble))
              .orElse(kv.get("b").map(b => 1.0 - b.toDouble / a))
              .getOrElse(0.0) // +a alone = sphere of radius a (PROJ rule)
            (a, f)
          case None => (A, F)
        }
    }
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
  private def asinh(x: Double): Double = math.log(x + math.hypot(x, 1.0))
  private def sq(x: Double): Double = x * x
  private def clamp1(x: Double): Double = math.max(-1.0, math.min(1.0, x))

  /** Wrap degrees into [−180, 180). Scala's `%` is sign-preserving, so the
    * `(v + 540) % 360 − 180` idiom returns < −180 once |v| exceeds 540° —
    * reachable through a conic inverse with a tiny cone constant n (θ/n
    * amplifies); the floor-based wrap is total. */
  private def wrapLonDeg(v: Double): Double =
    v - 360.0 * math.floor((v + 180.0) / 360.0)

  /** Ellipsoidal Lambert azimuthal equal-area on WGS84 (EPSG method 9820;
    * Snyder 1987 §24 oblique + polar aspects). `sridOpt` lets named EPSG
    * instances (3035 …) keep their code; parameter-only instances carry the
    * user-defined sentinel. */
  final case class LAEA(lon0Deg: Double, lat0Deg: Double,
      fe: Double = 0.0, fn: Double = 0.0,
      sridOpt: Option[Int] = None) extends CRS {
    val srid: Int = sridOpt.getOrElse(32767)
    private val e2 = F * (2 - F); private val e = math.sqrt(e2)
    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private val qp = q(math.Pi / 2)
    private val lat0 = lat0Deg * D2R; private val lon0 = lon0Deg * D2R
    private val northPolar = lat0Deg >= 90 - 1e-9
    private val southPolar = lat0Deg <= -(90 - 1e-9)
    private val beta1 = math.asin(clamp1(q(lat0) / qp))
    private val Rq = A * math.sqrt(qp / 2)
    private val m1 = math.cos(lat0) / math.sqrt(1 - e2 * sq(math.sin(lat0)))
    private val Dd = if (northPolar || southPolar) 1.0 else A * m1 / (Rq * math.cos(beta1))

    def fromLonLat(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = latDeg * D2R
      val dl = (lonDeg * D2R) - lon0
      if (northPolar) {
        val rho = A * math.sqrt(math.max(0, qp - q(phi)))
        (fe + rho * math.sin(dl), fn - rho * math.cos(dl))
      } else if (southPolar) {
        val rho = A * math.sqrt(math.max(0, qp + q(phi)))
        (fe + rho * math.sin(dl), fn + rho * math.cos(dl))
      } else {
        val beta = math.asin(clamp1(q(phi) / qp))
        val b = Rq * math.sqrt(2.0 / (1 + math.sin(beta1) * math.sin(beta) +
          math.cos(beta1) * math.cos(beta) * math.cos(dl)))
        (fe + b * Dd * math.cos(beta) * math.sin(dl),
          fn + (b / Dd) * (math.cos(beta1) * math.sin(beta) -
            math.sin(beta1) * math.cos(beta) * math.cos(dl)))
      }
    }

    /** φ from the authalic q by Snyder's fixed-point iteration (eq. 3-16). */
    private def latFromQ(qv: Double): Double = {
      var phi = math.asin(clamp1(qv / 2))
      var i = 0
      while (i < 15) {
        val s = math.sin(phi)
        val d = sq(1 - e2 * s * s) / (2 * math.cos(phi)) *
          (qv / (1 - e2) - s / (1 - e2 * s * s) +
            (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
        phi += d
        if (math.abs(d) < 1e-14) return phi
        i += 1
      }
      phi
    }

    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val xr = x - fe; val yr = y - fn
      if (northPolar || southPolar) {
        val rho = math.hypot(xr, yr)
        if (rho < 1e-9) return (lon0 * R2D, lat0Deg)
        val qv = if (northPolar) qp - sq(rho / A) else sq(rho / A) - qp
        val lam = if (northPolar) lon0 + math.atan2(xr, -yr) else lon0 + math.atan2(xr, yr)
        (lam * R2D, latFromQ(qv) * R2D)
      } else {
        val rho = math.hypot(xr / Dd, Dd * yr)
        if (rho < 1e-9) return (lon0 * R2D, lat0Deg)
        val ce = 2 * math.asin(clamp1(rho / (2 * Rq)))
        val qv = qp * (math.cos(ce) * math.sin(beta1) +
          Dd * yr * math.sin(ce) * math.cos(beta1) / rho)
        val lam = lon0 + math.atan2(xr * math.sin(ce),
          Dd * rho * math.cos(beta1) * math.cos(ce) -
            sq(Dd) * yr * math.sin(beta1) * math.sin(ce))
        (lam * R2D, latFromQ(qv) * R2D)
      }
    }
  }

  /** Ellipsoidal polar stereographic on WGS84, variant A (EPSG method
    * 9810; Snyder 1987 §21): natural origin at the pole, scale `k0` there.
    * Variant B (standard parallel instead of k0) converts via
    * [[PolarStereographic.fromStandardParallel]]. */
  final case class PolarStereographic(lon0Deg: Double, north: Boolean,
      k0: Double = 0.994, fe: Double = 2000000.0, fn: Double = 2000000.0,
      sridOpt: Option[Int] = None) extends CRS {
    val srid: Int = sridOpt.getOrElse(32767)
    private val e2 = F * (2 - F); private val e = math.sqrt(e2)
    private val lon0 = lon0Deg * D2R
    private val rhoF = 2 * A * k0 /
      math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
    private def tOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) *
        math.pow((1 + e * s) / (1 - e * s), e / 2)
    }
    def fromLonLat(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = (if (north) latDeg else -latDeg) * D2R
      val dl = (lonDeg * D2R) - lon0
      val rho = rhoF * tOf(phi)
      if (north) (fe + rho * math.sin(dl), fn - rho * math.cos(dl))
      else (fe + rho * math.sin(dl), fn + rho * math.cos(dl))
    }
    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val xr = x - fe; val yr = y - fn
      val rho = math.hypot(xr, yr)
      val t = rho / rhoF
      // iterate φ = π/2 − 2 atan(t·((1−e sinφ)/(1+e sinφ))^{e/2})
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val s = math.sin(phi)
        val next = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * s) / (1 + e * s), e / 2))
        if (math.abs(next - phi) < 1e-14) { phi = next; i = 15 } else { phi = next; i += 1 }
      }
      val lam = if (north) lon0 + math.atan2(xr, -yr) else lon0 + math.atan2(xr, yr)
      (wrapLonDeg(lam * R2D), (if (north) phi else -phi) * R2D)
    }
  }

  object PolarStereographic {
    /** Variant B: standard parallel φF → the equivalent natural-origin
      * scale k0 = (mF/2tF)·√((1+e)^(1+e)(1−e)^(1−e)) (EPSG method 9829). */
    def fromStandardParallel(lon0Deg: Double, stdParallelDeg: Double,
        fe: Double, fn: Double, sridOpt: Option[Int] = None): PolarStereographic = {
      val e2 = F * (2 - F); val e = math.sqrt(e2)
      val north = stdParallelDeg >= 0
      val phiF = math.abs(stdParallelDeg) * D2R
      val sF = math.sin(phiF)
      val mF = math.cos(phiF) / math.sqrt(1 - e2 * sF * sF)
      val tF = math.tan(math.Pi / 4 - phiF / 2) *
        math.pow((1 + e * sF) / (1 - e * sF), e / 2)
      val k0 = mF / (2 * tF) *
        math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
      PolarStereographic(lon0Deg, north, k0, fe, fn, sridOpt)
    }
  }

  /** Oblique/equatorial stereographic on WGS84 (EPSG method 9809, the
    * double projection via the conformal sphere — `+proj=sterea`). */
  final case class ObliqueStereographic(lon0Deg: Double, lat0Deg: Double,
      k0: Double = 1.0, fe: Double = 0.0, fn: Double = 0.0,
      sridOpt: Option[Int] = None) extends CRS {
    val srid: Int = sridOpt.getOrElse(32767)
    private val e2 = F * (2 - F); private val e = math.sqrt(e2)
    private val lat0 = lat0Deg * D2R; private val lon0 = lon0Deg * D2R
    private val s0 = math.sin(lat0)
    private val rho0 = A * (1 - e2) / math.pow(1 - e2 * s0 * s0, 1.5)
    private val nu0 = A / math.sqrt(1 - e2 * s0 * s0)
    private val R = math.sqrt(rho0 * nu0)
    private val n = math.sqrt(1 + e2 * math.pow(math.cos(lat0), 4) / (1 - e2))
    private val (c, chi0) = {
      val s1 = (1 + s0) / (1 - s0)
      val s2 = (1 - e * s0) / (1 + e * s0)
      val w1 = math.pow(s1 * math.pow(s2, e), n)
      val sinChi0a = (w1 - 1) / (w1 + 1)
      val cc = (n + s0) * (1 - sinChi0a) / ((n - s0) * (1 + sinChi0a))
      val w2 = cc * w1
      (cc, math.asin(clamp1((w2 - 1) / (w2 + 1))))
    }
    def fromLonLat(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = latDeg * D2R
      val lam = lonDeg * D2R
      val bigL = n * (lam - lon0) + lon0
      val s = math.sin(phi)
      val sa = (1 + s) / (1 - s)
      val sb = (1 - e * s) / (1 + e * s)
      val w = c * math.pow(sa * math.pow(sb, e), n)
      val chi = math.asin(clamp1((w - 1) / (w + 1)))
      val dl = bigL - lon0
      val b = 1 + math.sin(chi) * math.sin(chi0) +
        math.cos(chi) * math.cos(chi0) * math.cos(dl)
      (fe + 2 * R * k0 * math.cos(chi) * math.sin(dl) / b,
        fn + 2 * R * k0 * (math.sin(chi) * math.cos(chi0) -
          math.cos(chi) * math.sin(chi0) * math.cos(dl)) / b)
    }
    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val xr = x - fe; val yr = y - fn
      val g = 2 * R * k0 * math.tan(math.Pi / 4 - chi0 / 2)
      val h = 4 * R * k0 * math.tan(chi0) + g
      val i = math.atan2(xr, h + yr)
      val j = math.atan2(xr, g - yr) - i
      val chi = chi0 + 2 * math.atan((yr - xr * math.tan(j / 2)) / (2 * R * k0))
      val bigL = j + 2 * i + lon0
      val lam = (bigL - lon0) / n + lon0
      val psi = 0.5 * math.log((1 + math.sin(chi)) / (c * (1 - math.sin(chi)))) / n
      var phi = 2 * math.atan(math.exp(psi)) - math.Pi / 2
      var it = 0
      while (it < 15) {
        val s = math.sin(phi)
        val psiI = math.log(math.tan(phi / 2 + math.Pi / 4) *
          math.pow((1 - e * s) / (1 + e * s), e / 2))
        val d = -(psiI - psi) * math.cos(phi) * (1 - e2 * s * s) / (1 - e2)
        phi += d
        if (math.abs(d) < 1e-14) it = 15 else it += 1
      }
      (lam * R2D, phi * R2D)
    }
  }

  /** Oblique/equatorial stereographic proper — the single-projection
    * ellipsoidal form PROJ's `+proj=stere` uses away from the poles
    * (Snyder 1987 §21, eq. 21-27..21-40: conformal latitude + spherical
    * stereographic on it, scaled by 2·a·k0·m1/cosχ1). Distinct from EPSG
    * method 9809 ([[ObliqueStereographic]], `+proj=sterea`), which maps
    * via a conformal SPHERE and differs by meters at distance from the
    * origin. `flattening = 0` gives the exact spherical projection
    * (Snyder eq. 21-2..21-4), used by the published-vector test. */
  final case class StereographicProper(lon0Deg: Double, lat0Deg: Double,
      k0: Double = 1.0, fe: Double = 0.0, fn: Double = 0.0,
      sridOpt: Option[Int] = None, flattening: Double = F) extends CRS {
    require(math.abs(lat0Deg) < 90 - 1e-9,
      s"polar origin lat_0=$lat0Deg belongs to PolarStereographic")
    val srid: Int = sridOpt.getOrElse(32767)
    private val e2 = flattening * (2 - flattening); private val e = math.sqrt(e2)
    private val lat0 = lat0Deg * D2R; private val lon0 = lon0Deg * D2R
    /** conformal latitude χ(φ) — Snyder eq. 3-1. */
    private def chiOf(phi: Double): Double = {
      val s = math.sin(phi)
      2 * math.atan(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1 - e * s) / (1 + e * s), e / 2)) - math.Pi / 2
    }
    private val chi1 = chiOf(lat0)
    private val sinChi1 = math.sin(chi1); private val cosChi1 = math.cos(chi1)
    private val m1 = math.cos(lat0) / math.sqrt(1 - e2 * sq(math.sin(lat0)))
    /** 2·a·k0·m1/cosχ1 — the constant part of Snyder eq. 21-34. */
    private val akm1 = 2 * A * k0 * m1 / cosChi1

    def fromLonLat(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val chi = chiOf(latDeg * D2R)
      val dl = lonDeg * D2R - lon0
      val sinChi = math.sin(chi); val cosChi = math.cos(chi)
      val aA = akm1 / (1 + sinChi1 * sinChi + cosChi1 * cosChi * math.cos(dl))
      (fe + aA * cosChi * math.sin(dl),
        fn + aA * (cosChi1 * sinChi - sinChi1 * cosChi * math.cos(dl)))
    }

    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val xr = x - fe; val yr = y - fn
      val rho = math.hypot(xr, yr)
      if (rho < 1e-9) return (lon0Deg, lat0Deg)
      val ce = 2 * math.atan(rho / akm1) // Snyder eq. 21-38 (akm1 = 2ak0m1/cosχ1)
      val chi = math.asin(clamp1(math.cos(ce) * sinChi1 +
        yr * math.sin(ce) * cosChi1 / rho))
      val lam = lon0 + math.atan2(xr * math.sin(ce),
        rho * cosChi1 * math.cos(ce) - yr * sinChi1 * math.sin(ce))
      // φ from χ by fixed-point on Snyder eq. 3-4
      var phi = chi
      var i = 0
      while (i < 15) {
        val s = math.sin(phi)
        val next = 2 * math.atan(math.tan(math.Pi / 4 + chi / 2) *
          math.pow((1 + e * s) / (1 - e * s), e / 2)) - math.Pi / 2
        if (math.abs(next - phi) < 1e-14) { phi = next; i = 15 }
        else { phi = next; i += 1 }
      }
      (wrapLonDeg(lam * R2D), phi * R2D)
    }
  }

  /** Lambert conformal conic on WGS84 (EPSG methods 9801 1SP / 9802 2SP;
    * IOGP Guidance Note 7-2 §3.1.1; Snyder 1987 §15). The reference accepts
    * any PROJ-known CRS (internal/utils/proj/proj.go:26-75); LCC is what
    * France Lambert-93 (EPSG:2154), most US State Plane zones and Canada's
    * national grids use. The 1SP method is the `lat1 = lat2 = lat0`
    * instance carrying its k0; 2SP keeps k0 = 1 and a false origin whose
    * latitude may sit off both parallels. `semiMajor`/`flattening` default
    * to WGS84 and exist so the published worked examples on other
    * ellipsoids (Clarke 1866) can drive the vector tests. */
  final case class LambertConformalConic(lon0Deg: Double, lat0Deg: Double,
      lat1Deg: Double, lat2Deg: Double, k0: Double = 1.0,
      fe: Double = 0.0, fn: Double = 0.0,
      sridOpt: Option[Int] = None,
      semiMajor: Double = A, flattening: Double = F) extends CRS {
    require(math.abs(lat1Deg) < 90 - 1e-9 && math.abs(lat2Deg) < 90 - 1e-9,
      s"standard parallels must be non-polar: $lat1Deg, $lat2Deg")
    require(math.abs(lat1Deg + lat2Deg) > 1e-9,
      s"parallels symmetric about the equator degenerate (n=0): $lat1Deg, $lat2Deg")
    val srid: Int = sridOpt.getOrElse(32767)
    private val e2 = flattening * (2 - flattening); private val e = math.sqrt(e2)
    private val lon0 = lon0Deg * D2R
    /** isometric-latitude exponential t(φ) — IOGP GN 7-2 eq. for 9802. */
    private def tOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) *
        math.pow((1 + e * s) / (1 - e * s), e / 2)
    }
    private def mOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - e2 * s * s)
    }
    private val phi1 = lat1Deg * D2R; private val phi2 = lat2Deg * D2R
    /** cone constant; the single-parallel limit is sin φ1 (method 9801). */
    private val n =
      if (lat1Deg == lat2Deg) math.sin(phi1)
      else (math.log(mOf(phi1)) - math.log(mOf(phi2))) /
        (math.log(tOf(phi1)) - math.log(tOf(phi2)))
    private val bigF = mOf(phi1) / (n * math.pow(tOf(phi1), n))
    private val aFk = semiMajor * bigF * k0
    /** cone radius at the (false/natural) origin latitude. */
    private val r0 = aFk * math.pow(tOf(lat0Deg * D2R), n)

    def fromLonLat(lonDeg: Double, latDeg: Double): (Double, Double) = {
      // the pole on the cone-apex side has t→0 so r→0: maps to the apex
      val r = aFk * math.pow(tOf(latDeg * D2R), n)
      val theta = n * (lonDeg * D2R - lon0)
      (fe + r * math.sin(theta), fn + r0 - r * math.cos(theta))
    }

    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val xr = x - fe; val yr = r0 - (y - fn)
      // when n < 0 the signs of E' and (r0−N') flip for both r' and θ'
      val sgn = if (n >= 0) 1.0 else -1.0
      val rP = sgn * math.hypot(xr, yr)
      if (math.abs(rP) < 1e-9) return (lon0Deg, if (n >= 0) 90.0 else -90.0)
      val tP = math.pow(rP / aFk, 1.0 / n)
      val theta = math.atan2(sgn * xr, sgn * yr)
      // φ from t' by the same fixed-point as polar stereographic
      var phi = math.Pi / 2 - 2 * math.atan(tP)
      var i = 0
      while (i < 15) {
        val s = math.sin(phi)
        val next = math.Pi / 2 - 2 * math.atan(
          tP * math.pow((1 - e * s) / (1 + e * s), e / 2))
        if (math.abs(next - phi) < 1e-14) { phi = next; i = 15 }
        else { phi = next; i += 1 }
      }
      (wrapLonDeg((theta / n + lon0) * R2D), phi * R2D)
    }
  }

  /** Albers equal-area conic on WGS84 (EPSG method 9822; Snyder 1987 §14
    * ellipsoidal) — the other conic a real catalog hits (CONUS Albers
    * EPSG:5070, Australian Albers EPSG:3577). Same parameter shape as
    * [[LambertConformalConic]]; southern cones (n < 0) use the
    * sign-flipped inverse. Equal-area: built on the authalic q(φ), not
    * the conformal t(φ). */
  final case class AlbersEqualArea(lon0Deg: Double, lat0Deg: Double,
      lat1Deg: Double, lat2Deg: Double,
      fe: Double = 0.0, fn: Double = 0.0,
      sridOpt: Option[Int] = None,
      semiMajor: Double = A, flattening: Double = F) extends CRS {
    require(math.abs(lat1Deg) < 90 - 1e-9 && math.abs(lat2Deg) < 90 - 1e-9,
      s"standard parallels must be non-polar: $lat1Deg, $lat2Deg")
    require(math.abs(lat1Deg + lat2Deg) > 1e-9,
      s"parallels symmetric about the equator degenerate (n=0): $lat1Deg, $lat2Deg")
    val srid: Int = sridOpt.getOrElse(32767)
    private val e2 = flattening * (2 - flattening); private val e = math.sqrt(e2)
    private val lon0 = lon0Deg * D2R
    /** authalic q(φ) — Snyder eq. 3-12 (the LAEA q, on this ellipsoid).
      * The spherical limit (e→0, reachable via `+ellps=sphere` / a bare
      * `+a=`) is q = 2 sin φ — the ellipsoidal form's (1/2e)·ln(…) term is
      * ∞·0 = NaN there. */
    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      if (e < 1e-12) 2 * s
      else (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private def mOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - e2 * s * s)
    }
    private val phi1 = lat1Deg * D2R; private val phi2 = lat2Deg * D2R
    private val m1 = mOf(phi1)
    /** cone constant (Snyder eq. 14-14; sin φ1 in the one-parallel limit). */
    private val n =
      if (lat1Deg == lat2Deg) math.sin(phi1)
      else (m1 * m1 - sq(mOf(phi2))) / (q(phi2) - q(phi1))
    private val cC = m1 * m1 + n * q(phi1)
    private def rho(phi: Double): Double =
      semiMajor * math.sqrt(math.max(0, cC - n * q(phi))) / n
    private val rho0 = rho(lat0Deg * D2R)

    def fromLonLat(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val r = rho(latDeg * D2R)
      val theta = n * (lonDeg * D2R - lon0)
      (fe + r * math.sin(theta), fn + rho0 - r * math.cos(theta))
    }

    /** φ from the authalic q by Snyder's fixed-point iteration (eq. 3-16);
      * the spherical limit inverts in closed form (φ = asin(q/2)). */
    private def latFromQ(qv: Double): Double = {
      val qp = q(math.Pi / 2)
      if (math.abs(qv) >= qp - 1e-12) return if (qv > 0) math.Pi / 2 else -math.Pi / 2
      if (e < 1e-12) return math.asin(clamp1(qv / 2))
      var phi = math.asin(clamp1(qv / 2))
      var i = 0
      while (i < 15) {
        val s = math.sin(phi)
        val d = sq(1 - e2 * s * s) / (2 * math.cos(phi)) *
          (qv / (1 - e2) - s / (1 - e2 * s * s) +
            (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
        phi += d
        if (math.abs(d) < 1e-14) return phi
        i += 1
      }
      phi
    }

    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val xr = x - fe; val yr = rho0 - (y - fn)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rP = sgn * math.hypot(xr, yr)
      val theta = math.atan2(sgn * xr, sgn * yr)
      val qv = (cC - sq(rP * n / semiMajor)) / n
      (wrapLonDeg((theta / n + lon0) * R2D), latFromQ(qv) * R2D)
    }
  }

  /** CRS from user input: "EPSG:4326", "epsg:32633", srid int. */
  def fromSrid(srid: Int): CRS = srid match {
    case 4326 => WGS84
    case 3857 => WebMercator
    case s if s >= 32601 && s <= 32660 => UTM(s - 32600, north = true)
    case s if s >= 32701 && s <= 32760 => UTM(s - 32700, north = false)
    // named azimuthal instances (ellipsoid approximated by WGS84; GRS80
    // differs by < 1 mm in flattening)
    case 3035 => LAEA(10, 52, 4321000, 3210000, Some(3035)) // ETRS89-extended LAEA Europe
    case 5041 => PolarStereographic(0, north = true, sridOpt = Some(5041)) // UPS North
    case 5042 => PolarStereographic(0, north = false, sridOpt = Some(5042)) // UPS South
    case 3031 => PolarStereographic.fromStandardParallel(0, -71, 0, 0, Some(3031)) // Antarctic
    case 3413 => PolarStereographic.fromStandardParallel(-45, 70, 0, 0, Some(3413)) // NSIDC North
    // named conic instances (GRS80 ≈ WGS84, same < 1 mm caveat as above)
    case 2154 => LambertConformalConic(3, 46.5, 44, 49, 1.0,
      700000, 6600000, Some(2154)) // RGF93 / Lambert-93
    case 3978 => LambertConformalConic(-95, 49, 49, 77, 1.0,
      0, 0, Some(3978)) // NAD83 / Canada Atlas Lambert
    case 5070 => AlbersEqualArea(-96, 23, 29.5, 45.5,
      0, 0, Some(5070)) // NAD83 / Conus Albers
    case 3577 => AlbersEqualArea(132, 0, -18, -36,
      0, 0, Some(3577)) // GDA94 / Australian Albers (southern cone)
    case 27700 => // OSGB 1936 / British National Grid (Airy 1830)
      val (a, f) = ellipsoids("airy")
      TransverseMercator(-2, 49, 0.9996012717, 400000, -100000, Some(27700), a, f)
    case s => throw new IllegalArgumentException(s"unsupported SRID: $s")
  }

  /** CRS from user input, mirroring the reference's CRSFromUserInput
    * (proj.go:26-75): EPSG codes ("EPSG:32633" / "32633"), PROJ strings
    * ("+proj=utm +zone=33 ..."), and WKT (resolved through its EPSG
    * authority id). */
  def parse(text: String): CRS = {
    // memoized: expression paths (ST_Transform) resolve the CRS per row,
    // and a scan at scale would otherwise re-split the proj4/WKT string
    // millions of times. Bounded: distinct CRS strings per job are few.
    val cached = parseCache.get(text)
    if (cached != null) cached
    else {
      val crs = parseUncached(text)
      if (parseCache.size < 4096) parseCache.putIfAbsent(text, crs)
      crs
    }
  }

  private val parseCache = new java.util.concurrent.ConcurrentHashMap[String, CRS]()

  private def parseUncached(text: String): CRS = {
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
    val kv0 = s.split("\\s+").filter(_.startsWith("+")).map(_.stripPrefix("+"))
      .map(_.split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> ""
      }).toMap
    // PROJ `+datum=` shorthand expands to +ellps / +towgs84; explicitly
    // spelled parameters win over the registry expansion
    val kv = kv0.get("datum").map(_.toLowerCase) match {
      case Some(name) =>
        val (ellps, tw) = datums.getOrElse(name,
          throw new IllegalArgumentException(
            s"unsupported datum: $name (grid-shift datums need distortion grids)"))
        var m = kv0
        if (ellps.nonEmpty && !m.contains("ellps") && !m.contains("a"))
          m += ("ellps" -> ellps)
        if (tw.nonEmpty && !m.contains("towgs84")) m += ("towgs84" -> tw)
        m
      case None => kv0
    }
    def d(k: String, dflt: Double): Double = kv.get(k).map(_.toDouble).getOrElse(dflt)
    val base = kv.get("proj") match {
      case Some("longlat") | Some("latlong") =>
        val (a, f) = ellipsoidOf(kv)
        if (a == A && f == F) WGS84 else Geographic(a, f)
      case Some("webmerc") => WebMercator
      case Some("merc") =>
        // PROJ's `merc` is the ELLIPSOIDAL Mercator (EPSG:3395-style)
        // unless the ellipsoid degenerates to the 3857 sphere (+a=+b=
        // 6378137 / +R= / +ellps=sphere — GDAL's 3857 proj4 string).
        // Substituting spherical WebMercator for ellipsoidal data would
        // misplace it ~37 km at lat 60 — refuse instead of guessing.
        val spherical = (kv.get("R").exists(_.toDouble == A)) ||
          (kv.get("a").exists(_.toDouble == A) && kv.get("a") == kv.get("b")) ||
          (kv.get("ellps").contains("sphere") && !kv.contains("a"))
        if (spherical && d("lat_ts", 0) == 0 && d("lon_0", 0) == 0) WebMercator
        else throw new IllegalArgumentException(
          s"unsupported: ellipsoidal or non-3857 Mercator ($s)")
      case Some("utm") =>
        val zone = kv.getOrElse("zone",
          throw new IllegalArgumentException(s"+proj=utm needs +zone=: $s")).toInt
        val north = !kv.contains("south")
        val (a, f) = ellipsoidOf(kv)
        if (a == A && f == F) UTM(zone, north)
        else
          // a UTM grid on another ellipsoid (ED50, SAD69 …) is a plain
          // tmerc with the UTM constants on that ellipsoid — dropping
          // the declared +ellps/+datum projected ~100-200 m off
          TransverseMercator((zone - 1) * 6 - 180 + 3, 0, 0.9996, 500000.0,
            if (north) 0.0 else 10000000.0, None, a, f)
      case Some("tmerc") =>
        val (a, f) = ellipsoidOf(kv)
        tmercOrUtm(d("lon_0", 0), d("lat_0", 0), d("k", d("k_0", 1.0)),
          d("x_0", 0), d("y_0", 0), a, f)
      case Some("laea") =>
        LAEA(d("lon_0", 0), d("lat_0", 0), d("x_0", 0), d("y_0", 0))
      case Some("lcc") =>
        // PROJ: lat_2 defaults to lat_1; the 1SP form keeps its +k_0
        val l1 = d("lat_1", 0); val l2 = d("lat_2", l1)
        val (a, f) = ellipsoidOf(kv)
        LambertConformalConic(d("lon_0", 0), d("lat_0", 0), l1, l2,
          d("k", d("k_0", 1.0)), d("x_0", 0), d("y_0", 0), None, a, f)
      case Some("aea") =>
        val l1 = d("lat_1", 0); val l2 = d("lat_2", l1)
        val (a, f) = ellipsoidOf(kv)
        AlbersEqualArea(d("lon_0", 0), d("lat_0", 0), l1, l2,
          d("x_0", 0), d("y_0", 0), None, a, f)
      case Some("stere") if math.abs(d("lat_0", 0)) >= 90 - 1e-9 =>
        // polar: +lat_ts (standard parallel, variant B) wins over +k
        val lts = d("lat_ts", Double.NaN)
        if (!lts.isNaN)
          PolarStereographic.fromStandardParallel(d("lon_0", 0), lts,
            d("x_0", 0), d("y_0", 0))
        else PolarStereographic(d("lon_0", 0), north = d("lat_0", 0) > 0,
          d("k", d("k_0", 1.0)), d("x_0", 0), d("y_0", 0))
      case Some("stere") =>
        // non-polar stere proper (Snyder oblique/equatorial), matching
        // PROJ: plain `stere` is the single projection, `sterea` the
        // double one. +ellps=sphere / +R= select the spherical form.
        val flat = if (kv.contains("R") || kv.get("ellps").contains("sphere")) 0.0 else F
        StereographicProper(d("lon_0", 0), d("lat_0", 0),
          d("k", d("k_0", 1.0)), d("x_0", 0), d("y_0", 0), None, flat)
      case Some("sterea") =>
        // double (conformal-sphere) stereographic, EPSG method 9809
        ObliqueStereographic(d("lon_0", 0), d("lat_0", 0),
          d("k", d("k_0", 1.0)), d("x_0", 0), d("y_0", 0))
      case p => throw new IllegalArgumentException(
        s"unsupported proj4 ${p.map("+proj=" + _).getOrElse(s)}")
    }
    withTowgs84(base, kv.get("towgs84"))
  }

  /** Wrap a parsed CRS with its declared +towgs84/TOWGS84 datum shift
    * (3 = translation-only or 7 parameters; an all-zero shift means the
    * datum IS WGS84 and stays unwrapped, the PROJ convention). */
  private def withTowgs84(base: CRS, towgs84: Option[String]): CRS =
    towgs84 match {
      case None => base
      case Some(v) =>
        val p = v.split(",").map(_.trim.toDouble)
        require(p.length == 3 || p.length == 7,
          s"towgs84 needs 3 or 7 parameters: $v")
        val h =
          if (p.length == 3) Helmert(p(0), p(1), p(2))
          else Helmert(p(0), p(1), p(2), p(3), p(4), p(5), p(6))
        if (h.isIdentity) base else DatumShifted(base, h)
    }

  /** Recognise exact UTM parameterizations so they keep their EPSG id
    * (WGS84 only — a UTM grid on another ellipsoid is a plain tmerc). */
  private def tmercOrUtm(lon0: Double, lat0: Double, k0: Double,
      fe: Double, fn: Double, a: Double = A, f: Double = F): CRS = {
    val zone = ((lon0 + 180) / 6 + 1).toInt
    if (a == A && f == F && lat0 == 0 && k0 == 0.9996 && fe == 500000.0 &&
        zone >= 1 && zone <= 60 && (zone - 1) * 6 - 180 + 3 == lon0 &&
        (fn == 0.0 || fn == 10000000.0))
      UTM(zone, north = fn == 0.0)
    else TransverseMercator(lon0, lat0, k0, fe, fn, None, a, f)
  }

  /** WKT1/WKT2: resolved via the outermost EPSG authority/id when present
    * (the last AUTHORITY/ID node — WKT puts the whole-CRS id at the end);
    * otherwise parameter-level parsing of the Transverse_Mercator family
    * (PROJECTION + PARAMETER nodes) and the WGS84-geographic fallback. */
  private def parseWkt(s: String): CRS = {
    val re = """(?i)(?:AUTHORITY|ID)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]""".r
    // a DATUM-level TOWGS84 node rides along with parameter-level parsing
    // (when the CRS resolves through its EPSG id, the id wins — EPSG
    // definitions are datum-complete)
    val towgs84Re = """(?i)TOWGS84\s*\[([^\]]*)\]""".r
    // only the WHOLE-CRS id may short-circuit parameter parsing: that is
    // the AUTHORITY/ID node sitting directly inside the outer CRS node
    // (bracket depth 1). An inner node's authority (UNIT metre → 9001,
    // the GEOGCS inside a custom PROJCS → 4326) must never resolve the
    // CRS — custom projected WKT without a whole-CRS id would otherwise
    // throw on 9001 or silently come back geographic.
    def bracketDepthAt(i: Int): Int = {
      var d = 0
      var k = 0
      while (k < i) {
        val c = s.charAt(k)
        if (c == '[') d += 1 else if (c == ']') d -= 1
        k += 1
      }
      d
    }
    val topLevelId = re.findAllMatchIn(s).toSeq
      .filter(m => bracketDepthAt(m.start) == 1)
      .lastOption.map(_.group(1).toInt)
    topLevelId match {
      case Some(srid) => fromSrid(srid)
      case None =>
        val projRe = """(?i)PROJECTION\s*\[\s*"([^"]+)"""".r
        // WKT2 spells the operation METHOD["Name"]
        val methodRe = """(?i)METHOD\s*\[\s*"([^"]+)"""".r
        val proj = projRe.findFirstMatchIn(s).orElse(methodRe.findFirstMatchIn(s))
          .map(_.group(1).toLowerCase.replace(' ', '_'))
        val paramRe = """(?i)PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-0-9.eE+]+)""".r
        // normalize WKT1/WKT2 parameter spellings to one key space
        lazy val params = paramRe.findAllMatchIn(s)
          .map(m => m.group(1).toLowerCase.replace(' ', '_') -> m.group(2).toDouble).toMap
        def p(names: Seq[String], dflt: Double): Double =
          names.collectFirst { case nm if params.contains(nm) => params(nm) }.getOrElse(dflt)
        val lat0 = p(Seq("latitude_of_origin", "latitude_of_natural_origin",
          "latitude_of_center", "latitude_of_false_origin"), 0)
        val lon0 = p(Seq("central_meridian", "longitude_of_natural_origin",
          "longitude_of_center", "longitude_of_origin",
          "longitude_of_false_origin"), 0)
        val k0 = p(Seq("scale_factor", "scale_factor_at_natural_origin"), 1.0)
        val feP = p(Seq("false_easting", "easting_at_false_origin"), 0)
        val fnP = p(Seq("false_northing", "northing_at_false_origin"), 0)
        // ellipsoid from the SPHEROID/ELLIPSOID node (a, 1/f; 1/f=0 means
        // sphere) — the tmerc/conic families project on the declared one
        val sphRe = """(?i)(?:SPHEROID|ELLIPSOID)\s*\[\s*"[^"]*"\s*,\s*([-0-9.eE+]+)\s*,\s*([-0-9.eE+]+)""".r
        lazy val (ellA, ellF) = sphRe.findFirstMatchIn(s)
          .map { m =>
            val rf = m.group(2).toDouble
            (m.group(1).toDouble, if (rf == 0) 0.0 else 1.0 / rf)
          }
          .getOrElse((A, F))
        val baseW = proj match {
          case Some(name) if name.contains("transverse") =>
            tmercOrUtm(lon0, lat0, k0, feP, fnP, ellA, ellF)
          case Some(name) if name.contains("azimuthal_equal_area") =>
            LAEA(lon0, lat0, feP, fnP)
          case Some(name) if name.contains("lambert_conformal") ||
              name.contains("lambert_conic") =>
            // 2SP (EPSG 9802) when standard parallels are spelled out;
            // 1SP (9801) otherwise — the origin latitude IS the parallel
            val sp1 = p(Seq("standard_parallel_1",
              "latitude_of_1st_standard_parallel"), Double.NaN)
            val sp2 = p(Seq("standard_parallel_2",
              "latitude_of_2nd_standard_parallel"), Double.NaN)
            if (sp1.isNaN) LambertConformalConic(lon0, lat0, lat0, lat0, k0,
              feP, fnP, None, ellA, ellF)
            else LambertConformalConic(lon0, lat0, sp1,
              if (sp2.isNaN) sp1 else sp2, k0, feP, fnP, None, ellA, ellF)
          case Some(name) if name.contains("albers") =>
            // "Albers_Conic_Equal_Area" (WKT1) / "Albers Equal Area" (9822)
            val sp1 = p(Seq("standard_parallel_1",
              "latitude_of_1st_standard_parallel"), Double.NaN)
            val sp2 = p(Seq("standard_parallel_2",
              "latitude_of_2nd_standard_parallel"), Double.NaN)
            if (sp1.isNaN) AlbersEqualArea(lon0, lat0, lat0, lat0,
              feP, fnP, None, ellA, ellF)
            else AlbersEqualArea(lon0, lat0, sp1,
              if (sp2.isNaN) sp1 else sp2, feP, fnP, None, ellA, ellF)
          case Some(name) if name.contains("polar_stereographic") =>
            // variant B carries a standard parallel (|φ| < 90 in the
            // latitude slot) and no scale factor; variant A a ±90 origin + k0
            val std = p(Seq("standard_parallel_1", "latitude_of_standard_parallel"),
              Double.NaN)
            if (!std.isNaN)
              PolarStereographic.fromStandardParallel(lon0, std, feP, fnP)
            else if (math.abs(lat0) < 90 - 1e-9)
              PolarStereographic.fromStandardParallel(lon0, lat0, feP, fnP)
            else PolarStereographic(lon0, north = lat0 > 0, k0, feP, fnP)
          case Some(name) if name.contains("stereographic") &&
              (name.contains("oblique") || name.contains("double")) =>
            // EPSG 9809 "Oblique Stereographic" / ESRI "Double_Stereographic"
            ObliqueStereographic(lon0, lat0, k0, feP, fnP)
          case Some(name) if name.contains("stereographic") =>
            StereographicProper(lon0, lat0, k0, feP, fnP)
          case Some(name) if name.contains("mercator") => WebMercator
          case None if s.toUpperCase.startsWith("GEOGCS") ||
              s.toUpperCase.startsWith("GEOGCRS") =>
            if (ellA == A && ellF == F) WGS84 else Geographic(ellA, ellF)
          case _ => throw new IllegalArgumentException(
            s"WKT not resolvable (no EPSG id, unsupported projection): ${s.take(60)}...")
        }
        withTowgs84(baseW, towgs84Re.findFirstMatchIn(s).map(_.group(1)))
    }
  }

  /** Canonical storage string for a CRS, round-trippable through [[parse]]:
    * "EPSG:nnnn" for real EPSG codes, a proj4 parameter string for
    * user-defined systems (their srid is the TIFF "user-defined" sentinel
    * 32767, which parse rightly rejects as an EPSG code). */
  def serialize(crs: CRS): String = crs match {
    case d: DatumShifted =>
      val h = d.shift
      proj4Of(d.base) +
        s" +towgs84=${h.dx},${h.dy},${h.dz},${h.rx},${h.ry},${h.rz},${h.dsPpm}"
    case c if c.srid != 32767 => s"EPSG:${c.srid}"
    case c => proj4Of(c)
  }

  /** proj4 parameter string, never the EPSG shortcut — [[DatumShifted]]
    * serialization appends +towgs84 and must stay parse-compatible. */
  private def proj4Of(crs: CRS): String = crs match {
    case WGS84 => "+proj=longlat"
    case g: Geographic => "+proj=longlat" + ellipsoidSuffix(g.a, g.f)
    case WebMercator => "+proj=webmerc"
    case u: UTM =>
      s"+proj=utm +zone=${u.zone}" + (if (u.north) "" else " +south")
    case t: TransverseMercator =>
      s"+proj=tmerc +lat_0=${t.lat0Deg} +lon_0=${t.lon0Deg} +k=${t.k0}" +
        s" +x_0=${t.fe} +y_0=${t.fnParam}" + ellipsoidSuffix(t.a, t.f)
    case l: LAEA =>
      s"+proj=laea +lat_0=${l.lat0Deg} +lon_0=${l.lon0Deg}" +
        s" +x_0=${l.fe} +y_0=${l.fn}"
    case p: PolarStereographic =>
      s"+proj=stere +lat_0=${if (p.north) 90 else -90} +lon_0=${p.lon0Deg}" +
        s" +k=${p.k0} +x_0=${p.fe} +y_0=${p.fn}"
    case st: StereographicProper =>
      s"+proj=stere +lat_0=${st.lat0Deg} +lon_0=${st.lon0Deg} +k=${st.k0}" +
        s" +x_0=${st.fe} +y_0=${st.fn}" +
        (if (st.flattening == 0) " +ellps=sphere" else "")
    case o: ObliqueStereographic =>
      s"+proj=sterea +lat_0=${o.lat0Deg} +lon_0=${o.lon0Deg} +k=${o.k0}" +
        s" +x_0=${o.fe} +y_0=${o.fn}"
    case l: LambertConformalConic =>
      s"+proj=lcc +lat_1=${l.lat1Deg} +lat_2=${l.lat2Deg}" +
        s" +lat_0=${l.lat0Deg} +lon_0=${l.lon0Deg} +k_0=${l.k0}" +
        s" +x_0=${l.fe} +y_0=${l.fn}" + ellipsoidSuffix(l.semiMajor, l.flattening)
    case ab: AlbersEqualArea =>
      s"+proj=aea +lat_1=${ab.lat1Deg} +lat_2=${ab.lat2Deg}" +
        s" +lat_0=${ab.lat0Deg} +lon_0=${ab.lon0Deg}" +
        s" +x_0=${ab.fe} +y_0=${ab.fn}" + ellipsoidSuffix(ab.semiMajor, ab.flattening)
    case d: DatumShifted => serialize(d)
    case c => s"EPSG:${c.srid}"
  }

  /** Non-WGS84 ellipsoid parameters for [[serialize]], parse-compatible. */
  private def ellipsoidSuffix(a: Double, f: Double): String =
    if (a == A && f == F) ""
    else if (f == 0.0) s" +a=$a"
    else s" +a=$a +rf=${1.0 / f}"

  // ---------------------------------------------------------------- datum

  /** Geodetic (degrees, h = 0) → geocentric XYZ meters on ellipsoid (a, f). */
  def geodeticToGeocentric(lonDeg: Double, latDeg: Double,
      a: Double, f: Double): (Double, Double, Double) = {
    val e2 = f * (2 - f)
    val lon = lonDeg * D2R; val lat = latDeg * D2R
    val s = math.sin(lat); val c = math.cos(lat)
    val nN = a / math.sqrt(1 - e2 * s * s)
    (nN * c * math.cos(lon), nN * c * math.sin(lon), nN * (1 - e2) * s)
  }

  /** Geocentric XYZ → geodetic degrees on ellipsoid (a, f), h discarded:
    * fixed-point in φ (contraction ≈ e² per pass ⇒ machine precision well
    * inside the 12-pass cap). */
  def geocentricToGeodetic(x: Double, y: Double, z: Double,
      a: Double, f: Double): (Double, Double) = {
    val e2 = f * (2 - f)
    val p = math.hypot(x, y)
    var phi = math.atan2(z, p * (1 - e2))
    var i = 0
    while (i < 12) {
      val s = math.sin(phi)
      val nN = a / math.sqrt(1 - e2 * s * s)
      val next = math.atan2(z + e2 * nN * s, p)
      if (math.abs(next - phi) < 1e-15) { phi = next; i = 12 }
      else { phi = next; i += 1 }
    }
    (math.atan2(y, x) * R2D, phi * R2D)
  }

  /** The ellipsoid a CRS's geodetic coordinates are defined on. */
  def ellipsoidOfCrs(crs: CRS): (Double, Double) = crs match {
    case DatumShifted(b, _) => ellipsoidOfCrs(b)
    case g: Geographic => (g.a, g.f)
    case t: TransverseMercator => (t.a, t.f)
    case l: LambertConformalConic => (l.semiMajor, l.flattening)
    case ab: AlbersEqualArea => (ab.semiMajor, ab.flattening)
    case st: StereographicProper => (A, st.flattening)
    case _ => (A, F)
  }

  private def shiftOf(c: CRS): Option[Helmert] = c match {
    case DatumShifted(_, h) => Some(h)
    case _ => None
  }

  /** Geodetic datum chain: source geodetic → source geocentric → (Helmert
    * to WGS84) → (reverse Helmert to target) → target geodetic. Identity
    * when neither side declares a shift (the pre-datum behavior: lon/lat
    * pass through on the assumption of a shared datum). A side WITHOUT a
    * declared shift is taken as WGS84 for the geocentric conversion. */
  private def shiftDatum(from: CRS, to: CRS,
      lon: Double, lat: Double): (Double, Double) = {
    val fs = shiftOf(from); val ts = shiftOf(to)
    if (fs.isEmpty && ts.isEmpty) (lon, lat)
    else {
      val (fa, ff) = if (fs.isDefined) ellipsoidOfCrs(from) else (A, F)
      val (ta, tf) = if (ts.isDefined) ellipsoidOfCrs(to) else (A, F)
      var (gx, gy, gz) = geodeticToGeocentric(lon, lat, fa, ff)
      fs.foreach { h =>
        val r = h.forward(gx, gy, gz); gx = r._1; gy = r._2; gz = r._3
      }
      ts.foreach { h =>
        val r = h.inverse(gx, gy, gz); gx = r._1; gy = r._2; gz = r._3
      }
      geocentricToGeodetic(gx, gy, gz, ta, tf)
    }
  }

  /** Planar transform between two CRS (via lon/lat, datum-aware). */
  def transform(from: CRS, to: CRS, x: Double, y: Double): (Double, Double) = {
    if (from == to) (x, y)
    else {
      val (lon, lat) = from.toLonLat(x, y)
      val (lon2, lat2) = shiftDatum(from, to, lon, lat)
      to.fromLonLat(lon2, lat2)
    }
  }
}
