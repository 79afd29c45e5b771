package graft.raster

/** Resampling algorithms (reference api/v1/pb/variables.proto:17-31; SQL
  * enum create.sql:8). All 13 implemented in pure Scala over the source
  * bitmap: point samplers (near/bilinear/cubic family) sample at a source
  * coordinate; area reducers (average/mode/min/max/med/q1/q3) reduce the
  * source-pixel footprint of one target pixel (GDAL's downsampling
  * semantics). All are nodata-aware: nodata source pixels never
  * contribute. */
sealed abstract class Resampling(val name: String)

object Resampling {
  case object Near extends Resampling("near")
  case object Bilinear extends Resampling("bilinear")
  case object Cubic extends Resampling("cubic")
  case object CubicSpline extends Resampling("cubicspline")
  case object Lanczos extends Resampling("lanczos")
  case object Average extends Resampling("average")
  case object Mode extends Resampling("mode")
  case object Max extends Resampling("max")
  case object Min extends Resampling("min")
  case object Med extends Resampling("med")
  case object Q1 extends Resampling("q1")
  case object Q3 extends Resampling("q3")

  val all: Seq[Resampling] =
    Seq(Near, Bilinear, Cubic, CubicSpline, Lanczos, Average, Mode, Max, Min, Med, Q1, Q3)

  def fromName(n: String): Resampling =
    all.find(_.name == n.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown resampling: $n"))

  /** Smooth algorithms get AVERAGE overviews in the reference
    * (handler_consolidation.go:489-500). */
  def isSmooth(r: Resampling): Boolean = r match {
    case Bilinear | Cubic | CubicSpline | Lanczos | Average => true
    case _ => false
  }
}

/** Point/area sampling over one band of a [[Bitmap]]. Coordinates are in
  * source pixel space, continuous, pixel centers at x+0.5. Returns NaN when
  * the sample has no valid contribution (treated as "skip" by the painter;
  * the caller maps a real NaN-nodata through unchanged). */
object Sampler {

  /** Sample one band at continuous source coords with the given kernel.
    * `scaleX/scaleY` = source pixels per target pixel (≥1 means
    * downscaling; area kernels use the footprint box). */
  def sample(src: Bitmap, band: Int, xf: Double, yf: Double,
      scaleX: Double, scaleY: Double, noData: Double, r: Resampling): Double = {
    r match {
      case Resampling.Near => near(src, band, xf, yf, noData)
      case Resampling.Bilinear => bilinear(src, band, xf, yf, noData)
      case Resampling.Cubic => cubicKernel(src, band, xf, yf, noData, catmullRom)
      case Resampling.CubicSpline => cubicKernel(src, band, xf, yf, noData, bspline)
      case Resampling.Lanczos => lanczos(src, band, xf, yf, noData)
      case _ => area(src, band, xf, yf, math.max(scaleX, 1.0), math.max(scaleY, 1.0), noData, r)
    }
  }

  @inline private def valid(v: Double, noData: Double): Boolean =
    if (noData.isNaN) !v.isNaN else v != noData && !v.isNaN

  def near(src: Bitmap, band: Int, xf: Double, yf: Double, noData: Double): Double = {
    val x = math.floor(xf).toInt
    val y = math.floor(yf).toInt
    if (x < 0 || y < 0 || x >= src.width || y >= src.height) Double.NaN
    else {
      val v = src.get(x, y, band)
      if (valid(v, noData)) v else Double.NaN
    }
  }

  def bilinear(src: Bitmap, band: Int, xf: Double, yf: Double, noData: Double): Double = {
    // pixel centers at integer+0.5
    val gx = xf - 0.5
    val gy = yf - 0.5
    val x0 = math.floor(gx).toInt
    val y0 = math.floor(gy).toInt
    val fx = gx - x0
    val fy = gy - y0
    var sum = 0.0; var wsum = 0.0
    var dy = 0
    while (dy < 2) {
      var dx = 0
      while (dx < 2) {
        val x = x0 + dx; val y = y0 + dy
        if (x >= 0 && y >= 0 && x < src.width && y < src.height) {
          val v = src.get(x, y, band)
          if (valid(v, noData)) {
            val w = (if (dx == 0) 1 - fx else fx) * (if (dy == 0) 1 - fy else fy)
            sum += w * v; wsum += w
          }
        }
        dx += 1
      }
      dy += 1
    }
    if (wsum <= 0) Double.NaN else sum / wsum
  }

  private val catmullRom: Double => Double = t => {
    val x = math.abs(t)
    if (x < 1) 1.5 * x * x * x - 2.5 * x * x + 1
    else if (x < 2) -0.5 * x * x * x + 2.5 * x * x - 4 * x + 2
    else 0
  }

  private val bspline: Double => Double = t => {
    val x = math.abs(t)
    if (x < 1) (4 + x * x * (3 * x - 6)) / 6.0
    else if (x < 2) { val u = 2 - x; u * u * u / 6.0 }
    else 0
  }

  private def cubicKernel(src: Bitmap, band: Int, xf: Double, yf: Double,
      noData: Double, k: Double => Double): Double =
    kernelSample(src, band, xf, yf, noData, 2, k)

  private def lanczos(src: Bitmap, band: Int, xf: Double, yf: Double, noData: Double): Double =
    kernelSample(src, band, xf, yf, noData, 3, t => {
      val x = math.abs(t)
      if (x < 1e-12) 1.0
      else if (x >= 3) 0.0
      else {
        val pix = math.Pi * x
        3 * math.sin(pix) * math.sin(pix / 3) / (pix * pix)
      }
    })

  private def kernelSample(src: Bitmap, band: Int, xf: Double, yf: Double,
      noData: Double, radius: Int, k: Double => Double): Double = {
    val gx = xf - 0.5
    val gy = yf - 0.5
    val x0 = math.floor(gx).toInt
    val y0 = math.floor(gy).toInt
    var sum = 0.0; var wsum = 0.0
    var dy = -radius + 1
    while (dy <= radius) {
      var dx = -radius + 1
      while (dx <= radius) {
        val x = x0 + dx; val y = y0 + dy
        if (x >= 0 && y >= 0 && x < src.width && y < src.height) {
          val v = src.get(x, y, band)
          if (valid(v, noData)) {
            val w = k(gx - x) * k(gy - y)
            sum += w * v; wsum += w
          }
        }
        dx += 1
      }
      dy += 1
    }
    if (wsum <= 0) Double.NaN else sum / wsum
  }

  /** Area reducers over the target pixel's source footprint
    * [xf-sx/2, xf+sx/2) × [yf-sy/2, yf+sy/2). */
  private def area(src: Bitmap, band: Int, xf: Double, yf: Double,
      sx: Double, sy: Double, noData: Double, r: Resampling): Double = {
    val x0 = math.max(0, math.floor(xf - sx / 2).toInt)
    val x1 = math.min(src.width - 1, math.ceil(xf + sx / 2 - 1e-9).toInt - 1)
    val y0 = math.max(0, math.floor(yf - sy / 2).toInt)
    val y1 = math.min(src.height - 1, math.ceil(yf + sy / 2 - 1e-9).toInt - 1)
    if (x1 < x0 || y1 < y0) return near(src, band, xf, yf, noData)
    // This is the warp inner loop (one call per target pixel per band):
    // min/max/average fold through SCALARS, and the rank statistics fill
    // ONE primitive scratch array sorted in place — the previous
    // ArrayBuffer + groupBy/sorted copies allocated per pixel were pure
    // GC churn (~10⁷-10⁸ short-lived objects on a large downscale).
    // Reduction order and tie-breaks are unchanged: row-major
    // left-to-right accumulation, percentile by the same rounded index,
    // mode's strictly-greater scan keeping the smallest value on ties.
    r match {
      case Resampling.Max | Resampling.Min =>
        val wantMax = r == Resampling.Max
        var best = Double.NaN
        var y = y0
        while (y <= y1) {
          var x = x0
          while (x <= x1) {
            val v = src.get(x, y, band)
            if (valid(v, noData) &&
                (best.isNaN || (if (wantMax) v > best else v < best))) best = v
            x += 1
          }
          y += 1
        }
        best
      case Resampling.Mode | Resampling.Med | Resampling.Q1 | Resampling.Q3 =>
        val buf = new Array[Double]((x1 - x0 + 1) * (y1 - y0 + 1))
        var n = 0
        var y = y0
        while (y <= y1) {
          var x = x0
          while (x <= x1) {
            val v = src.get(x, y, band)
            if (valid(v, noData)) { buf(n) = v; n += 1 }
            x += 1
          }
          y += 1
        }
        if (n == 0) Double.NaN
        else {
          java.util.Arrays.sort(buf, 0, n)
          if (r == Resampling.Mode) {
            // ascending runs: only a STRICTLY greater count replaces the
            // best, so the first (smallest) value keeps ties — exactly
            // the old groupBy.maxBy((size, -v)) tie-break
            var bestV = buf(0); var bestC = 1; var curC = 1
            var i = 1
            while (i < n) {
              if (buf(i) == buf(i - 1)) curC += 1 else curC = 1
              if (curC > bestC) { bestC = curC; bestV = buf(i) }
              i += 1
            }
            bestV
          } else {
            val p =
              if (r == Resampling.Med) 0.5
              else if (r == Resampling.Q1) 0.25 else 0.75
            buf(math.min(n - 1, math.max(0, math.round(p * (n - 1)).toInt)))
          }
        }
      case _ => // Average (and the area-family default)
        var sum = 0.0; var n = 0
        var y = y0
        while (y <= y1) {
          var x = x0
          while (x <= x1) {
            val v = src.get(x, y, band)
            if (valid(v, noData)) { sum += v; n += 1 }
            x += 1
          }
          y += 1
        }
        if (n == 0) Double.NaN else sum / n
    }
  }
}
