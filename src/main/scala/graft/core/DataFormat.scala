package graft.core

/** Pixel data types supported by the engine.
  *
  * Mirrors the reference's dtype set (api/v1/pb/dataformat.proto:13-24,
  * SQL enum create.sql:6): UInt8/16/32, Int8/16/32, Float32, Float64,
  * Complex64. Pure Scala — no Spark dependency — so the raster kernel and
  * the catalog layer share it.
  */
sealed abstract class DType(
    val name: String,
    val sizeBytes: Int,
    val minValue: Double,
    val maxValue: Double,
    val isFloat: Boolean) {
  /** Casting to a dtype is allowed when the full source range fits. */
  def canCastTo(to: DType): Boolean =
    to.isFloat || (!isFloat && minValue >= to.minValue && maxValue <= to.maxValue)
}

object DType {
  case object UInt8 extends DType("uint8", 1, 0, 255, false)
  case object UInt16 extends DType("uint16", 2, 0, 65535, false)
  case object UInt32 extends DType("uint32", 4, 0, 4294967295d, false)
  case object Int8 extends DType("int8", 1, Byte.MinValue, Byte.MaxValue, false)
  case object Int16 extends DType("int16", 2, Short.MinValue, Short.MaxValue, false)
  case object Int32 extends DType("int32", 4, Int.MinValue, Int.MaxValue, false)
  case object Float32 extends DType("float32", 4, -Float.MaxValue, Float.MaxValue, true)
  case object Float64 extends DType("float64", 8, -Double.MaxValue, Double.MaxValue, true)
  case object Complex64 extends DType("complex64", 8, -Float.MaxValue, Float.MaxValue, true)

  val all: Seq[DType] =
    Seq(UInt8, UInt16, UInt32, Int8, Int16, Int32, Float32, Float64, Complex64)

  def fromName(n: String): DType =
    all.find(_.name == n.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown dtype: $n"))
}

/** Closed value range [min, max]. */
final case class NumRange(min: Double, max: Double) {
  def interval: Double = max - min
  def validate(): Unit =
    require(min < max, s"min must be strictly lower than max ($min >= $max)")
}

/** Internal storage format of a raster: dtype + nodata + internal range.
  * NoData == NaN means "not defined" (reference dataformat.go:95-99:
  * floating formats always have an implicit nodata). */
final case class DataFormat(dtype: DType, noData: Double, range: NumRange) {
  def noDataDefined: Boolean = !noData.isNaN || dtype.isFloat

  def validate(): Unit = {
    require(range.min >= dtype.minValue && range.max <= dtype.maxValue,
      s"range out of dtype bounds [${dtype.minValue}, ${dtype.maxValue}]")
    range.validate()
    require(noData.isNaN || (noData >= dtype.minValue && noData <= dtype.maxValue),
      s"noData $noData not representable in ${dtype.name}")
  }

  def equalsFormat(o: DataFormat): Boolean =
    dtype == o.dtype && range == o.range &&
      (noData == o.noData || (noData.isNaN && o.noData.isNaN))
}

/** DataFormat + external range + exponent: the core value transform of the
  * whole system (reference dataformat.go:19-26):
  *   ve = rangeExt.min + rangeExt.interval * ((vi - range.min)/range.interval)^exponent
  */
final case class DataMapping(format: DataFormat, rangeExt: NumRange, exponent: Double) {
  def validate(): Unit = {
    format.validate(); rangeExt.validate()
    require(exponent > 0, "exponent must be strictly positive")
  }

  def equalsMapping(o: DataMapping): Boolean =
    format.equalsFormat(o.format) && rangeExt == o.rangeExt && exponent == o.exponent
}

object DataMapping {
  /** Identity mapping for a format (ext range == internal range, exp 1). */
  def identity(f: DataFormat): DataMapping = DataMapping(f, f.range, 1.0)
}

/** The cast algebra (reference internal/image/image.go:137-219). */
object Cast {

  /** ve = f(vi) — image.go:138-140. */
  def castValue(vi: Double, rin: NumRange, rext: NumRange, exponent: Double): Double =
    rext.min + rext.interval * math.pow((vi - rin.min) / rin.interval, exponent)

  /** Two-hop cast src→external→dst with clamping to the destination dtype's
    * representable bounds — image.go:142-162 (brute-force path; used for
    * nodata remap and the non-closed-form fallback). */
  def castValueBF(vi: Double, from: DataMapping, to: DataMapping): Double = {
    val ve0 = castValue(vi, from.format.range, from.rangeExt, from.exponent)
    val ve = castValue(ve0, to.rangeExt, to.format.range, 1.0 / to.exponent)
    to.format.dtype match {
      case DType.UInt8 | DType.UInt16 | DType.UInt32 =>
        math.min(math.max(ve, 0), to.format.dtype.maxValue)
      case DType.Int8 | DType.Int16 | DType.Int32 =>
        math.min(math.max(ve, to.format.dtype.minValue), to.format.dtype.maxValue)
      case DType.Float32 =>
        math.min(math.max(ve, -Float.MaxValue.toDouble), Float.MaxValue.toDouble)
      case _ => ve
    }
  }

  /** A composed per-file cast: apply
    *   vout = outRange.min + outRange.interval * ((vi - scaleFrom.min)/scaleFrom.interval)^exponent
    * (or identity when scale==None), then write as `to.dtype` with
    * `to.noData`. This is the closed-form composition GDAL receives as
    * translate options (-scale/-exponent), image.go:118-135. */
  final case class CastParams(
      to: DataFormat,
      scale: Option[(NumRange, NumRange)], // (from, to) ranges; None = no rescale
      exponent: Double) {
    /** Evaluate the composed cast on one value (the kernel hot path inlines
      * this; kept allocation-free). */
    def apply(vi: Double): Double = scale match {
      case None => vi
      case Some((f, t)) =>
        if (exponent == 1.0) t.min + t.interval * ((vi - f.min) / f.interval)
        else t.min + t.interval * math.pow((vi - f.min) / f.interval, exponent)
    }
  }

  final case class UnableToCast(from: DataMapping, to: DataMapping)
    extends RuntimeException(s"unable to cast $from to $to")

  /** Algebraic simplification of the composed cast from→to —
    * image.go:166-219 (`CastDatasetOptions`). Returns None when from == to
    * (no cast to perform); throws [[UnableToCast]] for the non-closed-form
    * exponent combinations, exactly like the reference. */
  def castParams(from: DataMapping, to: DataMapping): Option[CastParams] = {
    if (from.equalsMapping(to)) return None

    def options(fromRange: NumRange, exponent: Double, toF: DataFormat): CastParams =
      CastParams(
        toF,
        if (fromRange != toF.range) Some((fromRange, toF.range)) else None,
        exponent)

    if (to.exponent == 1) {
      val rangeEq = NumRange(
        castValue(from.rangeExt.min, to.rangeExt, to.format.range, 1),
        castValue(from.rangeExt.max, to.rangeExt, to.format.range, 1))
      Some(options(from.format.range, from.exponent,
        DataFormat(to.format.dtype, to.format.noData, rangeEq)))
    } else if (from.exponent == 1) {
      val rangeEq = NumRange(
        castValue(to.rangeExt.min, from.rangeExt, from.format.range, 1),
        castValue(to.rangeExt.max, from.rangeExt, from.format.range, 1))
      Some(CastParams(
        to.format,
        if (rangeEq != to.format.range) Some((rangeEq, to.format.range)) else None,
        1.0 / to.exponent))
    } else if (from.exponent == to.exponent && from.rangeExt.min == to.rangeExt.min) {
      val f = from.rangeExt.interval / to.rangeExt.interval
      val rangeEq = NumRange(
        to.format.range.min,
        to.format.range.interval * math.pow(f, 1 / to.exponent) + to.format.range.min)
      Some(options(from.format.range, 1,
        DataFormat(to.format.dtype, to.format.noData, rangeEq)))
    } else {
      throw UnableToCast(from, to)
    }
  }

  /** Round + clamp a double to its storable value in `dtype` (GDAL rounds
    * half away from zero when writing integral types). */
  def storeValue(v: Double, dtype: DType): Double =
    if (dtype.isFloat) {
      if (dtype == DType.Float32) v.toFloat.toDouble else v
    } else {
      val r = math.rint(v) // note: rint is half-even; GDAL uses floor(v+0.5)
      val rounded = if (math.abs(v - math.floor(v)) == 0.5) math.floor(v + 0.5) else r
      math.min(math.max(rounded, dtype.minValue), dtype.maxValue)
    }
}
