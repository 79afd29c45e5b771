package graft.geo

/** 2D affine geotransform, GDAL convention (reference
  * internal/utils/affine/affine.go):
  *   x' = c0 + c1*x + c2*y ;  y' = c3 + c4*x + c5*y
  * i.e. (originX, resX, rotX, originY, rotY, resY).
  * Value class over a 6-array; all ops allocation-light and exact enough in
  * double (the reference uses 128-bit floats for Multiply; at our grid
  * magnitudes double keeps sub-micropixel error, asserted in AffineSpec).
  */
final case class Affine(c0: Double, c1: Double, c2: Double, c3: Double, c4: Double, c5: Double) {

  def rx: Double = c1
  def ry: Double = c5

  def transform(x: Double, y: Double): (Double, Double) =
    (c0 + c1 * x + c2 * y, c3 + c4 * x + c5 * y)

  def transformX(x: Double, y: Double): Double = c0 + c1 * x + c2 * y
  def transformY(x: Double, y: Double): Double = c3 + c4 * x + c5 * y

  def det: Double = c1 * c5 - c2 * c4
  def isInvertible: Boolean = det != 0

  def inverse: Affine = {
    val idet = 1.0 / det
    val (i1, i2, i4, i5) = (c5 * idet, -c2 * idet, -c4 * idet, c1 * idet)
    val i0 = i1 * -c0 + i2 * -c3
    val i3 = i4 * -c0 + i5 * -c3
    Affine(i0, i1, i2, i3, i4, i5)
  }

  /** this ∘ b : apply b first, then this. */
  def multiply(b: Affine): Affine = Affine(
    c0 + c1 * b.c0 + c2 * b.c3,
    c1 * b.c1 + c2 * b.c4,
    c1 * b.c2 + c2 * b.c5,
    c3 + c4 * b.c0 + c5 * b.c3,
    c4 * b.c1 + c5 * b.c4,
    c4 * b.c2 + c5 * b.c5)

  def toArray: Array[Double] = Array(c0, c1, c2, c3, c4, c5)
}

object Affine {
  val identity: Affine = Affine(0, 1, 0, 0, 0, 1)

  def translation(offx: Double, offy: Double): Affine =
    Affine(offx, 1, 0, offy, 0, 1)

  def scale(sx: Double, sy: Double): Affine =
    Affine(0, sx, 0, 0, 0, sy)

  /** North-up grid: origin top-left (x0, y0), positive xRes, negative yRes. */
  def northUp(x0: Double, y0: Double, xRes: Double, yRes: Double): Affine =
    Affine(x0, xRes, 0, y0, 0, yRes)

  def fromArray(a: Array[Double]): Affine =
    Affine(a(0), a(1), a(2), a(3), a(4), a(5))
}

/** Axis-aligned bounding box; the coarse-prune companion of every geometry
  * column (SURVEY §4: substitute for the PostGIS GIST index). */
final case class BBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def intersects(o: BBox): Boolean =
    xmin <= o.xmax && o.xmin <= xmax && ymin <= o.ymax && o.ymin <= ymax
  def union(o: BBox): BBox =
    BBox(math.min(xmin, o.xmin), math.min(ymin, o.ymin),
      math.max(xmax, o.xmax), math.max(ymax, o.ymax))
  def width: Double = xmax - xmin
  def height: Double = ymax - ymin
}

object BBox {
  /** Extent of a width×height grid under pixToCrs (NewPolygonFromExtent,
    * proj.go:300-316 — normalizes min/max for negative resolutions).
    * All FOUR corners are transformed: under a rotated affine (c2/c4 ≠ 0,
    * world-file imports) the other diagonal's corners fall outside the
    * two-corner box, and every coarse prune downstream would silently
    * drop intersecting data. */
  def fromExtent(pixToCrs: Affine, width: Int, height: Int): BBox = {
    val (x1, y1) = pixToCrs.transform(0, 0)
    val (x2, y2) = pixToCrs.transform(width.toDouble, height.toDouble)
    val (x3, y3) = pixToCrs.transform(width.toDouble, 0)
    val (x4, y4) = pixToCrs.transform(0, height.toDouble)
    BBox(math.min(math.min(x1, x2), math.min(x3, x4)),
      math.min(math.min(y1, y2), math.min(y3, y4)),
      math.max(math.max(x1, x2), math.max(x3, x4)),
      math.max(math.max(y1, y2), math.max(y3, y4)))
  }
}
