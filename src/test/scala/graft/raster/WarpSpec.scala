package graft.raster

import graft.core._
import graft.geo.{Affine, CRS}
import org.scalatest.funsuite.AnyFunSuite

/** Kernel golden tests mirroring the reference's warp/cast fixture
  * behaviors (FIXTURES.md §2 warp0-6 scenarios, DatasetEquals assertions:
  * size/dtype/bands/nodata/pixels). */
class WarpSpec extends AnyFunSuite {
  import DType._

  private def dm(dt: DType, noData: Double, min: Double, max: Double,
      emin: Double, emax: Double, exp: Double = 1): DataMapping =
    DataMapping(DataFormat(dt, noData, NumRange(min, max)), NumRange(emin, emax), exp)

  private def bitmapOf(w: Int, h: Int, dt: DType, vals: Double*): Bitmap =
    new Bitmap(w, h, 1, dt, vals.toArray)

  val grid: Affine = Affine.northUp(0, 4, 1, -1) // 4×4 world, 1 unit/px

  test("bitmap byte round-trip for every dtype") {
    for (dt <- Seq(UInt8, Int8, UInt16, Int16, UInt32, Int32, Float32, Float64)) {
      val vals: Seq[Double] = dt match {
        case UInt8 => Seq(0, 127, 255, 42)
        case Int8 => Seq(-128, 0, 127, -1)
        case UInt16 => Seq(0, 65535, 1000, 42)
        case Int16 => Seq(-32768, 32767, 0, -42)
        case UInt32 => Seq(0, 4294967295d, 7, 42)
        case Int32 => Seq(Int.MinValue, Int.MaxValue, 0, 1)
        case _ => Seq(-1.5, 0.25, 3.75, -0.125)
      }
      val b = bitmapOf(2, 2, dt, vals: _*)
      val rt = Bitmap.fromBytes(b.toBytes, 2, 2, 1, dt)
      assert(rt.pixels.toSeq == vals, s"dtype $dt")
    }
  }

  test("merge on identical grid = pure cast (warp6 shape: float→uint8)") {
    // Float32 [0,1] nodata 0 → UInt8 [0,254] nodata 255
    val src = dm(Float32, 0.0, 0, 1, 0, 1)
    val out = dm(UInt8, 255, 0, 254, 0, 1)
    val bm = bitmapOf(2, 2, Float32, 0.0, 0.5, 1.0, 0.25)
    val merged = Warp.mergeDatasets(
      Seq(SourceRaster(bm, Affine.northUp(0, 2, 1, -1), CRS.WGS84, src)),
      OutDescriptor(2, 2, 1, Affine.northUp(0, 2, 1, -1), CRS.WGS84, out, Resampling.Near)).get
    // 0.0 is nodata → stays 255 (init); 0.5→127, 1.0→254, 0.25→63.5→64
    assert(merged.pixels.toSeq == Seq(255.0, 127.0, 254.0, 64.0))
    assert(merged.dtype == UInt8)
  }

  test("mosaic: later source overwrites, nodata does not (latest-wins + mask)") {
    val m = dm(UInt8, 0, 0, 254, 0, 254) // identity mapping, nodata 0
    val older = bitmapOf(2, 2, UInt8, 10, 10, 10, 10)
    val newer = bitmapOf(2, 2, UInt8, 99, 0, 99, 0) // nodata holes at 2 pixels
    val g = Affine.northUp(0, 2, 1, -1)
    val merged = Warp.mergeDatasets(
      Seq(SourceRaster(older, g, CRS.WGS84, m), SourceRaster(newer, g, CRS.WGS84, m)),
      OutDescriptor(2, 2, 1, g, CRS.WGS84, m, Resampling.Near)).get
    // newer wins where valid; older shows through newer's nodata holes
    assert(merged.pixels.toSeq == Seq(99.0, 10.0, 99.0, 10.0))
  }

  test("partial overlap: disjoint area keeps nodata init") {
    val m = dm(UInt8, 0, 0, 254, 0, 254)
    val src = bitmapOf(2, 2, UInt8, 5, 6, 7, 8)
    // source covers only the left half of a 4×2 target
    val merged = Warp.mergeDatasets(
      Seq(SourceRaster(src, Affine.northUp(0, 2, 1, -1), CRS.WGS84, m)),
      OutDescriptor(4, 2, 1, Affine.northUp(0, 2, 1, -1), CRS.WGS84, m, Resampling.Near)).get
    assert(merged.pixels.toSeq == Seq(5.0, 6.0, 0.0, 0.0, 7.0, 8.0, 0.0, 0.0))
  }

  test("validPixPc drops mostly-empty slices") {
    val m = dm(UInt8, 0, 0, 254, 0, 254)
    val src = bitmapOf(1, 1, UInt8, 9)
    val out = OutDescriptor(10, 10, 1, Affine.northUp(0, 10, 1, -1), CRS.WGS84, m,
      Resampling.Near, validPixPc = 50)
    // 1 valid pixel of 100 < 50% → dropped
    assert(Warp.mergeDatasets(
      Seq(SourceRaster(src, Affine.northUp(0, 1, 1, -1), CRS.WGS84, m)), out).isEmpty)
    // validPixPc 0 = keep unless fully empty (reference image.go:373-381)
    assert(Warp.mergeDatasets(
      Seq(SourceRaster(src, Affine.northUp(0, 1, 1, -1), CRS.WGS84, m)),
      out.copy(validPixPc = 0)).isDefined)
  }

  test("bilinear reproduces a linear ramp exactly in the interior") {
    val m = dm(Float32, Double.NaN, -1000, 1000, -1000, 1000)
    // f(x,y) = 10x: pixel centers at x+0.5 hold 10(x+0.5)
    val src = new Bitmap(4, 4, 1, Float32,
      Array.tabulate(16)(i => 10.0 * (i % 4 + 0.5)))
    // target = source shifted by half a pixel in x, same resolution
    val merged = Warp.mergeDatasets(
      Seq(SourceRaster(src, grid, CRS.WGS84, m)),
      OutDescriptor(2, 2, 1, Affine.northUp(1.5, 3, 1, -1), CRS.WGS84, m, Resampling.Bilinear)).get
    // target pixel centers at x = 2.0, 3.0 → values 20, 30
    assert(math.abs(merged.get(0, 0, 0) - 20.0) < 1e-6)
    assert(math.abs(merged.get(1, 0, 0) - 30.0) < 1e-6)
  }

  test("average downsample 2x = mean of 2x2 blocks") {
    val m = dm(Float32, Double.NaN, -1000, 1000, -1000, 1000)
    val src = new Bitmap(4, 4, 1, Float32, Array.tabulate(16)(_.toDouble))
    val merged = Warp.mergeDatasets(
      Seq(SourceRaster(src, grid, CRS.WGS84, m)),
      OutDescriptor(2, 2, 1, Affine.northUp(0, 4, 2, -2), CRS.WGS84, m, Resampling.Average)).get
    // block (0,0) = {0,1,4,5} → 2.5 ; block (1,0) = {2,3,6,7} → 4.5
    assert(merged.get(0, 0, 0) === 2.5)
    assert(merged.get(1, 0, 0) === 4.5)
    assert(merged.get(0, 1, 0) === 10.5)
    assert(merged.get(1, 1, 0) === 12.5)
  }

  test("reprojection 4326→3857 keeps a constant field constant") {
    val m = dm(Float32, Double.NaN, -1000, 1000, -1000, 1000)
    // constant value over lon/lat box [0,4]×[0,4]
    val src = new Bitmap(8, 8, 1, Float32, Array.fill(64)(7.25))
    val (x0, y1) = CRS.WebMercator.fromLonLat(0.5, 3.5)
    val (x1, y0) = CRS.WebMercator.fromLonLat(3.5, 0.5)
    val out = OutDescriptor(8, 8, 1,
      Affine.northUp(x0, y1, (x1 - x0) / 8, -(y1 - y0) / 8),
      CRS.WebMercator, m, Resampling.Bilinear)
    val merged = Warp.mergeDatasets(
      Seq(SourceRaster(src, Affine.northUp(0, 4, 0.5, -0.5), CRS.WGS84, m)), out).get
    assert(merged.pixels.forall(v => math.abs(v - 7.25) < 1e-6))
  }

  test("reprojection 3857→4326 bilinear reproduces a linear field (golden)") {
    // the configuration a4_warp exercised before its oracle moved to
    // rational same-CRS frames (round-8): WebMercator source, WGS84
    // target, bilinear. A field linear in Mercator x is reproduced
    // exactly by bilinear sampling, and the expected value at each
    // target center comes from the closed-form forward Mercator —
    // independent of the Warp/Sampler code under test.
    val m = dm(Float64, Double.NaN, -1e9, 1e9, -1e9, 1e9)
    val rs = 100000.0 // 100 km source pixels
    val src = SourceRaster(
      new Bitmap(8, 8, 1, Float64,
        Array.tabulate(64)(i => ((i % 8) * rs + rs / 2) / 1000.0)),
      Affine.northUp(0, 400000, rs, -rs), CRS.WebMercator, m)
    val out = OutDescriptor(4, 4, 1,
      Affine.northUp(1.0, 3.0, 0.25, -0.25), CRS.WGS84, m, Resampling.Bilinear)
    val bm = Warp.mergeDatasets(Seq(src), out).get
    for (ty <- 0 until 4; tx <- 0 until 4) {
      val lon = 1.0 + 0.25 * (tx + 0.5)
      val mx = 6378137.0 * lon * math.Pi / 180
      assert(math.abs(bm.get(tx, ty, 0) - mx / 1000.0) < 1e-6,
        s"($tx,$ty): ${bm.get(tx, ty, 0)} vs ${mx / 1000.0}")
    }
  }

  test("reprojection round-trip: nearest preserves a checker under 3857→4326→sample") {
    val m = dm(UInt8, 255, 0, 254, 0, 254)
    val checker = new Bitmap(4, 4, 1, UInt8,
      Array.tabulate(16)(i => ((i % 4 + i / 4) % 2 * 100).toDouble))
    // target in 3857 covering the same lon/lat box
    val (tx0, ty1) = CRS.WebMercator.fromLonLat(0, 4)
    val (tx1, ty0) = CRS.WebMercator.fromLonLat(4, 0)
    val out = OutDescriptor(4, 4, 1,
      Affine.northUp(tx0, ty1, (tx1 - tx0) / 4, -(ty1 - ty0) / 4),
      CRS.WebMercator, m, Resampling.Near)
    val merged = Warp.mergeDatasets(
      Seq(SourceRaster(checker, grid, CRS.WGS84, m)), out).get
    // near equator the mercator warp is near-identity for cell assignment
    // of a coarse checker: corner cells must keep their values
    assert(merged.get(0, 3, 0) === checker.get(0, 3, 0))
    assert(merged.get(3, 3, 0) === checker.get(3, 3, 0))
  }

  test("multi-band merge keeps bands independent") {
    val m = dm(UInt8, 0, 0, 254, 0, 254)
    val g = Affine.northUp(0, 1, 1, -1)
    val twoBand = new Bitmap(1, 1, 2, UInt8, Array(11, 22))
    val merged = Warp.mergeDatasets(
      Seq(SourceRaster(twoBand, g, CRS.WGS84, m)),
      OutDescriptor(1, 1, 2, g, CRS.WGS84, m, Resampling.Near)).get
    assert(merged.get(0, 0, 0) === 11.0)
    assert(merged.get(0, 0, 1) === 22.0)
  }

  test("cubic/cubicspline/lanczos golden fixtures (image_data_test.go tier)") {
    // 8×8 analytic field f(x,y) = x² + 3y; independently-computed goldens.
    val f = new Bitmap(8, 8, 1, graft.core.DType.Float64,
      Array.tabulate(64)(i => { val x = i % 8; val y = i / 8; (x * x + 3.0 * y) }))
    def s(r: Resampling, xf: Double, yf: Double): Double =
      Sampler.sample(f, 0, xf, yf, 1.0, 1.0, Double.NaN, r)

    // Catmull-Rom reproduces quadratics exactly (order-3 accuracy)
    assert(math.abs(s(Resampling.Cubic, 4.0, 4.0) - 22.75) < 1e-12)
    assert(math.abs(s(Resampling.Cubic, 3.25, 5.75) - 23.3125) < 1e-12)
    // B-spline smooths: +1/3 bias on x² (analytic), linear term untouched
    assert(math.abs(s(Resampling.CubicSpline, 4.0, 4.0) - 23.08333333333334) < 1e-10)
    assert(math.abs(s(Resampling.CubicSpline, 3.25, 5.75) - 23.645833333333332) < 1e-10)
    // Lanczos-3 interpolates exactly at pixel centers
    assert(math.abs(s(Resampling.Lanczos, 4.5, 4.5) - 28.0) < 1e-12)
    // off-center golden literal
    assert(math.abs(s(Resampling.Lanczos, 4.25, 3.75) - 23.901595861832543) < 1e-9)

    // checkerboard: symmetric kernels land on the mean at cell corners
    val chk = new Bitmap(8, 8, 1, graft.core.DType.Float64,
      Array.tabulate(64)(i => ((i % 8 + i / 8) % 2).toDouble))
    def c(r: Resampling) = Sampler.sample(chk, 0, 4.0, 4.0, 1.0, 1.0, Double.NaN, r)
    assert(math.abs(c(Resampling.Cubic) - 0.5) < 1e-12)
    assert(math.abs(c(Resampling.Lanczos) - 0.5) < 1e-9)

    // nodata exclusion renormalizes instead of bleeding the hole
    val holed = new Bitmap(8, 8, 1, graft.core.DType.Float64,
      Array.tabulate(64)(i => if (i == 4 * 8 + 4) Double.NaN else 7.0))
    for (r <- Seq(Resampling.Cubic, Resampling.CubicSpline, Resampling.Lanczos))
      assert(math.abs(Sampler.sample(holed, 0, 4.25, 4.25, 1, 1, Double.NaN, r) - 7.0) < 1e-9,
        s"$r near a nodata hole")
    // fully-nodata neighborhood yields NaN (skip), not zero
    val empty = new Bitmap(4, 4, 1, graft.core.DType.Float64, Array.fill(16)(Double.NaN))
    assert(Sampler.sample(empty, 0, 2.0, 2.0, 1, 1, Double.NaN, Resampling.Lanczos).isNaN)
  }

  test("area reducers golden: mode/max/min/med/q1/q3 over a 2x downsample") {
    // 4×4 source; each target pixel covers a 2×2 block
    val src = new Bitmap(4, 4, 1, graft.core.DType.Float64, Array(
      1, 1, 5, 9,
      1, 3, 7, 9,
      2, 2, 4, 4,
      2, 8, 4, 6))
    def s(r: Resampling, xf: Double, yf: Double): Double =
      Sampler.sample(src, 0, xf, yf, 2.0, 2.0, Double.NaN, r)
    // top-left block {1,1,1,3}
    assert(s(Resampling.Mode, 1.0, 1.0) == 1.0)
    assert(s(Resampling.Max, 1.0, 1.0) == 3.0)
    assert(s(Resampling.Min, 1.0, 1.0) == 1.0)
    assert(s(Resampling.Average, 1.0, 1.0) == 1.5)
    // top-right block {5,9,7,9}: mode ties (9 twice), med/q1/q3 indexed picks
    assert(s(Resampling.Mode, 3.0, 1.0) == 9.0)
    assert(s(Resampling.Med, 3.0, 1.0) == 9.0) // sorted {5,7,9,9} idx round(.5*3)=2
    assert(s(Resampling.Q1, 3.0, 1.0) == 7.0) // idx round(.25*3)=1
    assert(s(Resampling.Q3, 3.0, 1.0) == 9.0) // idx round(.75*3)=2
    // bottom-left {2,2,2,8}: mode prefers the more frequent value
    assert(s(Resampling.Mode, 1.0, 3.0) == 2.0)
    // nodata-aware: holes drop out of the reduction
    val holed = new Bitmap(2, 2, 1, graft.core.DType.Float64,
      Array(Double.NaN, 10, Double.NaN, 20))
    assert(Sampler.sample(holed, 0, 1.0, 1.0, 2.0, 2.0, Double.NaN, Resampling.Max) == 20.0)
    assert(Sampler.sample(holed, 0, 1.0, 1.0, 2.0, 2.0, Double.NaN, Resampling.Average) == 15.0)
  }

  test("validPixels counts NaN-nodata correctly") {
    val b = new Bitmap(2, 2, 1, Float32, Array(1.0, Double.NaN, 3.0, Double.NaN))
    assert(b.validPixels(Double.NaN) === 2)
    assert(b.validPixels(1.0) === 3)
  }
}
