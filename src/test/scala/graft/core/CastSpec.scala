package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the cast algebra — ports of the reference's fixture
  * matrix (internal/image/image_data_test.go:10-145, FIXTURES.md §2): each
  * scenario is a DataMapping; we assert castValueBF round-trips and the
  * closed-form castParams composition agrees with the brute-force path. */
class CastSpec extends AnyFunSuite {
  import DType._

  private def dm(dt: DType, noData: Double, min: Double, max: Double,
      emin: Double, emax: Double, exp: Double): DataMapping =
    DataMapping(DataFormat(dt, noData, NumRange(min, max)), NumRange(emin, emax), exp)

  // FIXTURES.md §2 scenarios
  val cast0 = dm(Int16, -10001, -10000, 10000, -1, 1, 1)
  val cast1 = dm(Float32, Double.NaN, -1, 1, -1, 1, 1)
  val cast2 = dm(UInt8, 255, 0, 254, -1, 1, 1)
  val cast3 = dm(UInt8, 255, 0, 254, 0, 0.5, 1)
  val cast4 = dm(UInt8, 255, 0, 254, -1, 1, 2)
  val cast5 = dm(UInt8, 255, 0, 254, 0, 0.5, 2)
  val cast6 = dm(UInt8, 255, 0, 254, 0, 1, 1)
  val cast7 = dm(Int16, -10001, 0, 10000, 0, 1, 2)

  test("castValue is the documented formula") {
    // vi=5000 in [-10000,10000] → ratio 0.75 → ve in [-1,1] = 0.5
    assert(Cast.castValue(5000, cast0.format.range, cast0.rangeExt, 1) === 0.5)
    // exponent 2: ratio^2
    assert(Cast.castValue(127, NumRange(0, 254), NumRange(0, 1), 2) === 0.25)
  }

  test("castValueBF composes src→ext→dst and clamps to dtype bounds") {
    // cast0 → cast2: vi=10000 → ve=1 → uint8 ratio 1 → 254
    assert(Cast.castValueBF(10000, cast0, cast2) === 254.0)
    // vi=-10000 → ve=-1 → 0
    assert(Cast.castValueBF(-10000, cast0, cast2) === 0.0)
    // midpoint: vi=0 → ve=0 → (0-(-1))/2*254 = 127
    assert(Cast.castValueBF(0, cast0, cast2) === 127.0)
    // out-of-range input clamps to dtype bounds, not range bounds
    assert(Cast.castValueBF(1e12, cast0, cast2) === 255.0)
    assert(Cast.castValueBF(-1e12, cast0, cast2) === 0.0)
  }

  test("exponent round-trip: cast4 (exp 2) back to external") {
    // vi=127 → ((127)/254)^2 * 2 - 1 = -0.5 in ext range [-1,1]
    val ve = Cast.castValue(127, cast4.format.range, cast4.rangeExt, cast4.exponent)
    assert(math.abs(ve - -0.5) < 1e-12)
  }

  test("castParams: identity mapping → None") {
    assert(Cast.castParams(cast0, cast0).isEmpty)
  }

  test("castParams closed forms agree with castValueBF") {
    val pairs = Seq(
      (cast0, cast2), // both exp 1
      (cast0, cast4), // from exp 1, to exp 2
      (cast4, cast6), // from exp 2, to exp 1
      (cast7, dm(UInt8, 255, 0, 254, 0, 0.5, 2)), // equal exp, same ext min
      (cast2, cast3), // exp1, ext range changes
      (cast7, cast6), // from exp 2 to exp 1
      (cast0, cast1)) // int → float
    for ((from, to) <- pairs; viRatio <- Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val vi = from.format.range.min + from.format.range.interval * viRatio
      val params = Cast.castParams(from, to).get
      val got = Cast.storeValue(params(vi), to.format.dtype)
      val want = Cast.storeValue(Cast.castValueBF(vi, from, to), to.format.dtype)
      assert(math.abs(got - want) <= 1e-6,
        s"from=$from to=$to vi=$vi got=$got want=$want")
    }
  }

  test("castParams rejects non-closed-form exponent composition") {
    val a = dm(UInt8, 255, 0, 254, 0, 1, 2)
    val b = dm(UInt8, 255, 0, 254, 0.1, 1, 3) // different exp, different ext.min
    assertThrows[Cast.UnableToCast](Cast.castParams(a, b))
    // equal exponents but different external minima is also non-closed-form
    // (reference image.go:204-218 falls through to ErrUnableToCast)
    assertThrows[Cast.UnableToCast](Cast.castParams(cast4, cast5))
  }

  test("NaN nodata semantics: floats always have nodata defined") {
    assert(cast1.format.noDataDefined) // NaN nodata but float dtype
    assert(cast0.format.noDataDefined) // explicit nodata
    assert(!DataFormat(UInt8, Double.NaN, NumRange(0, 254)).noDataDefined)
  }

  test("validation: ranges within dtype bounds; positive exponent") {
    assertThrows[IllegalArgumentException](
      DataFormat(UInt8, 0, NumRange(-1, 254)).validate())
    assertThrows[IllegalArgumentException](
      DataFormat(UInt8, 0, NumRange(10, 10)).validate())
    assertThrows[IllegalArgumentException](
      dm(UInt8, 255, 0, 254, 0, 1, 0).validate())
  }

  test("storeValue rounds half away from zero and clamps") {
    assert(Cast.storeValue(1.5, UInt8) === 2.0)
    assert(Cast.storeValue(2.5, UInt8) === 3.0) // not banker's rounding
    assert(Cast.storeValue(-2.5, Int16) === -2.0) // floor(v+0.5) semantics
    assert(Cast.storeValue(300, UInt8) === 255.0)
    assert(Cast.storeValue(-5, UInt8) === 0.0)
  }
}
