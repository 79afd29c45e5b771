package graft.raster

import graft.core.{Cast, DType}

/** In-memory raster: band-planar doubles + shape metadata.
  *
  * The engine's analog of the reference Bitmap (internal/utils/bitmap/
  * bitmap.go:17-40): W×H×bands pixels of a dtype. The kernel works in
  * doubles (every supported dtype round-trips through double exactly,
  * except float64 which IS double); the wire/storage form is a
  * little-endian byte payload + StructType header (SURVEY §1.3), encoded
  * at the Dataset[Slice] boundary.
  *
  * Index layout: band-planar, `i = band*W*H + y*W + x` (matches GDAL's
  * band-sequential reads the reference gets from godal).
  */
final class Bitmap(
    val width: Int,
    val height: Int,
    val bands: Int,
    val dtype: DType,
    val pixels: Array[Double]) {

  require(pixels.length == width * height * bands,
    s"pixel buffer ${pixels.length} != $width*$height*$bands")

  @inline def idx(x: Int, y: Int, b: Int): Int = b * width * height + y * width + x
  @inline def get(x: Int, y: Int, b: Int): Double = pixels(idx(x, y, b))
  @inline def set(x: Int, y: Int, b: Int, v: Double): Unit = pixels(idx(x, y, b)) = v

  /** Count of pixels (x,y) with at least one band != nodata — the
    * valid-pixel tally behind the ValidPixPc filter (bitmap.go:153-193;
    * NaN nodata means NaN pixels are invalid). */
  def validPixels(noData: Double): Int = {
    val plane = width * height
    var count = 0
    var p = 0
    while (p < plane) {
      var b = 0
      var valid = false
      while (b < bands && !valid) {
        val v = pixels(b * plane + p)
        valid = if (noData.isNaN) !v.isNaN else v != noData
        b += 1
      }
      if (valid) count += 1
      p += 1
    }
    count
  }

  /** Little-endian byte payload in the declared dtype (wire/storage form). */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(pixels.length * dtype.sizeBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    dtype match {
      case DType.UInt8 =>
        while (i < pixels.length) { bb.put(Cast.storeValue(pixels(i), dtype).toInt.toByte); i += 1 }
      case DType.Int8 =>
        while (i < pixels.length) { bb.put(Cast.storeValue(pixels(i), dtype).toInt.toByte); i += 1 }
      case DType.UInt16 =>
        while (i < pixels.length) { bb.putShort((Cast.storeValue(pixels(i), dtype).toLong & 0xffff).toShort); i += 1 }
      case DType.Int16 =>
        while (i < pixels.length) { bb.putShort(Cast.storeValue(pixels(i), dtype).toInt.toShort); i += 1 }
      case DType.UInt32 =>
        while (i < pixels.length) { bb.putInt((Cast.storeValue(pixels(i), dtype).toLong & 0xffffffffL).toInt); i += 1 }
      case DType.Int32 =>
        while (i < pixels.length) { bb.putInt(Cast.storeValue(pixels(i), dtype).toInt); i += 1 }
      case DType.Float32 =>
        while (i < pixels.length) { bb.putFloat(pixels(i).toFloat); i += 1 }
      case DType.Float64 | DType.Complex64 =>
        while (i < pixels.length) { bb.putDouble(pixels(i)); i += 1 }
    }
    bb.array()
  }
}

object Bitmap {
  /** Allocate a bitmap pre-filled with `init` (the INIT_DEST=nodata
    * accumulator of the warp, image.go:402). */
  def filled(width: Int, height: Int, bands: Int, dtype: DType, init: Double): Bitmap = {
    val px = new Array[Double](width * height * bands)
    if (init != 0.0 || init.isNaN) java.util.Arrays.fill(px, init)
    new Bitmap(width, height, bands, dtype, px)
  }

  /** Decode a little-endian byte payload. */
  def fromBytes(bytes: Array[Byte], width: Int, height: Int, bands: Int, dtype: DType): Bitmap = {
    val n = width * height * bands
    require(bytes.length == n * dtype.sizeBytes,
      s"payload ${bytes.length} != $n*${dtype.sizeBytes}")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val px = new Array[Double](n)
    var i = 0
    dtype match {
      case DType.UInt8 => while (i < n) { px(i) = bb.get() & 0xff; i += 1 }
      case DType.Int8 => while (i < n) { px(i) = bb.get(); i += 1 }
      case DType.UInt16 => while (i < n) { px(i) = bb.getShort() & 0xffff; i += 1 }
      case DType.Int16 => while (i < n) { px(i) = bb.getShort(); i += 1 }
      case DType.UInt32 => while (i < n) { px(i) = bb.getInt().toLong & 0xffffffffL; i += 1 }
      case DType.Int32 => while (i < n) { px(i) = bb.getInt(); i += 1 }
      case DType.Float32 => while (i < n) { px(i) = bb.getFloat(); i += 1 }
      case DType.Float64 | DType.Complex64 => while (i < n) { px(i) = bb.getDouble(); i += 1 }
    }
    new Bitmap(width, height, bands, dtype, px)
  }
}
