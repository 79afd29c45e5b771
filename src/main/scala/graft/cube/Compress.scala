package graft.cube

import java.util.zip.{Deflater, Inflater}

/** Serving-edge slice compression (F11/D7, reference
  * internal/utils/compress.go:30-80 + grpc/service.go:876, 1034-1051):
  * deflate levels -3..9 where -3..-1 disable compression (-3 = "off, best
  * throughput" per catalog.proto:105), and chunked emission in ≤512 KiB
  * parts with part indices — the wire shape the reference streams cubes
  * in (gRPC 4 MiB message limit motivates the chunking). */
object Compress {
  val ChunkSize: Int = 512 * 1024

  /** Deflate at `level` (0-9); NEGATIVE levels return the input unchanged
    * (the reference disables compression for -3..-1 only — level 0 is a
    * valid STORE-mode deflate stream (flate.NoCompression, compress.go),
    * so a caller honoring "compressed when level > -1" still gets bytes
    * its inflate accepts). */
  def deflate(data: Array[Byte], level: Int): Array[Byte] = {
    require(level >= -3 && level <= 9, s"compression level $level not in -3..9")
    if (level < 0) return data
    val d = new Deflater(level)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](64 * 1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](64 * 1024)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsDictionary())
        // FDICT streams (preset dictionary) are invalid here: without
        // this check inflate()==0 with needsInput()==false loops forever
        throw new java.util.zip.DataFormatException("preset dictionary required")
      if (n == 0 && inf.needsInput()) throw new java.util.zip.DataFormatException("truncated")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Chunk a (possibly compressed) payload into ≤512 KiB parts with part
    * indices (service.go:876, 955-975). */
  def chunk(data: Array[Byte]): Seq[(Int, Array[Byte])] = {
    if (data.isEmpty) return Seq((0, data))
    data.grouped(ChunkSize).zipWithIndex.map { case (part, i) => (i, part) }.toSeq
  }

  /** Reassemble parts (tolerates out-of-order arrival). */
  def assemble(parts: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.sortBy(_._1).foreach { case (_, p) => out.write(p) }
    out.toByteArray
  }
}
