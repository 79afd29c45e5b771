package graft.operators

import java.awt.image.BufferedImage

/** Real JVM media codecs for the multimodal operators — JDK-only, no
  * external libraries:
  *
  *  - images: `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP), headless-safe;
  *  - audio: `javax.sound.sampled` (WAV/AU/AIFF containers, 8/16-bit PCM);
  *  - raw-gray: the documented fallback for payloads that are not a known
  *    container — bytes are the 8-bit samples of the metadata-declared
  *    raster (cycling if shorter). Video FRAME DECODE remains the one
  *    honest stub (the JDK has no video codec): frame sampling is
  *    metadata-only and per-frame payloads go through the image path.
  */
object MediaCodec {
  locally {
    System.setProperty("java.awt.headless", "true")
    // ImageIO's DEFAULT stream cache is a TEMP FILE per encode/decode
    // call (FileCacheImage{In,Out}putStream): the media queries run
    // thousands of codec calls per pass, each paying a disk-file
    // create/write/read/delete cycle — pure overhead, and the source of
    // multi-second swings under co-tenant disk load (guide §1.2
    // per-task work). Memory-cached streams produce identical bytes.
    // Object init runs once per JVM; direct ImageIO call sites outside
    // this object go through [[ensureMemoryCachedImageIO]].
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Forces this object's init (the `ImageIO.setUseCache(false)` above)
    * from call sites that use `javax.imageio.ImageIO` directly — in a
    * cluster deployment each executor JVM must flip the flag before its
    * first codec call, not just the driver. */
  def ensureMemoryCachedImageIO(): Unit = ()

  /** Decode an image container. Returns (width, height, channels,
    * band-planar samples) or None when ImageIO has no reader for the
    * bytes. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Array[Double])] =
    decodeImageWithDepth(payload).map { case (w, h, ch, _, px) => (w, h, ch, px) }

  /** [[decodeImage]] plus the per-band sample size in bits (band 0) —
    * ImageIO returns 16-bit rasters for TYPE_USHORT_GRAY PNGs, and callers
    * storing samples in a typed container must size the dtype from this,
    * not assume 8. */
  def decodeImageWithDepth(payload: Array[Byte]): Option[(Int, Int, Int, Int, Array[Double])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    Option(img).map { im =>
      val w = im.getWidth; val h = im.getHeight
      val r = im.getRaster; val ch = r.getNumBands
      val bits = r.getSampleModel.getSampleSize(0)
      val out = new Array[Double](w * h * ch)
      var b = 0
      while (b < ch) {
        val band = r.getSamples(0, 0, w, h, b, null: Array[Double])
        System.arraycopy(band, 0, out, b * w * h, w * h)
        b += 1
      }
      (w, h, ch, bits, out)
    }
  }

  /** Encode band-planar samples (clamped to 0..255) as PNG — grayscale for
    * 1 channel, RGB for 3+ (alpha dropped). */
  def encodePng(w: Int, h: Int, channels: Int, samples: Array[Double]): Array[Byte] = {
    val rgb = channels >= 3
    val im = new BufferedImage(w, h,
      if (rgb) BufferedImage.TYPE_INT_RGB else BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    val ch = if (rgb) 3 else 1
    val plane = new Array[Int](w * h)
    var b = 0
    while (b < ch) {
      var i = 0
      while (i < w * h) {
        plane(i) = math.max(0, math.min(255, samples(b * w * h + i).round.toInt))
        i += 1
      }
      raster.setSamples(0, 0, w, h, b, plane)
      b += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Encode mono 8-bit unsigned PCM as a canonical 44-byte-header WAV —
    * the inverse of [[decodeAudio]]'s 8-bit branch (samples 0..255). */
  def encodeWavPcm8(sampleRate: Int, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate (1 ch × 1 byte)
      .putShort(1) // block align
      .putShort(8) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }

  /** Decode an audio container to (sampleRate, channels, sampleBits,
    * interleaved PCM samples as doubles); 8-bit unsigned (0..255) and
    * 16-bit signed (−32768..32767) PCM supported — callers bucketing or
    * normalizing samples MUST use the bits to pick the value range. */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Int, Array[Double])] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val bytes = ais.readAllBytes()
      val samples: Array[Double] = fmt.getSampleSizeInBits match {
        case 8 => bytes.map(b => (b & 0xff).toDouble)
        case 16 =>
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          Array.tabulate(bytes.length / 2)(i => bb.getShort(2 * i).toDouble)
        case _ => return None
      }
      Some((fmt.getSampleRate.toInt, fmt.getChannels,
        fmt.getSampleSizeInBits, samples))
    } catch { case _: Exception => None }
  }

  /** Raw fallback: payload bytes ARE the 8-bit gray samples of an
    * n-element raster, cycling when the payload is shorter. An EMPTY
    * payload yields all-zero samples — the documented 0-stats row, not
    * an ArithmeticException (i % 0) killing the whole featurize job. */
  def rawGray(payload: Array[Byte], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    if (payload.isEmpty) return out
    var i = 0
    while (i < n) { out(i) = (payload(i % payload.length) & 0xff).toDouble; i += 1 }
    out
  }

  // ------------------------------------------------------------- video

  /** A decoded MJPEG-AVI container: header metadata + the still-encoded
    * JPEG bytes of each frame (decode lazily via [[decodeImage]] — frames
    * ARE JPEGs, which ImageIO reads). */
  final case class AviVideo(width: Int, height: Int, nFrames: Int,
      microSecPerFrame: Int, frames: Seq[Array[Byte]])

  /** Parse a RIFF/AVI container (public AVI 1.0 structure): `avih` main
    * header for dims/frame count/rate, `movi` list for the frame chunks
    * (`##dc`/`##db`). MJPEG is the one video codec a JDK-only engine can
    * genuinely decode — each frame chunk is a complete JPEG; anything
    * H.26x-compressed parses for METADATA here but its frames won't
    * decode, which callers detect per-frame via decodeImage = None. */
  def decodeAvi(payload: Array[Byte]): Option[AviVideo] = {
    if (payload.length < 12) return None
    def fourcc(o: Int): String = new String(payload, o, 4, "US-ASCII")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var width = 0; var height = 0; var nFrames = 0; var usPerFrame = 0
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val cc = fourcc(o)
        val size = bb.getInt(o + 4)
        if (size < 0 || o + 8 + size > end) return // malformed: stop cleanly
        cc match {
          case "LIST" => walk(o + 12, o + 8 + size) // skip the list type
          case "avih" if size >= 40 =>
            usPerFrame = bb.getInt(o + 8)
            nFrames = bb.getInt(o + 24)
            width = bb.getInt(o + 40)
            height = bb.getInt(o + 44)
          case c if c.length == 4 && c(0).isDigit && c(1).isDigit &&
              (c.substring(2) == "dc" || c.substring(2) == "db") =>
            frames += java.util.Arrays.copyOfRange(payload, o + 8, o + 8 + size)
          case _ => ()
        }
        o += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, math.min(payload.length, 8 + bb.getInt(4)))
    val fs = frames.result()
    if (width <= 0 || height <= 0) None
    else Some(AviVideo(width, height, if (nFrames > 0) nFrames else fs.size,
      usPerFrame, fs))
  }

  /** Encode JPEG frames as an MJPEG AVI (the matching video SINK): RIFF →
    * hdrl(avih + strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) +
    * movi(00dc…). Every produced file round-trips through [[decodeAvi]]
    * and plays in standard tooling. */
  def encodeMjpegAvi(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty, "encodeMjpegAvi: fps > 0, frames non-empty")
    val bos = new java.io.ByteArrayOutputStream()
    def le(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(cc.getBytes("US-ASCII")); out.write(le(body.length))
      out.write(body)
      if ((body.length & 1) == 1) out.write(0) // word alignment pad
      out.toByteArray
    }
    def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
      val inner = new java.io.ByteArrayOutputStream()
      inner.write(listType.getBytes("US-ASCII"))
      bodies.foreach(inner.write)
      chunk("LIST", inner.toByteArray)
    }
    val maxFrame = frames.map(_.length).max
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, 1000000 / fps) // dwMicroSecPerFrame
      b.putInt(4, maxFrame * fps) // dwMaxBytesPerSec
      // 8 = padding granularity, 12 = flags: none (decoders stream movi)
      b.putInt(16, frames.size) // dwTotalFrames
      b.putInt(24, 1) // dwStreams
      b.putInt(28, maxFrame) // dwSuggestedBufferSize
      b.putInt(32, width)
      b.putInt(36, height)
      b.array()
    }
    val strh = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      b.putInt(20, 1) // dwScale
      b.putInt(24, fps) // dwRate (rate/scale = fps)
      b.putInt(32, frames.size) // dwLength
      b.putInt(36, maxFrame) // dwSuggestedBufferSize
      b.putShort(48, width.toShort); b.putShort(50, height.toShort)
      b.array()
    }
    val strf = {
      val b = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24)
      b.put(16, "MJPG".getBytes("US-ASCII")) // biCompression
      b.putInt(20, width * height * 3) // biSizeImage (nominal)
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih),
      list("strl", chunk("strh", strh), chunk("strf", strf)))
    val movi = list("movi", frames.map(f => chunk("00dc", f)): _*)
    val riffBody = new java.io.ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes("US-ASCII"))
    riffBody.write(hdrl); riffBody.write(movi)
    val body = riffBody.toByteArray
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le(body.length))
    bos.write(body)
    bos.toByteArray
  }

  /** Encode band-planar samples as one JPEG frame (quality left to the
    * writer default; gray for 1 channel, RGB otherwise). */
  def encodeJpeg(w: Int, h: Int, channels: Int, samples: Array[Double]): Array[Byte] = {
    val rgb = channels >= 3
    val im = new BufferedImage(w, h,
      if (rgb) BufferedImage.TYPE_INT_RGB else BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    val ch = if (rgb) 3 else 1
    val plane = new Array[Int](w * h)
    var b = 0
    while (b < ch) {
      var i = 0
      while (i < w * h) {
        plane(i) = math.max(0, math.min(255, samples(b * w * h + i).round.toInt))
        i += 1
      }
      raster.setSamples(0, 0, w, h, b, plane)
      b += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", out)
    out.toByteArray
  }
}
