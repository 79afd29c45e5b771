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
  locally { System.setProperty("java.awt.headless", "true") }

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

  /** Decode an audio container to (sampleRate, channels, interleaved PCM
    * samples as doubles); 8-bit unsigned and 16-bit signed PCM supported. */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Array[Double])] = {
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
      Some((fmt.getSampleRate.toInt, fmt.getChannels, samples))
    } catch { case _: Exception => None }
  }

  /** Raw fallback: payload bytes ARE the 8-bit gray samples of an
    * n-element raster, cycling when the payload is shorter. */
  def rawGray(payload: Array[Byte], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = (payload(i % payload.length) & 0xff).toDouble; i += 1 }
    out
  }
}
