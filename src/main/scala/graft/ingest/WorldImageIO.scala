package graft.ingest

import graft.catalog.{Catalog, TableStore, Schemas}
import graft.operators.MediaCodec
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Georeferenced plain-image source (PNG/JPEG/BMP/GIF + ESRI world-file
  * sidecar, optional .prj WKT): the engine's analog of the reference's
  * GDAL-any-readable-format ingest for non-TIFF rasters (the reference
  * accepts whatever gdal.Open does; we cover the JDK-decodable formats).
  *
  * World file (public ESRI convention, 6 lines): A (x pixel size), D
  * (y rotation), B (x rotation), E (y pixel size, negative for north-up),
  * C, F (x, y of the CENTER of the top-left pixel). The GDAL-convention
  * corner origin is therefore C − A/2 − B/2, F − D/2 − E/2. Sidecar
  * lookup: image-specific extension first ("<first><last>w": .pgw, .jgw,
  * .bmw, .gfw), then generic .wld; .prj (any WKT [[graft.geo.CRS.parse]]
  * accepts — including the authority-free azimuthal forms) overrides
  * `defaultCrs`.
  *
  * Distributed exactly like [[GeoTiffIO.importFiles]]: one binaryFile
  * task per image, sidecars read on the executor through Hadoop FS,
  * linear scale-out, driver sees no payloads. */
object WorldImageIO {

  /** Candidate sidecar names, case-insensitively: .PNG images carry .PGW
    * or .pgw world files in the wild, so each candidate is emitted in
    * lower- and upper-case form (exotic mixed-case like .Wld stays
    * unmatched — a directory listing would be needed for full
    * insensitivity on case-sensitive filesystems). */
  private def sidecarNames(imagePath: String): Seq[String] = {
    def cases(name: String): Seq[String] = Seq(name, name.toUpperCase)
    val dot = imagePath.lastIndexOf('.')
    if (dot < 0) return cases(".wld").map(imagePath + _)
    val base = imagePath.substring(0, dot)
    val ext = imagePath.substring(dot + 1).toLowerCase
    val specific =
      if (ext.length >= 2) cases(s".${ext.head}${ext.last}w").map(base + _)
      else Nil
    specific ++ cases(".wld").map(base + _)
  }

  private def readSidecar(conf: org.apache.hadoop.conf.Configuration,
      candidates: Seq[String]): Option[String] =
    candidates.iterator.flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      if (fs.exists(path)) {
        val in = fs.open(path)
        try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
        finally in.close()
      } else None
    }.nextOption()

  /** Parse the 6-line world file to a GDAL-convention corner-origin
    * affine. */
  private[ingest] def worldFileToAffine(text: String): graft.geo.Affine = {
    val v = text.split("\\s+").filter(_.nonEmpty).map(_.toDouble)
    require(v.length >= 6, s"world file needs 6 numbers, got ${v.length}")
    val Array(a, d, b, e, c, f) = v.take(6)
    graft.geo.Affine(c - a / 2 - b / 2, a, b, f - d / 2 - e / 2, d, e)
  }

  /** Import every image under `pathGlob` that has a world-file sidecar as
    * a (container, tile) pair; images without a sidecar or that ImageIO
    * cannot decode are skipped (counted in the returned summary). Returns
    * (imported, skipped). */
  def importFiles(spark: SparkSession, cat: TableStore, pathGlob: String,
      defaultCrs: String = "EPSG:4326"): (Long, Long) = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val files = spark.read.format("binaryFile").load(pathGlob)
      // sidecars themselves may match the glob — never decode them
      // (case-insensitively: .PGW/.WLD/.PRJ are sidecars too)
      .filter(!col("path").rlike("(?i)\\.(wld|prj|[a-z][a-z0-9]w)$"))
      .select(col("path"), col("content"))
    val parsed = files.rdd.map { r =>
      val path = r.getAs[String]("path")
      // keep the full URI (scheme included): Hadoop Path resolves the
      // CORRECT filesystem from it — stripping "file:" would send the
      // sidecar lookup to fs.defaultFS (e.g. HDFS) on a cluster and
      // silently skip every image
      val raw = path
      val world = readSidecar(hconf.value, sidecarNames(raw))
      val decoded = MediaCodec.decodeImageWithDepth(r.getAs[Array[Byte]]("content"))
      (world, decoded) match {
        case (Some(w), Some((width, height, ch, bits, samples))) =>
          val tf = worldFileToAffine(w)
          val crs = readSidecar(hconf.value, {
            val dot = raw.lastIndexOf('.')
            val base = if (dot < 0) raw else raw.substring(0, dot)
            Seq(base + ".prj", base + ".PRJ")
          }).map(wkt => graft.geo.CRS.serialize(graft.geo.CRS.parse(wkt)))
            .getOrElse(defaultCrs)
          // dtype from the DECODED raster: 16-bit grayscale PNGs
          // (TYPE_USHORT_GRAY) carry values > 255 that would wrap in uint8
          val dtype =
            if (bits <= 8) graft.core.DType.UInt8
            else if (bits <= 16) graft.core.DType.UInt16
            else graft.core.DType.UInt32
          val bm = new graft.raster.Bitmap(width, height, ch, dtype, samples)
          Right(Row(path, "", width, height, ch, dtype.name, crs,
            tf.toArray.toSeq, bm.toBytes))
        case _ => Left(path)
      }
    }.cache()
    try {
      // containers BEFORE tiles (same crash-ordering rule as GeoTiffIO:
      // a dangling containers row is harmless, dangling pixels are not)
      val uris = parsed.collect { case Right(row) => row.getString(0) }
        .distinct().map(u => Row(u, false, "STANDARD"))
      cat.append(spark.createDataFrame(uris, Schemas.containers), "containers")
      val rows = parsed.collect { case Right(row) => row }
      cat.append(spark.createDataFrame(rows, Schemas.tiles), "tiles")
      val imported = parsed.filter(_.isRight).count()
      val skipped = parsed.filter(_.isLeft).count()
      (imported, skipped)
    } finally parsed.unpersist()
  }
}
