package graft.ingest

import graft.catalog.{Catalog, Schemas}
import graft.raster.GeoTiff
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Bridge between real GeoTIFF files and the catalog tile store: the
  * import path a user of the reference would take to move existing
  * COG/MuCOG containers in, and the export path producing files readable
  * by standard tooling (S8/S9).
  *
  * Import is a distributed `binaryFile` read → per-file parse on
  * executors → tile-row append; export collects one container (bounded by
  * maxRecords ≤ 1024 subdirs) to the driver and serializes one multi-IFD
  * file. */
object GeoTiffIO {

  /** Import .tif files (each possibly multi-IFD) as containers whose URI
    * is the file path. Runs the TIFF parse on executors via the
    * binaryFile source — one task per file, linear scale-out. */
  def importFiles(spark: SparkSession, cat: Catalog, pathGlob: String): Unit = {
    val files = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
    val rows = files.rdd.flatMap { r =>
      val path = r.getAs[String]("path")
      val dirs = GeoTiff.read(r.getAs[Array[Byte]]("content"))
      dirs.filterNot(_.isOverview).zipWithIndex.map { case (d, i) =>
        Row(path, s"GTIFF_DIR:${i + 1}",
          d.image.bitmap.width, d.image.bitmap.height, d.image.bitmap.bands,
          d.image.bitmap.dtype.name, s"EPSG:${d.image.crs.srid}",
          d.image.transform.toArray.toSeq, d.image.bitmap.toBytes)
      }
    }
    cat.append(spark.createDataFrame(rows, Schemas.tiles), "tiles")
    val uris = files.select(col("path").as("uri")).distinct()
      .withColumn("managed", lit(false))
      .withColumn("storage_class", lit("STANDARD"))
    cat.append(uris, "containers")
  }

  /** File-backed cube source (S8): read GeoTIFF containers straight from
    * storage on executors — no catalog tile rows — selecting per file the
    * overview level adequate for `targetRes` (`-ovr AUTO`,
    * image.go:401): a coarse request decodes 1/4ᴷ of the pixels. Rows come
    * back in the catalog `tiles` schema, so the GetCube tile join and
    * merge kernel consume them unchanged.
    *
    * Scale note: binaryFile hands each executor the whole file; the tiled
    * COG layout (IFDs at the head) is what makes a range-reading object-
    * store client able to fetch only the chosen IFD's blocks — the JVM
    * codec here decodes from the full byte array but touches only the
    * selected directory's blocks. One task per file, linear scale-out. */
  def readTilesForResolution(spark: SparkSession, pathGlob: String,
      targetRes: Double): org.apache.spark.sql.DataFrame = {
    val files = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
    val rows = files.rdd.flatMap { r =>
      val path = r.getAs[String]("path")
      val data = r.getAs[Array[Byte]]("content")
      val nFull = GeoTiff.read(data).count(!_.isOverview)
      (1 to nFull).map { i =>
        val img = GeoTiff.readForResolution(data, s"GTIFF_DIR:$i", targetRes)
        Row(path, s"GTIFF_DIR:$i",
          img.bitmap.width, img.bitmap.height, img.bitmap.bands,
          img.bitmap.dtype.name, s"EPSG:${img.crs.srid}",
          img.transform.toArray.toSeq, img.bitmap.toBytes)
      }
    }
    spark.createDataFrame(rows, Schemas.tiles)
  }

  /** Export one container (all its subdirs, in GTIFF_DIR order) to a
    * multi-IFD GeoTIFF byte array. */
  def exportContainer(spark: SparkSession, cat: Catalog, containerUri: String,
      noData: Double = Double.NaN, overviewsMinSize: Int = 0,
      compress: Boolean = false, tileSize: Int = 0,
      interlacing: String = ""): Array[Byte] = {
    val rows = cat.read(spark, "tiles")
      .filter(col("container_uri") === containerUri)
      // pyramid rows ("<subdir>@ovK") are not their own subdirs — the
      // overview chain is re-derived from overviewsMinSize at write time
      .filter(!coalesce(col("subdir"), lit("")).rlike("@ov\\d+$"))
      .collect()
    require(rows.nonEmpty, s"exportContainer: no tiles for $containerUri")
    val images = rows
      .sortBy { r =>
        val s = Option(r.getAs[String]("subdir")).getOrElse("")
        if (s.startsWith("GTIFF_DIR:")) s.stripPrefix("GTIFF_DIR:").toInt else 0
      }
      .map { r =>
        GeoTiff.Image(
          graft.raster.Bitmap.fromBytes(
            r.getAs[Array[Byte]]("payload"),
            r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("bands"),
            graft.core.DType.fromName(r.getAs[String]("dtype"))),
          graft.geo.Affine.fromArray(
            r.getAs[scala.collection.Seq[Double]]("transform").toArray),
          graft.geo.CRS.parse(r.getAs[String]("crs")))
      }
    GeoTiff.write(images.toSeq, noData, overviewsMinSize, compress, tileSize, interlacing)
  }
}
