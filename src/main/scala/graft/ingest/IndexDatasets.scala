package graft.ingest

import graft.catalog.{Catalog, Schemas}
import graft.core.{DataFormat, DType, NumRange}
import graft.geo.{Affine, BBox, CRS, GeomOps}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Indexation (C8, reference internal/svc/service.go:239-379
  * IndexDatasets): register externally-produced containers as datasets —
  * validate each container is reachable and its rasters homogeneous
  * (bands/dtype), derive the footprint from the georeferencing, then
  * append. The reference opens every file with GDAL driver-side; the Spark
  * form validates distributed over the tile store (a `binaryFile`
  * header-read at 100 TB — only metadata columns are scanned, never
  * payloads: Parquet column pruning drops the payload bytes). */
object IndexDatasets {

  final case class NewDataset(
      recordId: String,
      instanceId: String,
      containerUri: String,
      subdir: String = "",
      bands: Seq[Int] = Seq(1),
      dformat: DataFormat,
      realMin: Double, realMax: Double, exponent: Double = 1.0)

  /** Validate + derive + append. Throws when a container is missing or
    * inhomogeneous (service.go's validation errors). */
  def run(spark: SparkSession, cat: Catalog, toIndex: Seq[NewDataset]): Unit = {
    import spark.implicits._
    val uris = toIndex.map(d => (d.containerUri, d.subdir)).distinct
      .toDF("uri", "sub")

    // distributed validation: one row per (container,subdir) with its
    // raster header — payload column pruned away by Catalyst
    val tiles = cat.read(spark, "tiles").select(
      col("container_uri"), coalesce(col("subdir"), lit("")).as("subdir"),
      col("width"), col("height"), col("bands"), col("dtype"), col("crs"),
      col("transform"))
    val headers = tiles.join(uris,
        tiles("container_uri") === uris("uri") && tiles("subdir") === uris("sub"))
      .collect()
      .map(r => ((r.getAs[String]("container_uri"), r.getAs[String]("subdir")), r))
      .toMap

    val rows = toIndex.map { d =>
      val key = (d.containerUri, d.subdir)
      val h = headers.getOrElse(key,
        throw new IllegalArgumentException(
          s"IndexDatasets: container ${d.containerUri}[${d.subdir}] unreachable"))
      val nBands = h.getAs[Int]("bands")
      require(d.bands.forall(b => b >= 1 && b <= nBands),
        s"IndexDatasets: bands ${d.bands} out of container range 1..$nBands")
      val dt = DType.fromName(h.getAs[String]("dtype"))
      require(dt == d.dformat.dtype,
        s"IndexDatasets: dtype mismatch ${dt.name} != ${d.dformat.dtype.name}")
      d.dformat.validate()

      val tf = Affine.fromArray(h.getAs[scala.collection.Seq[Double]]("transform").toArray)
      val crs = CRS.parse(h.getAs[String]("crs"))
      val w = h.getAs[Int]("width"); val ht = h.getAs[Int]("height")
      val native = GeomOps.polygonFromBBox(BBox.fromExtent(tf, w, ht))
      val geogRaw = GeomOps.geographicRingFromExtent(tf, w, ht, crs)
      val geog = GeomOps.normalizeAntimeridian(geogRaw) // ingest normalization (P9)
      val b = GeomOps.bbox(geog)
      Row(
        java.util.UUID.randomUUID().toString, d.recordId, d.instanceId,
        d.containerUri, d.subdir, d.bands, "ACTIVE", null,
        d.dformat.dtype.name, d.dformat.noData, d.dformat.range.min, d.dformat.range.max,
        d.realMin, d.realMax, d.exponent, false,
        GeomOps.writeWkb(geog), GeomOps.writeWkb(native), crs.srid,
        Row(b.xmin, b.ymin, b.xmax, b.ymax))
    }
    cat.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.datasets), "datasets")
  }
}
