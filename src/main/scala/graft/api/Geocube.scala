package graft.api

import graft.catalog._
import graft.consolidation.{ConsolidationJob, ConsolidationParams, DeletionJob}
import graft.cube.{CubeRequest, GetCube, Palette, Slice, XYZTile}
import graft.geo.GeomOps
import graft.ingest.IndexDatasets
import graft.layout.{Layout => GridLayout, TileRow}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Geometry

/** The programmatic API surface (SURVEY §7.1 module 9): method-per-rpc of
  * the reference's `GeocubeService` (internal/grpc/service.go:39-92),
  * delegating to the engine modules. A user of the reference switches by
  * replacing the gRPC stub with `Geocube(spark, catalog)` — names and
  * argument shapes track the service interface; streaming rpcs return
  * Datasets/iterators instead of gRPC streams.
  */
final case class Geocube(spark: SparkSession, cat: Catalog) {

  private def append(table: String, rows: Seq[Row]): Unit =
    cat.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000)),
      Schemas.all(table)), table)

  // ---- AOI / records (service.go:40-47)

  /** CreateAOI: id = SHA-1 of the WKB (record.go:33-46 dedup contract). */
  def createAoi(geomLonLat: Geometry): String = {
    val hash = GeomOps.geometryHash(geomLonLat)
    val existing = cat.read(spark, "aoi").filter(col("hash") === hash).count()
    if (existing == 0) {
      val b = GeomOps.bbox(geomLonLat)
      append("aoi", Seq(Row(hash, hash, GeomOps.writeWkb(geomLonLat),
        Row(b.xmin, b.ymin, b.xmax, b.ymax))))
    }
    hash
  }

  def getAoi(aoiId: String): Option[Geometry] =
    cat.read(spark, "aoi").filter(col("id") === aoiId).collect().headOption
      .map(r => GeomOps.readWkb(r.getAs[Array[Byte]]("geom_wkb")))

  final case class NewRecord(id: String, name: String,
      datetime: java.sql.Timestamp, tags: Map[String, String], aoiId: String)

  def createRecords(records: Seq[NewRecord]): Unit =
    append("records", records.map(r =>
      Row(r.id, r.name, r.datetime, r.tags, r.aoiId)))

  /** GetRecords: point lookup preserving request order, deduped (S3). */
  def getRecords(ids: Seq[String]): DataFrame =
    CatalogQueries.readByIds(spark, cat.read(spark, "records"), "id", ids)

  /** ListRecords (S2): name pattern + tags + time + AOI intersection. */
  def listRecords(nameLike: String = "", tags: Map[String, String] = Map.empty,
      fromTime: Option[java.sql.Timestamp] = None,
      toTime: Option[java.sql.Timestamp] = None,
      aoi: Option[Geometry] = None, limit: Int = 0): DataFrame =
    CatalogQueries.findRecords(spark, cat,
      namePatterns = if (nameLike.isEmpty) Nil else Seq(nameLike),
      tags = tags, fromTime = fromTime, toTime = toTime, aoi = aoi,
      limit = limit)

  def deleteRecords(ids: Seq[String]): Long = {
    val rec = cat.read(spark, "records")
    val n = rec.filter(col("id").isin(ids: _*)).count()
    if (n > 0) cat.rewrite(rec.filter(!col("id").isin(ids: _*)), "records")
    n
  }

  def addRecordsTags(ids: Seq[String], tags: Map[String, String]): Long = {
    val rec = cat.read(spark, "records")
    val hit = col("id").isin(ids: _*)
    val n = rec.filter(hit).count()
    if (n > 0) {
      val merged = map_concat(coalesce(col("tags"), map()),
        map(tags.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*))
      cat.rewrite(rec.withColumn("tags", when(hit, merged).otherwise(col("tags"))),
        "records")
    }
    n
  }

  def removeRecordsTags(ids: Seq[String], tagKeys: Seq[String]): Long = {
    val rec = cat.read(spark, "records")
    val hit = col("id").isin(ids: _*)
    val n = rec.filter(hit).count()
    if (n > 0) {
      val pruned = map_filter(col("tags"), (k, _) => !k.isin(tagKeys.map(lit(_)): _*))
      cat.rewrite(rec.withColumn("tags", when(hit, pruned).otherwise(col("tags"))),
        "records")
    }
    n
  }

  // ---- variables (service.go:49-59)

  final case class NewVariable(id: String, name: String, unit: String = "",
      description: String = "", bands: Seq[String] = Seq("b1"),
      dtype: String, noData: Double, minValue: Double, maxValue: Double,
      palette: String = "", resamplingAlg: String = "near")

  def createVariable(v: NewVariable): Unit =
    append("variable_definitions", Seq(Row(v.id, v.name, v.unit, v.description,
      v.bands, v.dtype, v.noData, v.minValue, v.maxValue, v.palette, v.resamplingAlg)))

  def instantiateVariable(variableId: String, instanceId: String, name: String,
      metadata: Map[String, String] = Map.empty): Unit =
    append("variable_instances", Seq(Row(instanceId, name, metadata, variableId)))

  def listVariables(nameLike: String = "", limit: Int = 0, offset: Int = 0): DataFrame =
    CatalogQueries.listByName(spark, cat, "variable_definitions", nameLike, limit, offset)

  /** CreatePalette (grpc service.go CreatePalette, palette.go:37): store a
    * named palette in the catalog; `replace` upserts. A variable that
    * names this palette gets it applied on the XYZ/PNG serving paths. */
  def createPalette(p: Palette, replace: Boolean = false): Unit =
    Palette.write(spark, cat, p, replace)

  def getPalette(name: String): Option[Palette] =
    Palette.read(spark, cat, name)

  // ---- datasets / containers (service.go:62-66)

  def getContainers(uris: Seq[String]): DataFrame =
    CatalogQueries.readByIds(spark, cat.read(spark, "containers"), "uri", uris)

  /** IndexExternalDatasets (C8): validate against the tile store, derive
    * footprints, append ACTIVE datasets. */
  def indexExternalDatasets(datasets: Seq[IndexDatasets.NewDataset]): Unit =
    IndexDatasets.run(spark, cat, datasets)

  /** ListDatasets (S1 scan, ordered). */
  def listDatasets(instanceId: String, recordIds: Seq[String] = Nil,
      recordTags: Map[String, String] = Map.empty,
      fromTime: Option[java.sql.Timestamp] = None,
      toTime: Option[java.sql.Timestamp] = None): DataFrame =
    CatalogQueries.findDatasets(spark, cat, DatasetFilters(
      status = Seq("ACTIVE"), instanceIds = Seq(instanceId),
      recordIds = recordIds, recordTags = recordTags,
      fromTime = fromTime, toTime = toTime, order = true))

  // ---- consolidation / jobs (service.go:66-76)

  def consolidateFromRecords(jobId: String, name: String, instanceId: String,
      recordIds: Seq[String], layout: GridLayout, params: ConsolidationParams,
      collapseOnRecordId: Option[String] = None): String =
    ConsolidationJob.run(spark, cat, ConsolidationJob.Spec(
      jobId, name, instanceId, recordIds, layout, params, collapseOnRecordId))

  /** Retry (grpc RetryJob → operations.go Retry trigger, job.go:28-55
    * RETRYING/FORCERETRYING): re-emit a parked job's FAILED tasks; force
    * additionally re-emits never-finished (NEW/PENDING) ones — the
    * stuck-mid-flight case. The caller re-presents the job spec: this
    * facade keeps job parameters with the caller instead of journaling
    * them. Returns the final FSM state (NOTFOUND / UNHANDLED / ... /
    * DONE). */
  def retryConsolidation(jobId: String, name: String, instanceId: String,
      recordIds: Seq[String], layout: GridLayout, params: ConsolidationParams,
      collapseOnRecordId: Option[String] = None,
      force: Boolean = false): String =
    ConsolidationJob.retry(spark, cat, ConsolidationJob.Spec(
      jobId, name, instanceId, recordIds, layout, params, collapseOnRecordId),
      force)

  /** DeleteDatasets (service.go:594-612): drive the standalone deletion
    * job over the datasets selected by instances × records × container-URI
    * glob patterns. Returns the final FSM state. */
  def deleteDatasets(jobId: String, name: String,
      instanceIds: Seq[String] = Nil, recordIds: Seq[String] = Nil,
      datasetPatterns: Seq[String] = Nil,
      pauseAfter: Option[String] = None): String =
    DeletionJob.run(spark, cat,
      DeletionJob.Spec(jobId, name, instanceIds, recordIds, datasetPatterns),
      pauseAfter)

  /** CancelJob (service.go:74): cancel by id, routed on the journaled job
    * type; NOTFOUND / CANCELLATIONFAILED / ABORTED. */
  def cancelJob(jobId: String): String =
    ConsolidationJob.cancelById(spark, cat, jobId)

  def listJobs(nameLike: String = "", limit: Int = 0): DataFrame =
    CatalogQueries.listByName(spark, cat, "jobs", nameLike, limit)

  def cleanJobs(nameLike: String = "", state: Option[String] = None): Long = {
    val jobs = cat.read(spark, "jobs")
    val total = jobs.count()
    var victims = jobs
    Patterns.predicate(col("name"), if (nameLike.isEmpty) Nil else Seq(nameLike))
      .foreach(p => victims = victims.filter(p))
    state.foreach(s => victims = victims.filter(col("state") === s))
    // the victim set rides as a RELATION (anti-joins), never an isin
    // literal list — a bulk clean by state over a long job history is
    // unbounded. Checkpoint pins the set: the jobs rewrite below mutates
    // the table the lazy victims plan reads.
    val victimIds = victims.select("id").distinct().localCheckpoint(true)
    try {
      if (victimIds.limit(1).count() > 0) {
        cat.rewrite(jobs.join(victimIds, Seq("id"), "left_anti"), "jobs")
        // cascade to the jobs' task rows (the reference deletes tasks with
        // their job) — otherwise cleaned jobs leak task rows forever
        cat.rewrite(cat.read(spark, "tasks")
          .join(victimIds.withColumnRenamed("id", "job_id"),
            Seq("job_id"), "left_anti"), "tasks")
      }
      total - cat.read(spark, "jobs").count()
    } finally graft.operators.OperatorCaches.releaseLocalCheckpoint(victimIds)
  }

  // ---- grids / layouts (service.go:78-86)

  def createGrid(gridName: String, cells: Seq[(String, String, Geometry)]): Unit =
    append("cells", cells.map { case (cellId, crs, geom) =>
      val b = GeomOps.bbox(geom)
      Row(gridName, cellId, crs, graft.geo.CRS.parse(crs).srid,
        GeomOps.writeWkb(geom), Row(b.xmin, b.ymin, b.xmax, b.ymax))
    })

  def listGrids(nameLike: String = ""): DataFrame = {
    var g = cat.read(spark, "cells").select("grid").distinct()
    Patterns.predicate(col("grid"), if (nameLike.isEmpty) Nil else Seq(nameLike))
      .foreach(p => g = g.filter(p))
    g.orderBy("grid")
  }

  def createLayout(l: GridLayout): Unit = {
    l.validate()
    append("layouts", Seq(Row(l.name, l.gridFlags, l.gridParameters,
      l.blockXSize, l.blockYSize, l.maxRecords, l.overviewsMinSize,
      l.interlacingPattern)))
  }

  def listLayouts(nameLike: String = ""): DataFrame =
    CatalogQueries.listByName(spark, cat, "layouts", nameLike)

  /** TileAOI (G6): stream covering cells in fixed batches. */
  def tileAoi(aoi: Geometry, layout: GridLayout,
      batchSize: Int = 1000): Iterator[Seq[TileRow]] =
    GridLayout.tileAoiBatches(layout, aoi, batchSize)

  // ---- read path (service.go:88-92)

  def getXyzTile(instanceId: String, x: Long, y: Long, z: Int,
      min: Double = 0, max: Double = 0,
      palette: Option[Palette] = None): Option[Array[Byte]] =
    XYZTile.getTile(spark, cat, instanceId, x, y, z, min, max, palette)

  def getCubeFromRecords(recordGroups: Seq[Seq[String]], instanceIds: Seq[String],
      crs: String, transform: graft.geo.Affine, width: Int, height: Int,
      headersOnly: Boolean = false): Dataset[Slice] =
    GetCube.cube(spark, cat, CubeRequest(
      instanceIds = instanceIds, crs = crs, transform = transform,
      width = width, height = height, recordGroups = recordGroups,
      headersOnly = headersOnly))

  def getCubeFromFilters(tags: Map[String, String],
      fromTime: Option[java.sql.Timestamp], toTime: Option[java.sql.Timestamp],
      instanceIds: Seq[String], crs: String, transform: graft.geo.Affine,
      width: Int, height: Int): Dataset[Slice] =
    GetCube.cube(spark, cat, CubeRequest(
      instanceIds = instanceIds, crs = crs, transform = transform,
      width = width, height = height, tags = tags,
      fromTime = fromTime, toTime = toTime))

  // ---- admin (admin.proto:58-62, C10)

  def updateDatasets(instanceIds: Seq[String], up: Admin.DFormatUpdate): Long =
    Admin.updateDatasets(spark, cat, instanceIds, up)

  def tidyDb(): Map[String, Long] = Admin.tidy(spark, cat)
}
