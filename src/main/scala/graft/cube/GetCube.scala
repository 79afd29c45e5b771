package graft.cube

import graft.catalog.{Catalog, TableStore, CatalogQueries, DatasetFilters}
import graft.core._
import graft.geo.{Affine, CRS, GeomOps}
import graft.raster._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Cube request: output grid + value source (variable instances) + record
  * filters — the argument surface of GetCube (reference
  * internal/svc/catalog.go:146-224, prepare :226-274). */
final case class CubeRequest(
    instanceIds: Seq[String],
    crs: String,
    transform: Affine,
    width: Int,
    height: Int,
    recordIds: Seq[String] = Nil,
    recordGroups: Seq[Seq[String]] = Nil, // client-side grouping (A2)
    tags: Map[String, String] = Map.empty,
    fromTime: Option[java.sql.Timestamp] = None,
    toTime: Option[java.sql.Timestamp] = None,
    resampling: Option[String] = None,
    validPixPc: Int = -1,
    headersOnly: Boolean = false)

/** One dataset row joined with its tile payload — the typed input of the
  * merge kernel. */
final case class DatasetTile(
    group_key: String,
    record_id: String,
    datetime: java.sql.Timestamp,
    dataset_id: String,
    bands: Seq[Int],
    dtype: String, no_data: Double, min_value: Double, max_value: Double,
    real_min_value: Double, real_max_value: Double, exponent: Double,
    t_width: Int, t_height: Int, t_bands: Int, t_dtype: String,
    t_crs: String, t_transform: Seq[Double],
    payload: Array[Byte])

/** One dataset's slice metadata — the reference's pb.InternalMeta inside
  * a DatasetMeta (svc/catalog.go:53-70): raster addressing (container,
  * subdir) + the dataset's dformat/ranges, WITHOUT pixels. What the
  * DownloadCube client replays cubes from. */
final case class DatasetMeta(
    group_key: String,
    record_id: String,
    datetime: java.sql.Timestamp,
    dataset_id: String,
    container_uri: String,
    subdir: String,
    bands: Seq[Int],
    dtype: String, no_data: Double, min_value: Double, max_value: Double,
    real_min_value: Double, real_max_value: Double, exponent: Double)

/** One output slice of the cube: header + (unless headers-only/error) the
  * merged bitmap payload in the engine's byte codec. Per-slice errors are
  * values, not failures (reference grpc/service.go:1086-1089). */
final case class Slice(
    group_key: String,
    record_ids: Seq[String],
    min_datetime: java.sql.Timestamp,
    width: Int, height: Int, bands: Int, dtype: String,
    payload: Array[Byte],
    valid_pixels: Long,
    error: String)

/** GetCube — the read path (SURVEY §3.1) as one Catalyst plan feeding a
  * typed mapGroups kernel:
  *
  *   findDatasets (S1: filters + bbox/JTS spatial + broadcast records join)
  *   → join tiles on (container_uri, subdir)      [co-located by container]
  *   → groupByKey(record | client group)           (A1/A2)
  *   → mapGroups: time-ordered cast→warp→mosaic    (D3 kernel)
  *   → slices ordered by (min datetime, group)     (O4 contract)
  *
  * Scale shape: the only shuffle is the groupByKey on record id — the same
  * key the mosaic needs; tile payloads move once. Slice kernel memory =
  * W·H·bands·8 per task (BASELINE.md §c sizing rule).
  */
object GetCube {

  /** Minimum tiles-store size (file bytes, from the scan's listing stats)
    * for the serving path's derived-bucket pruning conjunct — below it
    * the DPP subquery stages cost more than the full scan they prune
    * (see [[selectTileLevel]]). Overridable per session for tests/tuning. */
  val BucketPruneMinBytesConf = "graft.tiles.bucketPruneMinBytes"
  val BucketPruneMinBytesDefault: Long = 1L << 30

  /** Recommended session configuration for LATENCY-SERVING deployments
    * (a GetCube/XYZ tile server — the reference runs these as a
    * dedicated apiserver, svc/service.go): request-bounded plans with
    * explicit broadcast hints gain nothing from adaptive execution's
    * stage-by-stage materialization and re-optimization, which measured
    * ~0.3 s of pure driver overhead per 100-slice request (r11
    * profiling: 0.80 → 0.49 s min). ETL/analytics sessions (ingest,
    * consolidation, the dedup/text corpus) should keep AQE ON — skew
    * joins and partition coalescing matter there. The listing threshold
    * keeps the 64-bucket tiles store's directory listing on the driver
    * instead of launching a distributed listing job per request. */
  val ServingSessionConfs: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "false",
    "spark.sql.sources.parallelPartitionDiscovery.threshold" -> "1024")

  /** The cacheable part of a variable lookup: everything [[prepare]]
    * reads off the definition row. */
  private final case class VariableInfo(dtype: String, noData: Double,
      minValue: Double, maxValue: Double, nBands: Int, resampling: Option[String],
      palette: Option[String])

  /** Request-to-request cache of the variable lookup — the serving path's
    * fixed-latency floor (a full Spark action per GetCube/XYZ request for
    * two broadcast-sized dims that change ~never; the reference holds
    * variables in process memory the same way). Keyed by the two variable
    * tables' directory stamps (via the root's Hadoop FileSystem, so
    * HDFS-class roots get the cache too) so any append/rewrite
    * invalidates; an unobservable stamp bypasses the cache entirely
    * rather than risk staleness. */
  private val varCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[String], Long, Long, Long, Long), VariableInfo]()

  /** Directory stamp: (mtime, hash of child names+sizes+mtimes). The
    * listing hash matters — mtime alone is millisecond-truncated (and
    * seconds-coarse on some filesystems), so a rewrite landing in the
    * same tick with an unchanged file count would serve stale variables
    * forever. Resolved through the Hadoop [[FileSystem]] of the root's
    * scheme (r11 verdict #3: the `java.io.File` stamp bypassed the cache
    * on every non-local root, charging HDFS-class deployments a full
    * variable-lookup Spark action per request). (-1, -1) = unobservable
    * (missing dir, or a listing cut mid-swap) → callers bypass the cache
    * rather than risk staleness. */
  private[cube] def dirStamp(spark: SparkSession, root: String,
      table: String): (Long, Long) =
    try {
      val base = new org.apache.hadoop.fs.Path(s"$root/$table")
      val f = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // commit-log layout: stamp the `_log` listing instead of the table
      // dir — every mutation creates a new VERSIONED commit file there,
      // so the child NAMES alone carry the change. The table dir itself
      // is blind on exactly the stores CommitLogTableStore targets: its
      // children are the constant `_log`/`data` entries, and flat object
      // stores report synthetic directory mtimes that never propagate a
      // grandchild write.
      val log = new org.apache.hadoop.fs.Path(base, "_log")
      val listing =
        try f.listStatus(log)
        catch { case _: java.io.FileNotFoundException =>
          f.listStatus(base) // throws FileNotFound when absent
        }
      var h = 1L
      var maxM = 0L
      listing.foreach { s =>
        h = h * 1000003L + s.getPath.getName.hashCode
        h = h * 1000003L + s.getLen
        h = h * 1000003L + s.getModificationTime
        maxM = math.max(maxM, s.getModificationTime)
      }
      // newest CHILD mtime, not the directory's own — flat object stores
      // synthesize directory mtimes (sometimes as now(), which would
      // defeat the cache), while the children here are real files whose
      // mtimes are their PUT times
      (maxM, h)
    } catch { case _: java.io.IOException => (-1L, -1L) }

  private def lookupVariable(spark: SparkSession, cat: TableStore,
      instanceIds: Seq[String]): VariableInfo = {
    // one driver action for the whole variable lookup (instances → shared
    // definition): this runs per request, so its fixed job latency is the
    // serving path's floor — don't split it into two collects
    val vd = cat.read(spark, "variable_instances")
      .filter(col("id").isin(instanceIds: _*))
      .select(col("definition_id")).distinct()
      .join(cat.read(spark, "variable_definitions"),
        col("definition_id") === col("id"))
      .collect()
    require(vd.length == 1,
      s"instances $instanceIds must exist and share one defined variable")
    val v = vd(0)
    VariableInfo(
      v.getAs[String]("dtype"), v.getAs[Double]("no_data"),
      v.getAs[Double]("min_value"), v.getAs[Double]("max_value"),
      math.max(1,
        Option(v.getAs[scala.collection.Seq[String]]("bands")).map(_.size).getOrElse(1)),
      Option(v.getAs[String]("resampling_alg")),
      Option(v.getAs[String]("palette")).filter(_.nonEmpty))
  }

  /** Cached variable resolve shared by [[prepare]] and the palette name
    * lookup — one driver action per (instances, table-stamp) key. */
  private def resolveVariable(spark: SparkSession, cat: TableStore,
      instanceIds: Seq[String]): VariableInfo = {
    val si = dirStamp(spark, cat.root, "variable_instances")
    val sd = dirStamp(spark, cat.root, "variable_definitions")
    if (si._1 < 0 || sd._1 < 0) lookupVariable(spark, cat, instanceIds)
    else {
      if (varCache.size > 1024) varCache.clear() // bound, not LRU: refill is one action
      varCache.computeIfAbsent(
        (cat.root, instanceIds.sorted, si._1, si._2, sd._1, sd._2),
        _ => lookupVariable(spark, cat, instanceIds))
    }
  }

  /** Palette NAME the instances' variable declares, if any (reference
    * catalog.go:455-467 reads variable.Palette before rendering). Rides
    * the same stamp-keyed cache as [[prepare]] — no extra driver action
    * on the serving path. */
  def paletteNameOf(spark: SparkSession, cat: TableStore,
      instanceIds: Seq[String]): Option[String] =
    resolveVariable(spark, cat, instanceIds).palette

  /** Resolve the output descriptor from the variable behind the instance
    * (getCubePrepare: out mapping = variable DFormat, rangeExt = its own
    * range, exponent 1; default resampling from the variable). */
  def prepare(spark: SparkSession, cat: TableStore, req: CubeRequest): OutDescriptor = {
    val v = resolveVariable(spark, cat, req.instanceIds)
    val dt = DType.fromName(v.dtype)
    val format = DataFormat(dt, v.noData, NumRange(v.minValue, v.maxValue))
    OutDescriptor(
      width = req.width, height = req.height,
      bands = v.nBands,
      pixToCrs = req.transform,
      crs = CRS.parse(req.crs),
      mapping = DataMapping(format, format.range, 1.0),
      resampling = req.resampling.orElse(v.resampling)
        .map(Resampling.fromName).getOrElse(Resampling.Near),
      validPixPc = req.validPixPc)
  }

  /** The spatial filter pair of the read path: coarse geographic footprint
    * + refined native-CRS interior-intersects ring (pg_containers.go:302-311
    * — the CASE-on-SRID predicate that drops datasets merely touching the
    * request boundary). */
  private def spatialFilters(req: CubeRequest, out: OutDescriptor):
      (org.locationtech.jts.geom.Geometry, (org.locationtech.jts.geom.Geometry, Int)) = {
    val footprint = GeomOps.geographicRingFromExtent(
      req.transform, req.width, req.height, out.crs)
    val nativeRing = GeomOps.polygonFromBBox(
      graft.geo.BBox.fromExtent(req.transform, req.width, req.height))
    (footprint, (nativeRing, out.crs.srid))
  }

  /** The dataset scan + tile join + grouping plan (steps 2-4 of §3.1). */
  def datasetTiles(spark: SparkSession, cat: TableStore, req: CubeRequest): Dataset[DatasetTile] =
    datasetTiles(spark, cat, req, prepare(spark, cat, req))

  /** As above with the output descriptor already resolved — callers that
    * ran [[prepare]] themselves (cube, the serving paths) must not pay the
    * variable-lookup round-trip twice. */
  private[cube] def datasetTiles(spark: SparkSession, cat: TableStore, req: CubeRequest,
      out: OutDescriptor): Dataset[DatasetTile] = {
    import spark.implicits._
    val (footprint, refined) = spatialFilters(req, out)

    val found = CatalogQueries.findDatasets(spark, cat, DatasetFilters(
      status = Seq("ACTIVE"),
      instanceIds = req.instanceIds,
      recordIds = if (req.recordGroups.nonEmpty) req.recordGroups.flatten else req.recordIds,
      recordTags = req.tags,
      fromTime = req.fromTime, toTime = req.toTime,
      geog = Some(footprint), refined = Some(refined),
      // no global sort: the result is joined/grouped immediately and the
      // kernel (or the headers agg) establishes its own order — see
      // DatasetFilters.joinRecords
      order = false, joinRecords = true))

    // group key: the record itself (A1) or the client-supplied group (A2).
    // Deliberately LAZY even though the frame feeds both the
    // level-selection pass and the final tile join: the duplicate
    // catalog-discovery subtrees execute inside ONE job and overlap
    // across cores, where an eager localCheckpoint here serialized the
    // request into a chain of small jobs and measured ~30% SLOWER
    // end-to-end (r11 profiling: plan-construction-only latency ~1.0 s
    // of a 1.6 s request).
    val withGroup = if (req.recordGroups.nonEmpty) {
      val groups = req.recordGroups.zipWithIndex
        .flatMap { case (g, i) => g.map(r => (r, f"g$i%06d")) }
        .toDF("__grid", "group_key")
      found.join(broadcast(groups), col("record_id") === col("__grid")).drop("__grid")
    } else found.withColumn("group_key", col("record_id"))

    // the broadcast hints below are applied only to BOUNDED requests
    // (record/group/tag/time-filtered): an instance-wide unfiltered cube
    // can match catalog-scale dataset counts, where a forced broadcast
    // would OOM the driver or hit Spark's broadcast hard limit — there
    // the planner's size-based choice decides (r11 review finding)
    val bounded = req.recordIds.nonEmpty || req.recordGroups.nonEmpty ||
      req.tags.nonEmpty || req.fromTime.isDefined || req.toTime.isDefined
    def hinted(df: DataFrame): DataFrame = if (bounded) broadcast(df) else df

    val tiles = selectTileLevel(spark, cat, out, withGroup, bounded)

    // broadcast the request-bounded DATASET side, never the tile side:
    // size-based selection at toy scale picked the tiles projection as
    // the build — pushing every payload byte through the driver — where
    // the metadata side is k rows per request at any store size
    tiles
      .join(hinted(withGroup),
        col("container_uri") === col("t_uri") &&
          coalesce(col("subdir"), lit("")) === col("t_base_subdir"))
      .select(
        col("group_key"), col("record_id"), col("datetime"),
        col("id").as("dataset_id"), col("bands"),
        col("dtype"), col("no_data"), col("min_value"), col("max_value"),
        col("real_min_value"), col("real_max_value"), col("exponent"),
        col("t_width"), col("t_height"), col("t_bands"), col("t_dtype"),
        col("t_crs"), col("t_transform"), col("payload"))
      .as[DatasetTile]
  }

  /** Full cube: plan + kernel + ordered emission. */
  def cube(spark: SparkSession, cat: TableStore, req: CubeRequest): Dataset[Slice] = {
    import spark.implicits._
    val out = prepare(spark, cat, req)

    if (req.headersOnly) {
      // headers-only short-circuit (getCubeStream :325-339): no tile join,
      // no kernel — one aggregation over the dataset scan.
      val found = datasetTilesMetaOnly(spark, cat, req, out)
      return found
        .groupBy(col("group_key"))
        .agg(
          sort_array(collect_set(col("record_id"))).as("record_ids"),
          min(col("datetime")).as("min_datetime"))
        .select(col("group_key"), col("record_ids"), col("min_datetime"),
          lit(out.width).as("width"), lit(out.height).as("height"),
          lit(out.bands).as("bands"), lit(out.mapping.format.dtype.name).as("dtype"),
          lit(Array.empty[Byte]).as("payload"), lit(0L).as("valid_pixels"),
          lit("").as("error"))
        .orderBy(col("min_datetime"), col("group_key"))
        .as[Slice]
    }

    val grouped = datasetTiles(spark, cat, req, out).groupByKey(_.group_key)
    grouped.mapGroups { (key, it) => buildSlice(key, it, out) }
      .orderBy(col("min_datetime"), col("group_key"))
  }

  /** DownloadCube (reference downloader.go:47-158): replay the merge
    * kernel from CLIENT-supplied tiles — the caller already holds slice
    * metadata (e.g. from a headers-only GetCube) plus the raster payloads
    * (e.g. file reads), so no catalog round-trip happens; same kernel,
    * same ordered emission. */
  def downloadCube(spark: SparkSession, tiles: Dataset[DatasetTile],
      out: OutDescriptor): Dataset[Slice] = {
    import spark.implicits._
    tiles.groupByKey(_.group_key)
      .mapGroups { (key, it) => buildSlice(key, it, out) }
      .orderBy(col("min_datetime"), col("group_key"))
  }

  /** Per-dataset slice metadata (the reference's pb.DatasetMeta /
    * InternalMeta, svc/catalog.go:39-70): container addressing + dformat
    * + ranges — everything [[cubeFromMetadata]] needs to rebuild the
    * slice from the raw tile store with NO catalog round-trip. */
  def cubeMetadata(spark: SparkSession, cat: TableStore,
      req: CubeRequest): Dataset[DatasetMeta] = {
    import spark.implicits._
    val out = prepare(spark, cat, req)
    datasetTilesMetaOnly(spark, cat, req, out)
      .select(
        col("group_key"), col("record_id"), col("datetime"),
        col("id").as("dataset_id"),
        col("container_uri"), coalesce(col("subdir"), lit("")).as("subdir"),
        col("bands"),
        col("dtype"), col("no_data"), col("min_value"), col("max_value"),
        col("real_min_value"), col("real_max_value"), col("exponent"))
      .as[DatasetMeta]
  }

  /** GetCubeFromMetadatas (reference downloader.go:47-158 +
    * svc/catalog.go:112-150): rebuild the cube from CLIENT-held metadata
    * and the raw tile store ONLY — the datasets/records/variable tables
    * are never read, mirroring the reference's downloader which fetches
    * the COGs itself from object storage using the URIs in the metadata.
    * The caller supplies the output grid + reference dformat the way the
    * DownloadCube request does. */
  def cubeFromMetadata(spark: SparkSession, cat: TableStore,
      meta: Dataset[DatasetMeta], out: OutDescriptor): Dataset[Slice] = {
    import spark.implicits._
    // reads the tiles store only, scoped to the metadata's container set;
    // the broadcast goes on the client-metadata side (k rows), never the
    // tile-payload side. The hint is GATED on the metadata frame's plan
    // size the same way the sibling getCube path gates on request
    // boundedness: client-held metadata is usually a LocalRelation with
    // exact stats, but this entry point also serves bulk-export-scale
    // sets (GeoTiffIO allows 10⁶ uris), where a forced broadcast could
    // OOM the driver or exceed Spark's broadcast hard limit — there the
    // planner's size-based choice decides (r11 advice).
    val metaDf = meta.toDF()
    val bounded = boundedForBroadcast(metaDf)
    def hinted(df: org.apache.spark.sql.DataFrame) =
      if (bounded) broadcast(df) else df
    val tiles = selectTileLevel(spark, cat, out, metaDf, bounded)
    val ds = tiles
      .join(hinted(metaDf),
        col("container_uri") === col("t_uri") &&
          col("subdir") === col("t_base_subdir"))
      .select(
        col("group_key"), col("record_id"), col("datetime"),
        col("dataset_id"), col("bands"),
        col("dtype"), col("no_data"), col("min_value"), col("max_value"),
        col("real_min_value"), col("real_max_value"), col("exponent"),
        col("t_width"), col("t_height"), col("t_bands"), col("t_dtype"),
        col("t_crs"), col("t_transform"), col("payload"))
      .as[DatasetTile]
    downloadCube(spark, ds, out)
  }

  /** Broadcast-hint gate for frames whose boundedness is only knowable
    * from plan statistics (client-held metadata): a LocalRelation from a
    * request carries exact byte stats and hints; an RDD-backed or
    * store-scale frame reports the default (≈unbounded) size and falls
    * back to the planner's choice. 256 MiB keeps a hinted build far
    * under Spark's broadcast hard limit with driver headroom. */
  private[cube] def boundedForBroadcast(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.stats.sizeInBytes < BigInt(1L << 28)

  private def datasetTilesMetaOnly(spark: SparkSession, cat: TableStore,
      req: CubeRequest, out: OutDescriptor): DataFrame = {
    val (footprint, refined) = spatialFilters(req, out)
    val found = CatalogQueries.findDatasets(spark, cat, DatasetFilters(
      status = Seq("ACTIVE"), instanceIds = req.instanceIds,
      recordIds = if (req.recordGroups.nonEmpty) req.recordGroups.flatten else req.recordIds,
      recordTags = req.tags, fromTime = req.fromTime, toTime = req.toTime,
      geog = Some(footprint), refined = Some(refined),
      // no global sort: the result is joined/grouped immediately and the
      // kernel (or the headers agg) establishes its own order — see
      // DatasetFilters.joinRecords
      order = false, joinRecords = true))
    if (req.recordGroups.nonEmpty) {
      import spark.implicits._
      val groups = req.recordGroups.zipWithIndex
        .flatMap { case (g, i) => g.map(r => (r, f"g$i%06d")) }
        .toDF("__grid", "group_key")
      found.join(broadcast(groups), col("record_id") === col("__grid")).drop("__grid")
    } else found.withColumn("group_key", col("record_id"))
  }

  /** The per-group kernel (mergeDatasetsWorker, catalog.go:531-625): sort
    * by (datetime, dataset id) so the latest paints last; decode tiles;
    * extract the dataset's band subset; merge; envelope errors as values. */
  private[cube] def buildSlice(key: String, rows: Iterator[DatasetTile], out: OutDescriptor): Slice = {
    import graft.consolidation.Consolidation.utf8Compare
    // merge order sorts EXACTLY like Spark would (full-microsecond
    // Timestamp compare, unsigned UTF-8 tie-break) — `getTime` truncates
    // to millis and JVM String order is UTF-16, the two divergences the
    // consolidation kernel's ordering-parity fix documents; a tie decided
    // differently here would let an OLDER record paint last
    val list = rows.toArray.sortWith { (a, b) =>
      val c = a.datetime.compareTo(b.datetime)
      if (c != 0) c < 0 else utf8Compare(a.dataset_id, b.dataset_id) < 0
    }
    // UTF-8 order, matching the headers-only path's sort_array (UTF8String
    // binary order) so the two paths return identical header keys
    val recordIds = list.map(_.record_id).distinct
      .sortWith(utf8Compare(_, _) < 0).toSeq
    val minDt = list.map(_.datetime)
      .reduce((x, y) => if (x.compareTo(y) <= 0) x else y)
    try {
      val sources = list.map { r =>
        val full = Bitmap.fromBytes(r.payload, r.t_width, r.t_height, r.t_bands,
          DType.fromName(r.t_dtype))
        val bm = extractBands(full, r.bands)
        val mapping = DataMapping(
          DataFormat(DType.fromName(r.dtype), r.no_data,
            NumRange(r.min_value, r.max_value)),
          NumRange(r.real_min_value, r.real_max_value), r.exponent)
        SourceRaster(bm, Affine.fromArray(r.t_transform.toArray), CRS.parse(r.t_crs), mapping)
      }.toSeq
      Warp.mergeDatasets(sources, out) match {
        case Some(merged) =>
          Slice(key, recordIds, minDt, out.width, out.height, merged.bands,
            out.mapping.format.dtype.name, merged.toBytes,
            merged.validPixels(out.mapping.format.noData).toLong, "")
        case None =>
          Slice(key, recordIds, minDt, out.width, out.height, 0,
            out.mapping.format.dtype.name, Array.empty[Byte], 0L,
            "Not enough valid pixels (skipped)")
      }
    } catch {
      case e: Exception =>
        Slice(key, recordIds, minDt, out.width, out.height, 0,
          out.mapping.format.dtype.name, Array.empty[Byte], 0L,
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Overview-aware tile selection — the engine's `-ovr AUTO`
    * (image.go:401, SURVEY §4 "pre-aggregation pushdown"): consolidation
    * writes ×2-downsampled pyramid rows as "<subdir>@ovK"; for each
    * (container, base subdir) pick the coarsest level still adequate for
    * the request resolution (×1.2 slack, GDAL's AUTO allowance), falling
    * back to the finest. Selection runs on a payload-free metadata
    * projection (window over the tiny per-dataset level set); only the
    * chosen levels' payloads are joined — a coarse request reads 1/4ᴷ of
    * the pixel bytes. Meters→degrees uses the equatorial factor (no
    * cos-lat), which only ever errs toward a finer level. */
  /** Both tiles scans of a request are container-scoped BEFORE anything
    * else touches the store. Three effects, all load-bearing at 100 TB
    * (the tiles store is the engine's only 100-TB-class table):
    *
    *  1. On a big store, each join carries a bucket conjunct comparing
    *     the derived partition column against [[Catalog.tilesBucketOf]]
    *     of its scoping side, which Catalyst's dynamic partition pruning
    *     turns into a partition filter — only the relevant ~|uris|/64
    *     buckets are LISTED AND READ; payload bytes in other buckets are
    *     never touched (PLANS.md d1: `dynamicpruningexpression` on the
    *     scan). The METADATA scan is scoped by the request's container
    *     set; the PAYLOAD scan by the (even narrower) chosen-level set.
    *  2. The overview-selection window shuffles only the request's tile
    *     metadata, not the whole store's.
    *  3. The payload side joins the chosen-level relation DIRECTLY (no
    *     second request-container semi-join): the chosen set already is
    *     a subset of the request's containers, so a semi-join there
    *     would only re-run the dataset-discovery subtree a third time.
    *
    * The bucket conjuncts are COST-GATED ([[BucketPruneMinBytesConf]]):
    * below the threshold the DPP subquery stages cost more than the
    * whole scan they would prune (r10 bench: getcube 0.5→1.0 s on a 6 MB
    * toy store), so a small store joins on the uri alone — the same
    * size-based strategy choice Spark itself makes for broadcast joins.
    * At 100-TB the threshold is exceeded by five orders of magnitude and
    * the plan is the r10 DPP shape with one fewer discovery subtree. */
  private def selectTileLevel(spark: SparkSession, cat: TableStore, out: OutDescriptor,
      containers: DataFrame, bounded: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val targetResDeg = {
      val rx = math.abs(out.pixToCrs.rx)
      if (out.crs.isGeographic) rx else rx / 111320.0
    }
    // ONE store relation for both scans: the directory listing (a real
    // cost per request — 64 bucket dirs) happens once per plan
    val store = cat.read(spark, "tiles")
    val minBytes = spark.conf.getOption(GetCube.BucketPruneMinBytesConf)
      .map(_.toLong).getOrElse(GetCube.BucketPruneMinBytesDefault)
    val big = store.queryExecution.optimizedPlan.stats.sizeInBytes >= minBytes
    // NO distinct on the build side: a left-semi join is insensitive to
    // build duplicates and DPP aggregates the pruning key itself — a
    // distinct here would add a (tiny but needless) metadata shuffle per
    // tiles reference, breaking the one-payload-shuffle plan contract
    val uris = containers.select(col("container_uri").as("__pu"))
    val semiCond =
      if (big)
        col("container_uri") === col("__pu") &&
          col(Catalog.TilesBucketCol) === Catalog.tilesBucketOf(col("__pu"))
      else col("container_uri") === col("__pu")
    val all = store.join(if (bounded) broadcast(uris) else uris,
      semiCond, "left_semi")
    val meta = all.select(
        col("container_uri"), coalesce(col("subdir"), lit("")).as("subdir"),
        col("crs"), col("transform"))
      .withColumn("base_subdir", regexp_replace(col("subdir"), "@ov\\d+$", ""))
      // geographic tile CRS ⇒ resolution already in degrees. tiles.crs is
      // always CRS.serialize output: "EPSG:<srid>" for a known code or a
      // proj4 string — the geographic forms are exactly EPSG:4326 and
      // "+proj=longlat ..." (incl. datum-shifted longlat, whose towgs84
      // suffix keeps the prefix). A string-match on 4326 alone treated
      // every other geographic CRS as meters, shrinking res_deg ~1e5×:
      // all pyramid levels looked eligible and the window served the
      // COARSEST overview for every request.
      .withColumn("res_deg",
        when(col("crs") === "EPSG:4326" ||
            col("crs").startsWith("+proj=longlat"),
          abs(element_at(col("transform"), 2)))
          .otherwise(abs(element_at(col("transform"), 2)) / 111320.0))
      .withColumn("eligible", col("res_deg") <= targetResDeg * 1.2)
    val w = Window.partitionBy(col("container_uri"), col("base_subdir"))
      .orderBy(col("eligible").desc,
        when(col("eligible"), -col("res_deg")).otherwise(col("res_deg")))
    // Fully-lazy join-back: the level-selection window and the payload
    // retrieval live in ONE plan, so the shared subtrees overlap inside a
    // single job. (An eager localCheckpoint of `chosen` + a static bucket
    // collect was tried in r11 and measured ~30% slower per request at
    // toy scale — plan-construction latency alone reached ~1.0 s — while
    // also disabling Catalyst's DPP on the meta scan, whose rule needs a
    // selective filter on the build side that a bare checkpointed
    // relation no longer carries.)
    val chosen = meta.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("container_uri").as("c_uri"), col("subdir").as("c_subdir"),
        col("base_subdir").as("t_base_subdir"))
    val payCond = {
      val base = col("container_uri") === col("c_uri") &&
        coalesce(col("subdir"), lit("")) === col("c_subdir")
      if (big)
        base && col(Catalog.TilesBucketCol) === Catalog.tilesBucketOf(col("c_uri"))
      else base
    }
    // the chosen-level relation is containers×levels-sized — bounded
    // requests hint it broadcast; unbounded ones let the planner decide
    store.join(if (bounded) broadcast(chosen) else chosen, payCond)
      .select(
        col("container_uri").as("t_uri"), coalesce(col("subdir"), lit("")).as("t_subdir"),
        col("width").as("t_width"), col("height").as("t_height"),
        col("bands").as("t_bands"), col("dtype").as("t_dtype"),
        col("crs").as("t_crs"), col("transform").as("t_transform"),
        col("t_base_subdir"), col("payload"))
  }

  /** Merge a collected set of dataset tiles into one mosaic payload (the
    * XYZ serving path, which runs driver-side for a single 256×256 tile —
    * §3.3: low-latency single tiles bypass the distributed plan). */
  private[cube] def buildSliceForMosaic(tiles: Array[DatasetTile], out: OutDescriptor): Option[Array[Byte]] = {
    if (tiles.isEmpty) return None
    val s = buildSlice("mosaic", tiles.iterator, out)
    if (s.error.nonEmpty || s.payload.isEmpty) None else Some(s.payload)
  }

  /** GDAL `-b`-style band subset (1-based; empty = all bands) —
    * image.go:221-231. */
  private[graft] def extractBands(bm: Bitmap, bands: Seq[Int]): Bitmap = {
    if (bands.isEmpty || bands == (1 to bm.bands)) return bm
    val plane = bm.width * bm.height
    val px = new Array[Double](plane * bands.size)
    for ((b, i) <- bands.zipWithIndex) {
      require(b >= 1 && b <= bm.bands, s"band $b out of range 1..${bm.bands}")
      System.arraycopy(bm.pixels, (b - 1) * plane, px, i * plane, plane)
    }
    new Bitmap(bm.width, bm.height, bands.size, bm.dtype, px)
  }
}
