package graft.layout

import graft.geo.GeomOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Geometry

/** Layout = grid spec + internal tiling + packing params (reference
  * internal/geocube/layout.go:16-29, create.sql:116-126). */
final case class Layout(
    name: String,
    gridFlags: Seq[String],
    gridParameters: Map[String, String],
    blockXSize: Int = 256,
    blockYSize: Int = 256,
    maxRecords: Int = 1024,
    overviewsMinSize: Int = 256,
    interlacingPattern: String = "") {

  // The resolved grid. Built-in kinds (regular/singlecell) resolve from
  // the parameters alone; a CATALOG-DEFINED custom grid (any other flag,
  // customgrid.go:26-41) needs a catalog — callers that hold one invoke
  // [[resolveGrid]] first, after which `grid` serves the catalog-backed
  // form. Memoized; driver-side only for custom grids (their covers runs
  // catalog queries, like the reference's DB-backed TileAOI).
  @transient private var resolvedGrid: Grid = null

  /** Resolve the grid against a catalog (no-op re-resolution is cheap for
    * built-ins; required before `grid`/`covers` for custom grids). */
  def resolveGrid(spark: SparkSession,
      cat: graft.catalog.TableStore): this.type = {
    resolvedGrid = Grid.fromLayout(gridFlags, gridParameters, spark, cat)
    this
  }

  def grid: Grid = {
    if (resolvedGrid == null)
      resolvedGrid = Grid.fromLayout(gridFlags, gridParameters)
    resolvedGrid
  }

  /** The grid-independent half of [[validate]] — used for layouts whose
    * grid is a catalog-defined CUSTOM grid (resolvable only with a
    * catalog at covers time, customgrid.go:26-41). */
  def validateStructure(): this.type = {
    require(blockXSize > 0 && blockYSize > 0, "block sizes must be positive")
    require(maxRecords > 0, "max_records must be positive")
    if (interlacingPattern.nonEmpty)
      graft.raster.Interlacing.parse(interlacingPattern) // throws on bad grammar
    this
  }

  /** Validation the reference runs on layout creation (layout.go:120-129):
    * block sizes/packing positive, and the interlacing pattern must parse
    * (mucog.InitIterators check :127). Throws IllegalArgumentException. */
  def validate(): this.type = {
    validateStructure()
    grid // force grid-parameter validation too
    this
  }

  /** Covers with geometry-hash dedup (layout.go:73-113, G5). */
  def covers(aoiLonLat: Geometry, removeDuplicate: Boolean = true): Iterator[Cell] = {
    val it = grid.covers(aoiLonLat).map(grid.cell)
    if (!removeDuplicate) it
    else {
      val seen = scala.collection.mutable.HashSet.empty[String]
      it.filter(c => seen.add(GeomOps.geometryHash(c.geographicRing)))
    }
  }
}

/** A streamed tile row (G6 TileAOI, svc/service.go:506-524): the cell's
  * grid georeferencing, flattened for a DataFrame. */
final case class TileRow(
    uri: String, crs: String, sizeX: Int, sizeY: Int,
    transform: Seq[Double])

object Layout {

  /** TileAOI as a distributed generator (G6): one input row per AOI →
    * flatMap over covering cells. For a single AOI this runs on the driver
    * in the reference; the Spark form scales to millions of AOIs (the
    * generator is a narrow transformation — no shuffle). */
  def tileAois(spark: SparkSession, layout: Layout,
      aois: Dataset[(String, Array[Byte])]): DataFrame = {
    import spark.implicits._
    // eager guard: a CATALOG-BACKED custom grid resolves on the driver
    // only (its covers runs catalog queries, and the memoized grid is
    // @transient — gone in the executor closure). Without this the job
    // fails per-task with a misleading "unsupported grid" error.
    require(layout.gridFlags.headOption.forall(k =>
      k == "regular" || k == "singlecell"),
      s"tileAois runs covers on executors; catalog-backed custom grid " +
        s"'${layout.gridFlags.headOption.getOrElse("")}' must tile on the " +
        "driver via tileAoiBatches / FindCells")
    aois.flatMap { case (aoiId, wkb) =>
      layout.covers(GeomOps.readWkb(wkb)).map { c =>
        (aoiId, TileRow(c.uri, graft.geo.CRS.serialize(c.crs), c.sizeX, c.sizeY,
          c.pixToCrs.toArray.toSeq))
      }
    }.toDF("aoi_id", "tile")
      .select(col("aoi_id"), col("tile.*"))
  }

  /** Stream tiles for one AOI in fixed batches (grpc
    * StreamTilesBatchSize=1000, internal/grpc/service.go:35-36). */
  def tileAoiBatches(layout: Layout, aoi: Geometry, batchSize: Int = 1000): Iterator[Seq[TileRow]] =
    layout.covers(aoi).map(c =>
      TileRow(c.uri, graft.geo.CRS.serialize(c.crs), c.sizeX, c.sizeY, c.pixToCrs.toArray.toSeq))
      .grouped(batchSize)
}
