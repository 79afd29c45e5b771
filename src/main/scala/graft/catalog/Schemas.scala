package graft.catalog

import org.apache.spark.sql.types._

/** Catalog table schemas (FIXTURES.md §1), mirroring the reference's
  * relational model (interface/database/pg/create.sql) with the Spark type
  * mapping of SURVEY §1.3: UUIDs as strings, hstore as map<string,string>,
  * geometries as WKB binary + bbox struct companions for pruning.
  */
object Schemas {

  val bbox: StructType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType)))

  /** aoi — create.sql:19-26. */
  val aoi: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("hash", StringType, nullable = false),
    StructField("geom_wkb", BinaryType),
    StructField("bbox", bbox)))

  /** records — create.sql:28-39. */
  val records: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("datetime", TimestampType, nullable = false),
    StructField("tags", MapType(StringType, StringType)),
    StructField("aoi_id", StringType)))

  /** variable_definitions — create.sql:47-61. */
  val variableDefinitions: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("unit", StringType),
    StructField("description", StringType),
    StructField("bands", ArrayType(StringType)),
    StructField("dtype", StringType),
    StructField("no_data", DoubleType),
    StructField("min_value", DoubleType),
    StructField("max_value", DoubleType),
    StructField("palette", StringType),
    StructField("resampling_alg", StringType)))

  /** variable_instances — create.sql:63-72. */
  val variableInstances: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("metadata", MapType(StringType, StringType)),
    StructField("definition_id", StringType, nullable = false)))

  /** containers — create.sql:74-81. */
  val containers: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("managed", BooleanType),
    StructField("storage_class", StringType)))

  /** datasets — create.sql:83-114, the central fact table. */
  val datasets: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("instance_id", StringType, nullable = false),
    StructField("container_uri", StringType, nullable = false),
    StructField("subdir", StringType),
    StructField("bands", ArrayType(IntegerType)),
    StructField("status", StringType), // ACTIVE | TODELETE | INACTIVE
    StructField("locked_by_job_id", StringType),
    StructField("dtype", StringType),
    StructField("no_data", DoubleType),
    StructField("min_value", DoubleType),
    StructField("max_value", DoubleType),
    StructField("real_min_value", DoubleType),
    StructField("real_max_value", DoubleType),
    StructField("exponent", DoubleType),
    StructField("overviews", BooleanType),
    StructField("geog_wkb", BinaryType), // geographic footprint (4326)
    StructField("shape_wkb", BinaryType), // native-CRS footprint
    StructField("shape_srid", IntegerType),
    StructField("bbox", bbox))) // geographic bbox, prune companion

  /** layouts — create.sql:116-126. */
  val layouts: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("grid_flags", ArrayType(StringType)),
    StructField("grid_parameters", MapType(StringType, StringType)),
    StructField("block_x_size", IntegerType),
    StructField("block_y_size", IntegerType),
    StructField("max_records", IntegerType),
    StructField("overviews_min_size", IntegerType),
    StructField("interlacing_pattern", StringType)))

  /** grid cells — create.sql:188-205. */
  val cells: StructType = StructType(Seq(
    StructField("grid", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("crs", StringType),
    StructField("srid", IntegerType),
    StructField("coordinates_wkb", BinaryType),
    StructField("bbox", bbox)))

  /** consolidation_params — create.sql:100-114 (per-VARIABLE consolidation
    * configuration, written by ConfigConsolidation and read by the
    * consolidation job when the caller does not pass params explicitly). */
  val consolidationParams: StructType = StructType(Seq(
    StructField("variable_id", StringType, nullable = false),
    StructField("dtype", StringType, nullable = false),
    StructField("no_data", DoubleType),
    StructField("min_value", DoubleType),
    StructField("max_value", DoubleType),
    StructField("real_min_value", DoubleType),
    StructField("real_max_value", DoubleType),
    StructField("exponent", DoubleType),
    StructField("resampling_alg", StringType),
    StructField("storage_class", StringType)))

  /** container_layouts — create.sql:180-186 (which layout each
    * consolidated container follows; written at C5, read by
    * FindContainerLayouts / the downloadCube metadata path). */
  val containerLayouts: StructType = StructType(Seq(
    StructField("container_uri", StringType, nullable = false),
    StructField("layout_name", StringType, nullable = false)))

  /** palette — create.sql:41-45. */
  val palette: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("points", ArrayType(StructType(Seq(
      StructField("value", FloatType), StructField("r", IntegerType),
      StructField("g", IntegerType), StructField("b", IntegerType),
      StructField("a", IntegerType)))))))

  /** jobs — create.sql:128-153 (payload as JSON string). */
  val jobs: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("type", StringType),
    StructField("state", StringType),
    StructField("active_tasks", IntegerType),
    StructField("failed_tasks", IntegerType),
    StructField("payload", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  /** tasks — create.sql:154-166 (payload as JSON string, not gob). */
  val tasks: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("job_id", StringType, nullable = false),
    StructField("state", StringType),
    StructField("payload", StringType)))

  /** tiles — OUR pixel storage: one row per (container, subdir) raster.
    * The reference stores COG files in object storage (S8); the
    * Spark-native equivalent is a parquet tile table addressed by the same
    * (container_uri, subdir) key the datasets table carries, with the
    * payload as the Bitmap byte codec. */
  val tiles: StructType = StructType(Seq(
    StructField("container_uri", StringType, nullable = false),
    StructField("subdir", StringType),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bands", IntegerType, nullable = false),
    StructField("dtype", StringType, nullable = false),
    StructField("crs", StringType, nullable = false), // "EPSG:nnnn"
    StructField("transform", ArrayType(DoubleType), nullable = false), // affine 6
    StructField("payload", BinaryType, nullable = false)))

  val all: Map[String, StructType] = Map(
    "aoi" -> aoi, "records" -> records,
    "variable_definitions" -> variableDefinitions,
    "variable_instances" -> variableInstances,
    "containers" -> containers, "datasets" -> datasets,
    "layouts" -> layouts, "cells" -> cells, "palette" -> palette,
    "container_layouts" -> containerLayouts,
    "consolidation_params" -> consolidationParams,
    "jobs" -> jobs, "tasks" -> tasks, "tiles" -> tiles)
}
