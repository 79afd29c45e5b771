package graft.api

import graft.catalog.Catalog
import graft.core.{DataFormat, DType, NumRange}
import graft.geo.{Affine, BBox, GeomOps}
import graft.ingest.IndexDatasets
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The method-per-rpc facade exercised as a user of the reference would:
  * create AOI/records/variable → index datasets → list → cube → admin. */
class GeocubeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val root: String = java.nio.file.Files.createTempDirectory("graft-api").toString
  val cat: Catalog = Catalog(root)
  lazy val gc: Geocube = Geocube(spark, cat)

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
  val box: BBox = BBox(0, 0, 4, 4)

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
    rm(new java.io.File(root))
  }

  test("full client flow: create -> index -> list -> cube") {
    // AOI dedups by geometry hash
    val aoiId = gc.createAoi(GeomOps.polygonFromBBox(box))
    assert(gc.createAoi(GeomOps.polygonFromBBox(box)) == aoiId)
    assert(cat.read(spark, "aoi").count() == 1)
    assert(gc.getAoi(aoiId).get.getArea == 16.0)

    gc.createRecords(Seq(
      gc.NewRecord("r1", "scene-1", ts("2024-01-01 00:00:00"), Map("sat" -> "S2A"), aoiId),
      gc.NewRecord("r2", "scene-2", ts("2024-01-02 00:00:00"), Map("sat" -> "S2B"), aoiId)))
    gc.createVariable(gc.NewVariable(id = "v1", name = "ndvi",
      dtype = "uint8", noData = 255.0, minValue = 0.0, maxValue = 254.0))
    gc.instantiateVariable("v1", "i1", "master")
    assert(gc.listVariables("nd*").count() == 1)

    // seed a container + tile, then index datasets through the rpc
    cat.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("mem://c1", true, "STANDARD"))), graft.catalog.Schemas.all("containers")),
      "containers")
    cat.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("mem://c1", "", 4, 4, 1, "uint8", "EPSG:4326",
        Seq(0.0, 1.0, 0.0, 4.0, 0.0, -1.0),
        new graft.raster.Bitmap(4, 4, 1, DType.UInt8,
          Array.fill(16)(100.0)).toBytes))), graft.catalog.Schemas.all("tiles")),
      "tiles")
    gc.indexExternalDatasets(Seq(IndexDatasets.NewDataset(
      recordId = "r1", instanceId = "i1", containerUri = "mem://c1",
      dformat = DataFormat(DType.UInt8, 255.0, NumRange(0, 254)),
      realMin = 0, realMax = 254)))
    assert(gc.listDatasets("i1").count() == 1)
    assert(gc.getRecords(Seq("r2", "r1")).select("id").collect()
      .map(_.getString(0)).toSeq == Seq("r2", "r1")) // order preserved

    // tags rpcs
    assert(gc.addRecordsTags(Seq("r1"), Map("proc" -> "L2")) == 1)
    assert(gc.listRecords(tags = Map("proc" -> "L2")).count() == 1)
    assert(gc.removeRecordsTags(Seq("r1"), Seq("proc")) == 1)
    assert(gc.listRecords(tags = Map("proc" -> "L2")).count() == 0)

    // the cube rpc
    val slices = gc.getCubeFromRecords(Seq(Seq("r1")), Seq("i1"),
      "EPSG:4326", Affine.northUp(0, 4, 1, -1), 4, 4).collect()
    assert(slices.length == 1 && slices(0).record_ids == Seq("r1"))

    // admin: tidy drops the datasets-less r2 (and nothing else needed)
    val deleted = gc.tidyDb()
    assert(deleted("records") == 1)
    assert(gc.listRecords().count() == 1)
  }

  test("grids and layouts rpcs") {
    gc.createGrid("g1", Seq(
      ("c1", "EPSG:4326", GeomOps.polygonFromBBox(BBox(0, 0, 10, 10)))))
    assert(gc.listGrids("g*").collect().map(_.getString(0)).toSeq == Seq("g1"))
    val layout = graft.layout.Layout("l1", Seq("regular"),
      Map("crs" -> "EPSG:4326", "resolution" -> "1", "cell_size" -> "4"),
      interlacingPattern = "Z=0>T>R>B;Z=1:>R>T>B")
    gc.createLayout(layout)
    assert(gc.listLayouts().count() == 1)
    assertThrows[IllegalArgumentException](gc.createLayout(
      layout.copy(name = "bad", interlacingPattern = "R>B")))
    val batches = gc.tileAoi(GeomOps.polygonFromBBox(BBox(0, 0, 8, 8)), layout).toSeq
    assert(batches.flatten.size == 4) // 2×2 cells of 4px at 1°
  }
}
