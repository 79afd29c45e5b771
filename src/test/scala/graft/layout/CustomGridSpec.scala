package graft.layout

import graft.catalog.{Catalog, Schemas}
import graft.geo.{BBox, GeomOps}
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** G4: catalog-defined cells + optional subgrid refinement. */
class CustomGridSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val root: String = java.nio.file.Files.createTempDirectory("graft-cgrid").toString
  val cat: Catalog = Catalog(root)

  def wkbBox(b: BBox): Array[Byte] = GeomOps.writeWkb(GeomOps.polygonFromBBox(b))

  override def beforeAll(): Unit = {
    // MGRS-ish: two 10°×10° cells side by side + one far away
    val rows = Seq(
      Row("mgrs", "31U", "EPSG:4326", 4326, wkbBox(BBox(0, 40, 10, 50)), Row(0.0, 40.0, 10.0, 50.0)),
      Row("mgrs", "32U", "EPSG:4326", 4326, wkbBox(BBox(10, 40, 20, 50)), Row(10.0, 40.0, 20.0, 50.0)),
      Row("mgrs", "55K", "EPSG:4326", 4326, wkbBox(BBox(140, -20, 150, -10)), Row(140.0, -20.0, 150.0, -10.0)))
    cat.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.all("cells")), "cells")
  }

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
    rm(new java.io.File(root))
  }

  test("covers: FindCells spatial join selects only intersecting cells") {
    val g = CustomGrid(spark, cat, "mgrs", resolution = 0.5)
    val aoi = GeomOps.polygonFromBBox(BBox(8, 44, 12, 46)) // straddles 31U/32U
    assert(g.covers(aoi).toSeq.sorted == Seq("31U", "32U"))
  }

  test("cell: native bbox grid at the configured resolution") {
    val g = CustomGrid(spark, cat, "mgrs", resolution = 0.5)
    val c = g.cell("31U")
    assert(c.sizeX == 20 && c.sizeY == 20) // 10° / 0.5°
    assert(c.pixToCrs.c0 == 0.0 && c.pixToCrs.c3 == 50.0)
    assertThrows[IllegalArgumentException](g.cell("nope"))
  }

  test("layout flags reach custom grids (kind = grid name, subgrid param)") {
    val g = Grid.fromLayout(Seq("mgrs"),
      Map("resolution" -> "0.5", "cell_size" -> "10", "subgrid" -> "regular"),
      spark, cat)
    val aoi = GeomOps.polygonFromBBox(BBox(8, 44, 12, 46))
    val uris = g.covers(aoi).toSeq
    assert(uris.nonEmpty && uris.forall(_.matches("3[12]U/-?\\d+/-?\\d+")))
    // built-in kinds keep working through the same overload
    val reg = Grid.fromLayout(Seq("regular"),
      Map("crs" -> "EPSG:4326", "resolution" -> "1", "cell_size" -> "4"), spark, cat)
    assert(reg.isInstanceOf[RegularGrid])
  }

  test("subgrid refinement: cells split over the AOI∩cell intersection") {
    val g = CustomGrid(spark, cat, "mgrs", resolution = 0.5,
      subgridOf = Some(crs => RegularGrid(crs, 10, 10, 0.5))) // 5°×5° subcells
    val aoi = GeomOps.polygonFromBBox(BBox(8, 44, 12, 46))
    val uris = g.covers(aoi).toSeq
    // each URI is cellID/i/j and only subcells meeting the intersection appear
    assert(uris.nonEmpty && uris.forall(u => u.matches("3[12]U/-?\\d+/-?\\d+")))
    assert(uris.exists(_.startsWith("31U/")) && uris.exists(_.startsWith("32U/")))
    // composite cell materializes through the subgrid, keeping the full URI
    val c = g.cell(uris.head)
    assert(c.uri == uris.head && c.sizeX == 10 && c.sizeY == 10)
    // AOI containment: every emitted subcell really intersects the AOI
    uris.foreach { u =>
      assert(g.cell(u).nativeRing.intersects(aoi), u)
    }
  }
}
