package graft.catalog

import graft.geo.{BBox, GeomOps}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** C10 admin operations: UpdateDatasets dformat rewrite + TidyDB GC. */
class AdminSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val root: String = java.nio.file.Files.createTempDirectory("graft-admin").toString
  val cat: Catalog = Catalog(root)

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
  def wkbBox(b: BBox): Array[Byte] = GeomOps.writeWkb(GeomOps.polygonFromBBox(b))
  def bboxRow(b: BBox): Row = Row(b.xmin, b.ymin, b.xmax, b.ymax)

  override def beforeAll(): Unit = {
    val sc = spark
    def write(table: String, rows: Seq[Row]): Unit =
      cat.append(sc.createDataFrame(
        sc.sparkContext.parallelize(rows), Schemas.all(table)), table)
    val box = BBox(0, 0, 1, 1)
    // a1 referenced by r1; a2 orphaned. r1 has datasets; r2 does not.
    write("aoi", Seq(
      Row("a1", "h1", wkbBox(box), bboxRow(box)),
      Row("a2", "h2", wkbBox(box), bboxRow(box))))
    write("records", Seq(
      Row("r1", "scene-1", ts("2024-01-01 00:00:00"), Map("s" -> "1"), "a1"),
      Row("r2", "orphan", ts("2024-01-02 00:00:00"), Map("s" -> "2"), "a2")))
    // v1→i1 referenced by datasets; v2→i2 and v3 orphaned
    write("variable_definitions", Seq(
      Row("v1", "ndvi", "1", "d", Seq("b"), "uint8", 255.0, 0.0, 254.0, "", "near"),
      Row("v2", "unused", "1", "d", Seq("b"), "uint8", 255.0, 0.0, 254.0, "", "near"),
      Row("v3", "lonely", "1", "d", Seq("b"), "uint8", 255.0, 0.0, 254.0, "", "near")))
    write("variable_instances", Seq(
      Row("i1", "m", Map.empty[String, String], "v1"),
      Row("i2", "m", Map.empty[String, String], "v2")))
    write("containers", Seq(
      Row("mem://c1", true, "STANDARD"), Row("mem://gone", true, "STANDARD")))
    def dsRow(id: String): Row =
      Row(id, "r1", "i1", "mem://c1", "", Seq(1), "ACTIVE", null,
        "uint8", 255.0, 0.0, 254.0, -1.0, 1.0, 1.0, false,
        wkbBox(box), wkbBox(box), 4326, bboxRow(box))
    write("datasets", Seq(dsRow("d1"), dsRow("d2")))
  }

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
    rm(new java.io.File(root))
  }

  test("listByName (S5): pattern split + order + limit/offset paging") {
    val rows = Seq("alpha", "beta", "Beta2", "gamma").map { n =>
      Row(n, Seq("regular"), Map("resolution" -> "1"), 256, 256, 1024, 256, "")
    }
    cat.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.all("layouts")), "layouts")
    def names(df: org.apache.spark.sql.DataFrame) =
      df.select("name").collect().map(_.getString(0)).toSeq
    assert(names(CatalogQueries.listByName(spark, cat, "layouts")) ==
      Seq("Beta2", "alpha", "beta", "gamma"))
    // '*'→'%', trailing (?i) → case-insensitive (P2 three-way split)
    assert(names(CatalogQueries.listByName(spark, cat, "layouts", "beta*(?i)")) ==
      Seq("Beta2", "beta"))
    assert(names(CatalogQueries.listByName(spark, cat, "layouts", limit = 2, offset = 1)) ==
      Seq("alpha", "beta"))
  }

  test("updateDatasets: impact summary then atomic dformat rewrite") {
    val impact = Admin.updateImpact(spark, cat, Seq("i1")).collect()
    assert(impact.length == 1 && impact(0).getAs[Long]("n_datasets") == 2)
    val n = Admin.updateDatasets(spark, cat, Seq("i1"),
      Admin.DFormatUpdate(minValue = Some(10.0), maxValue = Some(250.0),
        exponent = Some(2.0)))
    assert(n == 2)
    val after = cat.read(spark, "datasets").collect()
    assert(after.forall(_.getAs[Double]("min_value") == 10.0))
    assert(after.forall(_.getAs[Double]("max_value") == 250.0))
    assert(after.forall(_.getAs[Double]("exponent") == 2.0))
    assert(after.forall(_.getAs[String]("dtype") == "uint8")) // untouched
    // no-match update touches nothing
    assert(Admin.updateDatasets(spark, cat, Seq("nope"),
      Admin.DFormatUpdate(noData = Some(0.0))) == 0)
  }

  test("tidy: GC of unreferenced rows in dependency order") {
    // dry-run first: counts the same candidates, deletes nothing
    val dry = Admin.tidy(spark, cat, simulate = true)
    assert(dry("records") == 1 && dry("variable_instances") == 1)
    assert(cat.read(spark, "records").count() == 2) // nothing deleted
    // granular flags: records-only pass leaves the rest untouched
    val recOnly = Admin.tidy(spark, cat, aois = false, variables = false,
      instances = false, containers = false, params = false)
    assert(recOnly("records") == 1 && recOnly("aoi") == 0 &&
      recOnly("variable_instances") == 0)
    assert(cat.read(spark, "aoi").count() == 2) // a2 still there
    val deleted = Admin.tidy(spark, cat)
    assert(deleted == Map(
      "records" -> 0, // r2 already went in the records-only pass
      "aoi" -> 1, // a2 orphaned once r2 went
      "variable_instances" -> 1, // i2 unreferenced
      "variable_definitions" -> 2, // v2 (after i2) and v3
      "consolidation_params" -> 0,
      "containers" -> 1)) // mem://gone
    assert(cat.read(spark, "records").select("id").collect().map(_.getString(0)).toSeq == Seq("r1"))
    assert(cat.read(spark, "variable_definitions").count() == 1)
    // second pass is a no-op (fixpoint)
    assert(Admin.tidy(spark, cat).values.sum == 0)
    // params flag: a consolidation_params row of a vanished variable GCs
    cat.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("v-ghost", "uint8", 255.0, 0.0, 254.0, 0.0, 254.0, 1.0,
        "near", "STANDARD"))), Schemas.all("consolidation_params")),
      "consolidation_params")
    assert(Admin.tidy(spark, cat)("consolidation_params") == 1)
    assert(cat.read(spark, "consolidation_params").count() == 0)
  }

  test("tidy containers cascades to container_layouts and tiles") {
    val sc = spark
    // a consolidated container that lost its last dataset, plus its C5
    // container_layouts row and its pixel rows
    cat.append(sc.createDataFrame(sc.sparkContext.parallelize(Seq(
      Row("mem://stale", true, "STANDARD"))), Schemas.all("containers")),
      "containers")
    cat.append(sc.createDataFrame(sc.sparkContext.parallelize(Seq(
      Row("mem://stale", "lx"))), Schemas.all("container_layouts")),
      "container_layouts")
    cat.append(sc.createDataFrame(sc.sparkContext.parallelize(Seq(
      Row("mem://stale", "", 1, 1, 1, "uint8", "EPSG:4326",
        Seq(0.0, 1.0, 0.0, 1.0, 0.0, -1.0), Array[Byte](7)))),
      Schemas.all("tiles")), "tiles")
    // dry-run counts but deletes nothing, pixels included
    assert(Admin.tidy(spark, cat, aois = false, records = false,
      variables = false, instances = false, params = false,
      simulate = true)("containers") == 1)
    assert(cat.read(spark, "tiles")
      .filter(col("container_uri") === "mem://stale").count() == 1)
    assert(Admin.tidy(spark, cat, aois = false, records = false,
      variables = false, instances = false, params = false)("containers") == 1)
    // the layout reference went with its container — a dangling row here
    // would block deleteLayout("lx") forever
    assert(cat.read(spark, "container_layouts")
      .filter(col("container_uri") === "mem://stale").count() == 0)
    // ...and the dead pixel rows went too (nothing else GCs them for a
    // catalog maintained by TidyDB alone)
    assert(cat.read(spark, "tiles")
      .filter(col("container_uri") === "mem://stale").count() == 0)
  }

  test("tidy tiles scrub spares pixels a dataset still references (torn import)") {
    val sc = spark
    // a torn import: tiles landed, the containers append crashed, and
    // IndexDatasets (validating against tiles) registered an ACTIVE
    // dataset on the uri — no containers row exists
    cat.append(sc.createDataFrame(sc.sparkContext.parallelize(Seq(
      Row("mem://torn", "", 1, 1, 1, "uint8", "EPSG:4326",
        Seq(0.0, 1.0, 0.0, 1.0, 0.0, -1.0), Array[Byte](9)))),
      Schemas.all("tiles")), "tiles")
    val box = BBox(0, 0, 1, 1)
    cat.append(sc.createDataFrame(sc.sparkContext.parallelize(Seq(
      Row("d-torn", "r1", "i1", "mem://torn", "", Seq(1), "ACTIVE", null,
        "uint8", 255.0, 0.0, 254.0, -1.0, 1.0, 1.0, false,
        wkbBox(box), wkbBox(box), 4326, bboxRow(box)))),
      Schemas.all("datasets")), "datasets")
    Admin.tidy(spark, cat, aois = false, records = false,
      variables = false, instances = false, params = false)
    // the serving dataset's pixels survive the scrub
    assert(cat.read(spark, "tiles")
      .filter(col("container_uri") === "mem://torn").count() == 1)
    // drop the dataset: the next tidy may collect the now-dead pixels
    cat.rewrite(cat.read(spark, "datasets")
      .filter(col("id") =!= "d-torn"), "datasets")
    Admin.tidy(spark, cat, aois = false, records = false,
      variables = false, instances = false, params = false)
    assert(cat.read(spark, "tiles")
      .filter(col("container_uri") === "mem://torn").count() == 0)
  }

  test("updateImpact scopes by recordIds; all-None update skips the rewrite") {
    // record-scoped dry-run describes only the scoped hit set
    val whole = Admin.updateImpact(spark, cat, Seq("i1"))
      .agg(sum(col("n_datasets"))).collect().head.getLong(0)
    val scoped = Admin.updateImpact(spark, cat, Seq("i1"), Seq("r1"))
      .agg(sum(col("n_datasets"))).collect().head.getLong(0)
    assert(scoped <= whole && scoped > 0)
    // an empty DFormatUpdate reports the hit count without a table swap
    val before = new java.io.File(s"$root/datasets").lastModified
    Thread.sleep(5)
    assert(Admin.updateDatasets(spark, cat, Seq("i1"),
      Admin.DFormatUpdate()) > 0)
    assert(new java.io.File(s"$root/datasets").lastModified == before)
  }

  test("updateDatasets: record scoping and simulate") {
    // r1 has both datasets; scope to a single record id — only d1 moves
    val n = Admin.updateDatasets(spark, cat, Seq("i1"),
      Admin.DFormatUpdate(noData = Some(7.0)), recordIds = Seq("r1"),
      simulate = true)
    assert(n == 2) // both datasets belong to r1 in this fixture
    assert(cat.read(spark, "datasets")
      .filter(col("no_data") === 7.0).count() == 0) // dry-run applied nothing
    assert(Admin.updateDatasets(spark, cat, Seq("i1"),
      Admin.DFormatUpdate(noData = Some(7.0)), recordIds = Seq("r-none")) == 0)
    assert(Admin.updateDatasets(spark, cat, Seq("i1"),
      Admin.DFormatUpdate(noData = Some(7.0)), recordIds = Seq("r1")) == 2)
    assert(cat.read(spark, "datasets")
      .filter(col("no_data") === 7.0).count() == 2)
  }
}
