package graft.ingest

import graft.catalog.{Catalog, Schemas}
import graft.core.{DataFormat, DType, NumRange}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bulk-backfill shape of C8: validation as joined columns, failures-only
  * collect, distributed footprint derivation (service.go:239-379). */
class IndexDatasetsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val root: String = java.nio.file.Files.createTempDirectory("graft-idx").toString
  val cat: Catalog = Catalog(root)
  val N = 10000

  override def beforeAll(): Unit = {
    val sc = spark
    // 10k one-px containers; headers only matter — payload is 1 byte
    val rows = (0 until N).map { i =>
      Row(s"mem://bulk$i", "", 1, 1, 1, "uint8", "EPSG:4326",
        Seq(i.toDouble % 360 - 180, 1.0, 0.0, 45.0, 0.0, -1.0), Array[Byte](0))
    }
    cat.append(sc.createDataFrame(
      sc.sparkContext.parallelize(rows, 8), Schemas.all("tiles")), "tiles")
  }

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
    rm(new java.io.File(root))
  }

  val fmt: DataFormat = DataFormat(DType.UInt8, 255.0, NumRange(0, 254))

  test("bulk backfill: 10k containers index without driver-side header collect") {
    val reqs = (0 until N).map { i =>
      IndexDatasets.NewDataset(recordId = s"r$i", instanceId = "i1",
        containerUri = s"mem://bulk$i", dformat = fmt, realMin = 0, realMax = 1)
    }
    IndexDatasets.run(spark, cat, reqs)
    val ds = cat.read(spark, "datasets")
    assert(ds.count() == N)
    assert(ds.filter(col("status") === "ACTIVE").count() == N)
    // footprints derived distributed: spot-check one bbox from its transform
    val d7 = ds.filter(col("record_id") === "r7").collect().head
    val b = d7.getAs[Row]("bbox")
    assert(b.getDouble(0) == 7.0 % 360 - 180 && b.getDouble(3) == 45.0)
  }

  test("validation failures collected as a bounded sample, not one-at-a-time") {
    val bad = (0 until 50).map { i =>
      IndexDatasets.NewDataset(recordId = s"x$i", instanceId = "i1",
        containerUri = s"mem://missing$i", dformat = fmt, realMin = 0, realMax = 1)
    }
    val e = intercept[IllegalArgumentException](IndexDatasets.run(spark, cat, bad))
    assert(e.getMessage.contains("unreachable"))
    assert(e.getMessage.split(";").length <= 10) // bounded sample
    // nothing appended on failure
    assert(cat.read(spark, "datasets").filter(col("record_id").startsWith("x")).count() == 0)
  }

  test("band range and dtype mismatches surface with specifics") {
    val e1 = intercept[IllegalArgumentException](IndexDatasets.run(spark, cat, Seq(
      IndexDatasets.NewDataset(recordId = "y", instanceId = "i1",
        containerUri = "mem://bulk0", bands = Seq(1, 2), dformat = fmt,
        realMin = 0, realMax = 1))))
    assert(e1.getMessage.contains("out of container range"))
    val e2 = intercept[IllegalArgumentException](IndexDatasets.run(spark, cat, Seq(
      IndexDatasets.NewDataset(recordId = "y", instanceId = "i1",
        containerUri = "mem://bulk0",
        dformat = DataFormat(DType.Int16, -1, NumRange(0, 100)),
        realMin = 0, realMax = 1))))
    assert(e2.getMessage.contains("dtype mismatch"))
  }

  test("duplicate tile rows (re-imported container) index ONE dataset") {
    val sc = spark
    // the tiles table is append-only: a second import of bulk42 leaves
    // two identical header rows — the validation join must not fan the
    // request out into two registrations
    cat.append(sc.createDataFrame(sc.sparkContext.parallelize(Seq(
      Row("mem://bulk42", "", 1, 1, 1, "uint8", "EPSG:4326",
        Seq(42.0 % 360 - 180, 1.0, 0.0, 45.0, 0.0, -1.0), Array[Byte](0)))),
      Schemas.all("tiles")), "tiles")
    IndexDatasets.run(spark, cat, Seq(
      IndexDatasets.NewDataset(recordId = "rdup", instanceId = "i2",
        containerUri = "mem://bulk42", dformat = fmt, realMin = 0, realMax = 1)))
    assert(cat.read(spark, "datasets")
      .filter(col("record_id") === "rdup").count() == 1)
  }
}
