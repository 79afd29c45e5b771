package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** On-disk layout versioning + journal clock for the parquet catalog. */
class CatalogMigrationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val root: String =
    java.nio.file.Files.createTempDirectory("graft-mig").toString

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(root))
  }

  test("legacy flat jobs directory migrates to the partitioned layout") {
    val cat = Catalog(root)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def jobRow(id: String, name: String, tpe: String): Row =
      Row(id, name, tpe, "NEW", 0, 0, "", t0, t0)
    // simulate a catalog written by the pre-partitioning build: flat
    // part files at the table root with `type` still a data column
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      jobRow("j1", "old", "CONSOLIDATION"), jobRow("j2", "old2", "DELETION"))),
      Schemas.all("jobs"))
      .write.mode("overwrite").parquet(s"$root/jobs")
    assert(new java.io.File(s"$root/jobs").listFiles
      .exists(f => f.isFile && f.getName.endsWith(".parquet")))
    // the new build's first append must not create the mixed flat +
    // type= layout Spark refuses to read — the legacy files are
    // migrated (atomic rewrite) before the partitioned append lands
    cat.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      jobRow("j3", "new", "CONSOLIDATION"))), Schemas.all("jobs")), "jobs")
    val rows = cat.read(spark, "jobs").select("id", "type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("j1", "CONSOLIDATION"), ("j2", "DELETION"),
      ("j3", "CONSOLIDATION")))
    // no flat files remain at the table root
    assert(!new java.io.File(s"$root/jobs").listFiles
      .exists(f => f.isFile && f.getName.endsWith(".parquet")))
  }

  test("journalNow: strictly increasing even within one millisecond") {
    val stamps = (1 to 2000).map(_ => Catalog.journalNow())
    assert(stamps.sliding(2).forall {
      case Seq(a, b) => b.after(a)
      case _ => true
    })
  }
}
