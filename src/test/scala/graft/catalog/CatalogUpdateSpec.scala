package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit, when}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Partition-scoped updates of statically-partitioned catalog tables
  * ([[Catalog.updatePartitions]]) — the metadata-table sibling of the
  * bucket-scoped tiles delete: an FSM status flip for one instance must
  * cost that instance's partition I/O only, with every other partition's
  * files untouched. */
class CatalogUpdateSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val root: String =
    java.nio.file.Files.createTempDirectory("graft-upd").toString

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(root))
  }

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def jrow(id: String, name: String, tpe: String, state: String): Row =
    Row(id, name, tpe, state, 0, 0, "", t0, t0)

  private def fileState(dir: java.io.File): Map[String, (Long, Int)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    if (!dir.exists) Map.empty
    else walk(dir).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      (f.getPath.stripPrefix(dir.getPath),
        (f.length(), java.util.Arrays.hashCode(bytes)))
    }.toMap
  }

  test("updatePartitions touches only the named partitions; others stay byte-identical") {
    val r = s"$root/scoped"
    val cat = Catalog(r)
    cat.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      jrow("a1", "a", "CONSOLIDATION", "NEW"),
      jrow("a2", "a2", "CONSOLIDATION", "FAILED"),
      jrow("b1", "b", "DELETION", "NEW"),
      jrow("c1", "c", "TASKEVENT", "COUNTERS"))),
      Schemas.all("jobs")), "jobs")
    val untouched = Seq("type=DELETION", "type=TASKEVENT")
      .map(d => d -> fileState(new java.io.File(s"$r/jobs/$d"))).toMap
    assert(untouched.values.forall(_.nonEmpty))
    cat.updatePartitions(spark, "jobs", Seq("CONSOLIDATION"),
      _.withColumn("state",
        when(col("state") === "FAILED", "RETRIED").otherwise(col("state"))))
    untouched.foreach { case (d, before) =>
      assert(fileState(new java.io.File(s"$r/jobs/$d")) == before,
        s"partition $d was touched by an unrelated update")
    }
    val states = cat.read(spark, "jobs").select("id", "state").collect()
      .map(row => (row.getString(0), row.getString(1))).toSet
    assert(states == Set(("a1", "NEW"), ("a2", "RETRIED"),
      ("b1", "NEW"), ("c1", "COUNTERS")))
    assert(!new java.io.File(s"$r/jobs.bswap").exists)
    assert(!new java.io.File(s"$r/jobs.bold").exists)
  }

  test("a partition whose rows are all dropped disappears; empty values = all partitions") {
    val r = s"$root/drop"
    val cat = Catalog(r)
    cat.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      jrow("a1", "a", "CONSOLIDATION", "DONE"),
      jrow("b1", "b", "DELETION", "DONE"),
      jrow("b2", "b2", "DELETION", "NEW"))),
      Schemas.all("jobs")), "jobs")
    // unscoped (empty values): the filter applies to every partition,
    // and the CONSOLIDATION partition — all DONE — is removed outright
    cat.updatePartitions(spark, "jobs", Nil, _.filter(col("state") =!= "DONE"))
    assert(!new java.io.File(s"$r/jobs/type=CONSOLIDATION").exists)
    assert(cat.read(spark, "jobs").select("id").collect()
      .map(_.getString(0)).toSet == Set("b2"))
  }

  test("a transform that moves rows across partitions is rejected before any swap") {
    val r = s"$root/escape"
    val cat = Catalog(r)
    cat.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      jrow("a1", "a", "CONSOLIDATION", "NEW"),
      jrow("b1", "b", "DELETION", "NEW"))),
      Schemas.all("jobs")), "jobs")
    val before = fileState(new java.io.File(s"$r/jobs"))
    intercept[IllegalArgumentException] {
      cat.updatePartitions(spark, "jobs", Seq("CONSOLIDATION"),
        _.withColumn("type", lit("DELETION")))
    }
    // nothing swapped, nothing staged left behind
    assert(fileState(new java.io.File(s"$r/jobs")) == before)
    assert(!new java.io.File(s"$r/jobs.bswap").exists)
  }

  test("updatePartitions refuses unpartitioned and derived-partitioned tables") {
    val cat = Catalog(s"$root/refuse")
    intercept[IllegalArgumentException] {
      cat.updatePartitions(spark, "records", Nil, identity)
    }
    intercept[IllegalArgumentException] {
      cat.updatePartitions(spark, "tiles", Nil, identity)
    }
  }
}
