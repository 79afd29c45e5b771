package graft.catalog

import org.apache.spark.sql.Row
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Swap-store → commit-log-store migration is a FILE COPY plus one log
  * commit — the [[TableLayout]] promise that the two stores differ only
  * in visibility mechanism, never in what the bytes look like. Proven
  * by byte-identity: the parquet files the commit-log store serves after
  * [[CommitLogTableStore.importTable]] are bit-for-bit the source's,
  * across an unpartitioned table, a statically-partitioned one, and the
  * derived-bucket tiles layout. */
class StoreMigrationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base =
    java.nio.file.Files.createTempDirectory("graft-migrate").toString
  private lazy val from = Catalog(s"$base/swap")
  private lazy val to = CommitLogTableStore(s"$base/log")

  override def afterAll(): Unit = CatalogTestIO.rm(new java.io.File(base))

  private def seed(table: String, rows: Seq[Row]): Unit =
    from.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Schemas.all(table)), table)

  private def collectSet(s: TableStore, table: String): Set[String] =
    s.read(spark, table).collect().map(_.toSeq.map {
      case b: Array[Byte] => b.mkString(",")
      case x => String.valueOf(x)
    }.mkString("|")).toSet

  private def parquetBytes(dir: java.io.File): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(dir).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val crc = new java.util.zip.CRC32
      crc.update(bytes)
      f.getName -> crc.getValue
    }.toMap
  }

  test("importTable: rows survive, files are byte-identical copies") {
    seed("records", Seq(
      Row("r1", "s1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        Map.empty[String, String], "a1"),
      Row("r2", "s2", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
        Map.empty[String, String], "a1")))
    seed("tasks", Seq(
      Row("t1", "j1", "NEW", ""), Row("t2", "j2", "DONE", "x")))
    seed("tiles", Seq(
      Row("mem://c1", "", 2, 2, 1, "uint8", "EPSG:4326",
        Seq(0.0, 1.0, 0.0, 2.0, 0.0, -1.0), Array[Byte](1, 2, 3, 4)),
      Row("mem://c2", "", 2, 2, 1, "uint8", "EPSG:4326",
        Seq(0.0, 1.0, 0.0, 2.0, 0.0, -1.0), Array[Byte](5, 6, 7, 8))))

    for (t <- Seq("records", "tasks", "tiles"))
      to.importTable(spark, t, from)

    for (t <- Seq("records", "tasks", "tiles"))
      assert(collectSet(to, t) == collectSet(from, t), s"table $t diverged")

    // the tiles bucket layout carried over: reads still partition-prune
    assert(to.read(spark, "tiles").columns.contains(Catalog.TilesBucketCol))

    // bit-for-bit: every imported parquet file matches its source CRC
    for (t <- Seq("records", "tasks", "tiles")) {
      val src = parquetBytes(new java.io.File(s"$base/swap/$t"))
      val dst = parquetBytes(new java.io.File(s"$base/log/$t/data"))
      assert(src.nonEmpty && dst == src, s"table $t files rewritten")
    }
  }

  test("a legacy flat source is healed into partition dirs before import") {
    // a swap catalog written by the pre-partitioning build: flat part
    // files with job_id still a data column — imported raw, these files
    // would carry an EMPTY partition dir and silently dodge every later
    // partition-scoped rewrite. importTable reads through the source
    // Catalog first, which runs its legacy-layout migration.
    val legacyRoot = s"$base/legacy"
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row("t1", "j1", "NEW", ""), Row("t2", "j2", "NEW", "")), 1),
      Schemas.all("tasks"))
      .write.mode("overwrite").parquet(s"$legacyRoot/tasks")
    assert(new java.io.File(s"$legacyRoot/tasks").listFiles
      .exists(f => f.isFile && f.getName.endsWith(".parquet")))
    val t3 = CommitLogTableStore(s"$base/log3")
    t3.importTable(spark, "tasks", Catalog(legacyRoot))
    assert(collectSet(t3, "tasks") == Set("t1|j1|NEW|", "t2|j2|NEW|"))
    // every imported file sits in a job_id= partition dir, so the
    // partition-scoped ops actually target it
    t3.updatePartitions(spark, "tasks", Seq("j1"),
      _.withColumn("state", org.apache.spark.sql.functions.lit("DONE")))
    assert(collectSet(t3, "tasks") == Set("t1|j1|DONE|", "t2|j2|NEW|"))
  }

  test("a large import distributes its copies as a Spark job, byte-identically") {
    // >256 files crosses importTable's distributed-copy threshold: the
    // byte copy runs executor-side (at 100 TB a driver-side loop is
    // bounded by the driver's NIC), staged invisible until the one
    // commit. 300 single-row job partitions → 300 source parquet files.
    val bigRoot = s"$base/big"
    val bigFrom = Catalog(bigRoot)
    bigFrom.append(spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1 to 300).map(i => Row(f"t$i%03d", f"j$i%03d", "NEW", "")), 4),
      Schemas.all("tasks")), "tasks")
    // keyed by partition dir + name: Spark part-file names repeat across
    // partition dirs, so the name-only helper above would collapse them
    def files(dir: java.io.File): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(dir).map { f =>
        val crc = new java.util.zip.CRC32
        crc.update(java.nio.file.Files.readAllBytes(f.toPath))
        s"${f.getParentFile.getName}/${f.getName}" -> crc.getValue
      }.toMap
    }
    val srcFiles = files(new java.io.File(s"$bigRoot/tasks"))
    assert(srcFiles.size > 256, s"setup: only ${srcFiles.size} source files")
    val big = CommitLogTableStore(s"$base/logbig")
    big.importTable(spark, "tasks", bigFrom)
    assert(big.read(spark, "tasks").count() == 300)
    val dst = files(new java.io.File(s"$base/logbig/tasks/data"))
    assert(dst == srcFiles, "distributed import rewrote or lost files")
    // the imported layout still partition-prunes
    big.updatePartitions(spark, "tasks", Seq("j007"),
      _.withColumn("state", org.apache.spark.sql.functions.lit("DONE")))
    assert(big.read(spark, "tasks")
      .filter(org.apache.spark.sql.functions.col("state") === "DONE")
      .collect().map(_.getString(0)).toSeq == Seq("t007"))
  }

  test("import composes with existing commit-log rows; empty source is a no-op") {
    val t2 = CommitLogTableStore(s"$base/log2")
    t2.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("t0", "j0", "NEW", "")), 1),
      Schemas.all("tasks")), "tasks")
    t2.importTable(spark, "tasks", from)
    assert(collectSet(t2, "tasks") ==
      collectSet(from, "tasks") + "t0|j0|NEW|")
    t2.importTable(spark, "aoi", from) // never written over there
    assert(t2.read(spark, "aoi").count() == 0)
  }
}
