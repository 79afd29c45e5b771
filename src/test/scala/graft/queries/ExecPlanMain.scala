package graft.queries

import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic: run a declared query to completion and
  * dump its EXECUTED plan (the final adaptive plan, with whole-stage
  * codegen ids, runtime-reused exchanges and AQE shuffle reads) — the
  * formatted dump of an unexecuted AQE plan shows none of those.
  *
  *   sbt "Test/runMain graft.queries.ExecPlanMain /root/testdata/sf0.1 plans/r16 exec dedup_lsh_pairs,..."
  */
object ExecPlanMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r16")
    val tag = args.lift(2).getOrElse("exec")
    val names = args.lift(3).map(_.split(",").toSeq).getOrElse(Seq.empty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // execute THIS QueryExecution's adaptive plan (a noop write or a
      // count() would spawn a separate execution and leave this one's
      // AdaptiveSparkPlan unfinalized)
      val qe = df.queryExecution
      qe.executedPlan.execute().foreach(_ => ())
      val plan = qe.executedPlan.toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$tag.txt " +
        s"(ReusedExchange=${plan.sliding("ReusedExchange".length).count(_ == "ReusedExchange")}, " +
        s"codegenSpans=${plan.linesIterator.count(_.contains("*("))})")
      graft.operators.OperatorCaches.unpersistAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
