package graft.queries

import org.apache.spark.sql.SparkSession

/** Optimization-round deliverable helper: dump `.explain("formatted")` for
  * a list of declared queries into plans/<round>/<query>_<tag>.txt so plan
  * claims in OPTIMIZATION_r*.md are reviewable without running Spark.
  *
  *   sbt "Test/runMain graft.queries.PlanDumpMain /root/testdata/sf0.01 plans/r15 before q1,q2,..."
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r15")
    val tag = args.lift(2).getOrElse("after")
    val names = args.lift(3).map(_.split(",").toSeq).getOrElse(Seq.empty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$tag.txt")
      graft.operators.OperatorCaches.unpersistAll()
    }
    spark.stop()
  }
}
