package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup (~10 s of JIT otherwise lands on the first timed
    // query): exercise codegen, shuffle, broadcast and higher-order-array
    // machinery once before timing.
    locally {
      import org.apache.spark.sql.functions._
      val w = spark.range(100000).selectExpr(
        "id",
        "substring(md5(string(id)), 1, 1) as b",
        "filter(split(md5(string(id)), 'a'), x -> x != '') as toks",
        """concat('{"k": ', string(id % 100), '}') as js""")
      // codegen + shuffle + broadcast join
      w.groupBy("b").agg(count(lit(1)).as("n"))
        .join(broadcast(spark.range(16).selectExpr("lower(hex(id)) as b2")),
          expr("b = b2"), "left_outer").count()
      // higher-order array ops through a self-join (LSH shape)
      val t = w.select(col("b"), col("toks")).limit(20000)
      t.as("a").join(t.as("b"), "b")
        .select(size(array_intersect(col("a.toks"), col("b.toks"))).as("i"))
        .agg(sum("i")).count()
      // JSON path + window + timestamp machinery
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("ts"))
      w.select(get_json_object(col("js"), "$.k").cast("long").as("k"),
          timestamp_micros(col("id")).as("ts"), col("id"))
        .withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1).count()
    }
    // two passes, report per-query best: pass 1 absorbs residual C2-JIT
    // compilation of generated code paths the warmup can't reach; the
    // cache is cleared between passes so pass 2 still pays real data
    // reads (steady-state timing, not cached-result timing). Between
    // queries the LSH operators' registered signature caches are released
    // so one query's cached relations can't squat executor memory for the
    // rest of the run (the round-2 p3/a5 regression suspect).
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def onePass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          failed += name; false
        }
      graft.operators.OperatorCaches.unpersistAll()
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN)
    }
    val pass1 = onePass()
    spark.catalog.clearCache()
    val pass2 = onePass()
    // a query that failed in either pass reports -1, never an elapsed time
    // (a broken query must not read as a suspiciously fast green bar)
    val results = pass1.map { case (k, v) =>
      k -> (if (failed(k)) -1.0 else math.min(v, pass2(k)))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$failedJson}""")
    spark.stop()
  }
}
