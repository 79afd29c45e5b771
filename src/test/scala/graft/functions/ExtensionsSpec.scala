package graft.functions

import graft.geo.{BBox, GeomOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSparkExtensions.register(s)
    s
  }

  private def geomsDf = {
    import spark.implicits._
    // unit squares at (i, i)
    (0 until 20).map { i =>
      val g = GeomOps.polygonFromBBox(BBox(i, i, i + 1, i + 1))
      val b = GeomOps.bbox(g)
      (i, GeomOps.writeWkb(g), (b.xmin, b.ymin, b.xmax, b.ymax))
    }.toDF("id", "geom_wkb", "bbox")
      .withColumn("bbox", col("bbox").cast("struct<xmin:double,ymin:double,xmax:double,ymax:double>"))
  }

  test("SpatialFilterPushdown injects a bbox conjunct under st_intersects") {
    // a real file scan (a LocalRelation would constant-fold the filter away)
    val dir = java.nio.file.Files.createTempDirectory("graft-ext").toString
    geomsDf.write.mode("overwrite").parquet(s"$dir/geoms")
    val df = spark.read.parquet(s"$dir/geoms")
    val probe = GeomOps.writeWkb(GeomOps.polygonFromBBox(BBox(4.5, 4.5, 6.5, 6.5)))
    val q = df.filter(
      SpatialExpressions.st_intersects(col("geom_wkb"), lit(probe)))
    val optimized = q.queryExecution.optimizedPlan
    // the injected prune: bbox.xmin <= 6.5 etc. appears in the filter
    val s = optimized.toString
    assert(s.contains("xmin") && s.contains("6.5"), s)
    // rule is fixpoint-safe: re-applying changes nothing
    assert(SpatialFilterPushdown(optimized).fastEquals(optimized))
    // the conjunct reaches the parquet scan as a pushed (skippable) filter
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("bbox.xmin"), physical)
    // results: squares at 4,5,6 intersect the probe box
    assert(q.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(4, 5, 6))
  }

  test("rule does NOT rewrite predicates under NOT / OR or over non-companion geometry") {
    import SpatialExpressions._
    val dir = java.nio.file.Files.createTempDirectory("graft-ext2").toString
    geomsDf.write.mode("overwrite").parquet(s"$dir/geoms")
    val df = spark.read.parquet(s"$dir/geoms")
    val boxA = GeomOps.writeWkb(GeomOps.polygonFromBBox(BBox(0.5, 0.5, 1.5, 1.5)))   // hits 0,1
    val boxB = GeomOps.writeWkb(GeomOps.polygonFromBBox(BBox(10.5, 10.5, 11.5, 11.5))) // hits 10,11

    // NOT st_intersects: complement must survive (everything except 0,1)
    val notQ = df.filter(!st_intersects(col("geom_wkb"), lit(boxA)))
    assert(notQ.select("id").collect().map(_.getInt(0)).sorted.toSeq == ((2 until 20): Seq[Int]))
    assert(!notQ.queryExecution.optimizedPlan.toString.contains(".xmin <="))

    // OR of two literal probes: both sides' matches must survive
    val orQ = df.filter(st_intersects(col("geom_wkb"), lit(boxA)) ||
      st_intersects(col("geom_wkb"), lit(boxB)))
    assert(orQ.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 10, 11))
    assert(!orQ.queryExecution.optimizedPlan.toString.contains(".xmin <="))

    // geometry argument is a computed expression (st_transform): the stored
    // bbox is in the wrong CRS for it — no conjunct may be added
    val reproj = st_transform(col("geom_wkb"), lit("EPSG:4326"), lit("EPSG:3857"))
    val probeM = GeomOps.writeWkb(GeomOps.polygonFromBBox(
      BBox(0, 0, 250000, 250000))) // ~ first two squares in WebMercator metres
    val trQ = df.filter(st_intersects(reproj, lit(probeM)))
    assert(!trQ.queryExecution.optimizedPlan.toString.contains(".xmin <="))
    assert(trQ.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2))

    // AND of a companion conjunct with an OR: only the top-level conjunct
    // contributes its bbox, and results stay correct
    val mixQ = df.filter(st_intersects(col("geom_wkb"), lit(boxA)) &&
      (col("id") < lit(1) || col("id") > lit(0)))
    assert(mixQ.queryExecution.optimizedPlan.toString.contains(".xmin <="))
    assert(mixQ.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1))
  }

  test("post-join filter binds the bbox of the geometry's OWN relation") {
    import spark.implicits._
    import SpatialExpressions._
    val dir = java.nio.file.Files.createTempDirectory("graft-ext3").toString
    // left: unit squares at (i,i) — geom_wkb + ITS bbox
    geomsDf.write.mode("overwrite").parquet(s"$dir/left")
    // right: unit squares at (i+100, i+100) — coordinates_wkb + ITS bbox
    (0 until 20).map { i =>
      val g = GeomOps.polygonFromBBox(BBox(i + 100, i + 100, i + 101, i + 101))
      val b = GeomOps.bbox(g)
      (i, GeomOps.writeWkb(g), (b.xmin, b.ymin, b.xmax, b.ymax))
    }.toDF("id", "coordinates_wkb", "bbox")
      .withColumn("bbox",
        col("bbox").cast("struct<xmin:double,ymin:double,xmax:double,ymax:double>"))
      .write.mode("overwrite").parquet(s"$dir/right")
    val l = spark.read.parquet(s"$dir/left")
    val r = spark.read.parquet(s"$dir/right")
    // probe hits the RIGHT table's square at (105,105) only; the LEFT
    // row's bbox (5,5,6,6) does NOT overlap it — a rule that binds the
    // first same-named bbox in the joined output would AND the LEFT box
    // onto the filter and silently drop the matching row
    val probe = GeomOps.writeWkb(GeomOps.polygonFromBBox(
      BBox(105.2, 105.2, 105.8, 105.8)))
    val q = l.join(r, Seq("id"))
      .filter(st_intersects(r("coordinates_wkb"), lit(probe)))
    assert(q.select("id").collect().map(_.getInt(0)).toSeq == Seq(5))
    // and the conjunct still exists (over the right relation's bbox)
    assert(q.queryExecution.optimizedPlan.toString.contains(".xmin <="))
  }

  test("rule leaves filters without a bbox companion untouched") {
    val probe = GeomOps.writeWkb(GeomOps.polygonFromBBox(BBox(0, 0, 3, 3)))
    val q = geomsDf.drop("bbox").filter(
      SpatialExpressions.st_intersects(col("geom_wkb"), lit(probe)))
    assert(q.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("SQL functions registered on a live session") {
    geomsDf.createOrReplaceTempView("geoms")
    val probeHex = GeomOps.writeWkb(GeomOps.polygonFromBBox(BBox(1.5, 1.5, 2.5, 2.5)))
      .map("%02x".format(_)).mkString
    val rows = spark.sql(
      s"""SELECT id, st_area(geom_wkb) AS a, geom_hash(geom_wkb) AS h
          FROM geoms WHERE st_intersects(geom_wkb, unhex('$probeHex'))
          ORDER BY id""").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(rows.forall(_.getDouble(1) == 1.0))
    assert(rows.forall(_.getString(2).length == 40))
    // interior-intersects is strict: touching-only neighbors drop out
    val touch = GeomOps.writeWkb(GeomOps.polygonFromBBox(BBox(2, 2, 3, 3)))
      .map("%02x".format(_)).mkString
    val strict = spark.sql(
      s"""SELECT id FROM geoms
          WHERE st_interior_intersects(geom_wkb, unhex('$touch')) ORDER BY id""").collect()
    assert(strict.map(_.getInt(0)).toSeq == Seq(2)) // 1 and 3 only touch corners
  }

  test("st_transform expression reprojects WKB through the CRS registry") {
    import SpatialExpressions._
    import spark.implicits._
    val df = Seq(1).toDF("id").withColumn("g",
      st_make_box(lit(0.0), lit(0.0), lit(1.0), lit(1.0)))
    val out = df.select(
        st_transform(col("g"), lit("EPSG:4326"), lit("EPSG:3857")).as("m"))
      .collect().head.getAs[Array[Byte]]("m")
    val g = GeomOps.readWkb(out)
    val env = g.getEnvelopeInternal
    // 1° at the equator ≈ 111319.49 m in WebMercator
    assert(math.abs(env.getMaxX - 111319.4907932736) < 1e-3)
    assert(env.getMinX == 0.0 && math.abs(env.getMinY) < 1e-6)
    // round trip back to degrees
    val back = GeomOps.readWkb(
      df.select(st_transform(
        st_transform(col("g"), lit("EPSG:4326"), lit("EPSG:32631")),
        lit("EPSG:32631"), lit("EPSG:4326")).as("b"))
        .collect().head.getAs[Array[Byte]]("b"))
    val be = back.getEnvelopeInternal
    assert(math.abs(be.getMaxX - 1.0) < 1e-7 && math.abs(be.getMaxY - 1.0) < 1e-7)
    // registered as a SQL function too
    geomsDf.createOrReplaceTempView("geoms2")
    val n = spark.sql(
      """SELECT count(*) FROM geoms2
         WHERE st_area(st_transform(geom_wkb, 'EPSG:4326', 'EPSG:3857')) > 0""")
      .collect().head.getLong(0)
    assert(n == 20)
  }

  test("vector expressions callable from SQL") {
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                vec_dist2(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS q,
                sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS i""")
      .collect().head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 8.0 && r.getInt(2) == 2)
  }
}
