package graft.functions

import graft.geo.GeomOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.functions.{col, struct, lit}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry

/** Spatial predicates/transforms as native Catalyst expressions over WKB
  * binary columns (SURVEY §2.13): the engine's replacement for the PostGIS
  * operators the reference leans on (ST_Intersects / ST_Relate /
  * ST_Intersection / ST_Transform — pg_containers.go:302-311,
  * pg_grids.go:113-151).
  *
  * Evaluation is `nullSafeEval` over WKB (CodegenFallback: the JTS call
  * dominates, codegen of the wrapper wouldn't pay). Every spatial filter
  * in the query builders pairs one of these with a bbox-column pre-filter
  * that IS codegen'd and parquet-prunable — the two-stage structure of the
  * reference's coarse `&&` + fine `ST_Relate` (SURVEY §4).
  */
object SpatialExpressions {

  /** Parse-once cache for a FOLDABLE geometry operand: the serving paths
    * compare every row against one literal request geometry
    * (CatalogQueries' refined predicate: `st_interior_intersects(
    * col("shape_wkb"), lit(requestWkb))`), and re-parsing that constant
    * per row is the dominant waste in the fine stage. The JTS prepared
    * form adds an edge index for the repeated side. Initialized lazily
    * per deserialized expression instance (task-confined), with the
    * envelope + index forced during init so later queries are read-only. */
  private def prepareFoldable(e: Expression):
      Option[org.locationtech.jts.geom.prep.PreparedGeometry] =
    if (!e.foldable) None
    else Option(e.eval(null)).map { b =>
      val g = GeomOps.readWkb(b.asInstanceOf[Array[Byte]])
      g.getEnvelopeInternal // force the lazy envelope inside init
      val p = GeomOps.prepared(g)
      p.intersects(g.getCentroid) // force the lazy edge index inside init
      p
    }

  /** ST_Intersects(wkbA, wkbB). The predicate is symmetric, so EITHER
    * foldable operand may be the prepared one — a literal-on-the-left
    * call (a shape the pushdown rule explicitly matches) must not
    * re-parse its constant per row. */
  case class STIntersects(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    @transient private lazy val prepared = prepareFoldable(right)
      .map((_, false)).orElse(prepareFoldable(left).map((_, true)))
    override def nullSafeEval(a: Any, b: Any): Any = prepared match {
      case Some((p, prepIsLeft)) =>
        p.intersects(GeomOps.readWkb(
          (if (prepIsLeft) b else a).asInstanceOf[Array[Byte]]))
      case None =>
        GeomOps.readWkb(a.asInstanceOf[Array[Byte]])
          .intersects(GeomOps.readWkb(b.asInstanceOf[Array[Byte]]))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Interior-intersects: ST_Relate(a, b, 'T********') — the refined
    * same-SRID predicate (pg_containers.go:308-310). The II cell of the
    * intersection matrix is symmetric, so the cached-literal path may
    * swap operands freely; the prepared indexed `intersects` serves as
    * an exact-negative short-circuit before the full relate. */
  case class STInteriorIntersects(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    @transient private lazy val prepared = prepareFoldable(right)
      .map((_, false)).orElse(prepareFoldable(left).map((_, true)))
    override def nullSafeEval(a: Any, b: Any): Any = prepared match {
      case Some((p, prepIsLeft)) =>
        val g = GeomOps.readWkb(
          (if (prepIsLeft) b else a).asInstanceOf[Array[Byte]])
        p.intersects(g) && GeomOps.interiorIntersects(g, p.getGeometry)
      case None =>
        GeomOps.interiorIntersects(
          GeomOps.readWkb(a.asInstanceOf[Array[Byte]]),
          GeomOps.readWkb(b.asInstanceOf[Array[Byte]]))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** ST_Intersection(wkbA, wkbB) → WKB (empty geometry → null). */
  case class STIntersection(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val g = GeomOps.readWkb(a.asInstanceOf[Array[Byte]])
        .intersection(GeomOps.readWkb(b.asInstanceOf[Array[Byte]]))
      if (g.isEmpty) null else GeomOps.writeWkb(g)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** ST_Area(wkb). */
  case class STArea(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any =
      GeomOps.readWkb(a.asInstanceOf[Array[Byte]]).getArea
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** ST_Transform(wkb, fromCrs, toCrs) → WKB with every coordinate
    * reprojected through the engine CRS registry (F6, the per-cell SRID
    * transform of FindCells, pg_grids.go:118-126; proj.go:287-331). CRS
    * arguments accept anything [[graft.geo.CRS.parse]] does (EPSG/proj4/
    * WKT). */
  case class STTransform(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.size == 3, "st_transform(wkb, fromCrs, toCrs)")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = children.exists(_.nullable)
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) null
      else {
        val from = graft.geo.CRS.parse(vs(1).toString)
        val to = graft.geo.CRS.parse(vs(2).toString)
        val g = GeomOps.readWkb(vs(0).asInstanceOf[Array[Byte]]).copy()
        g.apply(new org.locationtech.jts.geom.CoordinateFilter {
          override def filter(c: org.locationtech.jts.geom.Coordinate): Unit = {
            val (x, y) = graft.geo.CRS.transform(from, to, c.x, c.y)
            c.x = x; c.y = y
          }
        })
        g.geometryChanged()
        GeomOps.writeWkb(g)
      }
    }
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression = copy(children = cs)
  }

  /** ST_MakeBox(xmin, ymin, xmax, ymax) → WKB polygon (the envelope
    * constructor, proj.go:287-316 NewRingFromExtent). */
  case class STMakeBox(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.size == 4, "st_make_box(xmin, ymin, xmax, ymax)")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = children.exists(_.nullable)
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) null
      else {
        val d = vs.map {
          case x: Double => x
          case x: Float => x.toDouble
          case x: Int => x.toDouble
          case x: Long => x.toDouble
          case x => x.asInstanceOf[Number].doubleValue()
        }
        GeomOps.writeWkb(GeomOps.polygonFromBBox(
          graft.geo.BBox(d(0), d(1), d(2), d(3))))
      }
    }
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression = copy(children = cs)
  }

  /** ST_Point(x, y) → WKB point (proj.go's point constructor shape). */
  case class STPoint(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      GeomOps.writeWkb(GeomOps.factory.createPoint(
        new org.locationtech.jts.geom.Coordinate(
          a.asInstanceOf[Number].doubleValue(), b.asInstanceOf[Number].doubleValue())))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** ST_X(wkb) — x of the first coordinate. */
  case class STX(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any =
      GeomOps.readWkb(a.asInstanceOf[Array[Byte]]).getCoordinate.x
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** ST_Y(wkb) — y of the first coordinate. */
  case class STY(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any =
      GeomOps.readWkb(a.asInstanceOf[Array[Byte]]).getCoordinate.y
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Geometry SHA-1 hash (record.go:33-46) as hex string. */
  case class GeomHash(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(a: Any): Any =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        GeomOps.geometryHash(GeomOps.readWkb(a.asInstanceOf[Array[Byte]])))
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // Column wrappers (Spark 4: Column ↔ Expression via the classic bridge)
  import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
  def st_intersects(a: Column, b: Column): Column = toCol(STIntersects(toExpr(a), toExpr(b)))
  def st_interior_intersects(a: Column, b: Column): Column =
    toCol(STInteriorIntersects(toExpr(a), toExpr(b)))
  def st_intersection(a: Column, b: Column): Column = toCol(STIntersection(toExpr(a), toExpr(b)))
  def st_area(a: Column): Column = toCol(STArea(toExpr(a)))
  def geom_hash(a: Column): Column = toCol(GeomHash(toExpr(a)))
  def st_make_box(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    toCol(STMakeBox(Seq(toExpr(xmin), toExpr(ymin), toExpr(xmax), toExpr(ymax))))
  def st_transform(wkb: Column, fromCrs: Column, toCrs: Column): Column =
    toCol(STTransform(Seq(toExpr(wkb), toExpr(fromCrs), toExpr(toCrs))))
  def st_point(x: Column, y: Column): Column = toCol(STPoint(toExpr(x), toExpr(y)))
  def st_x(wkb: Column): Column = toCol(STX(toExpr(wkb)))
  def st_y(wkb: Column): Column = toCol(STY(toExpr(wkb)))

  /** bbox-overlap pre-filter over the struct companion column — codegen'd,
    * parquet-min/max-prunable (the GIST-index substitute, SURVEY §4). */
  def bboxIntersects(bboxCol: Column, b: graft.geo.BBox): Column =
    bboxCol.getField("xmin") <= lit(b.xmax) &&
      bboxCol.getField("xmax") >= lit(b.xmin) &&
      bboxCol.getField("ymin") <= lit(b.ymax) &&
      bboxCol.getField("ymax") >= lit(b.ymin)

  /** bbox struct literal from a geometry. */
  def bboxStruct(g: Geometry): Column = {
    val b = GeomOps.bbox(g)
    struct(lit(b.xmin).as("xmin"), lit(b.ymin).as("ymin"),
      lit(b.xmax).as("xmax"), lit(b.ymax).as("ymax"))
  }
}
