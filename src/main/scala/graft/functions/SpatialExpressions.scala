package graft.functions

import graft.geo.GeomOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.functions.{col, lit, struct}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry

/** Static JTS entry points for generated code: every spatial expression's
  * `doGenCode` emits a call to one of these (or to the expression instance
  * for the prepared-literal predicates), so a plan containing spatial
  * predicates stays inside WHOLE-STAGE CODEGEN. The r14 expressions were
  * `CodegenFallback`, and one fallback expression anywhere in a filter or
  * join condition disables codegen for the WHOLE stage — p5/f7's cell
  * join evaluated its coarse arithmetic interpreted over every cell-join
  * candidate row (guide §4: eliminate non-codegen expressions from the
  * hot path). Methods mirror the interpreted eval paths exactly. */
object SpatialRuntime {
  def intersects(a: Array[Byte], b: Array[Byte]): Boolean =
    GeomOps.readWkb(a).intersects(GeomOps.readWkb(b))
  def interiorIntersects(a: Array[Byte], b: Array[Byte]): Boolean =
    GeomOps.interiorIntersects(GeomOps.readWkb(a), GeomOps.readWkb(b))
  /** Empty intersection → null (SQL NULL, matching the interpreted path).
    * Goes through [[GeomOps.intersection]] for its rect×rect fast path. */
  def intersection(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val g = GeomOps.intersection(GeomOps.readWkb(a), GeomOps.readWkb(b))
    if (g.isEmpty) null else GeomOps.writeWkb(g)
  }
  def area(a: Array[Byte]): Double = GeomOps.readWkb(a).getArea
  def makeBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Byte] =
    GeomOps.writeWkb(GeomOps.polygonFromBBox(graft.geo.BBox(xmin, ymin, xmax, ymax)))
  def point(x: Double, y: Double): Array[Byte] =
    GeomOps.writeWkb(GeomOps.factory.createPoint(
      new org.locationtech.jts.geom.Coordinate(x, y)))
  def x(a: Array[Byte]): Double = GeomOps.readWkb(a).getCoordinate.x
  def y(a: Array[Byte]): Double = GeomOps.readWkb(a).getCoordinate.y
  def geomHash(a: Array[Byte]): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      GeomOps.geometryHash(GeomOps.readWkb(a)))
  def transform(wkb: Array[Byte], fromCrs: String, toCrs: String): Array[Byte] = {
    val from = graft.geo.CRS.parse(fromCrs)
    val to = graft.geo.CRS.parse(toCrs)
    val g = GeomOps.readWkb(wkb).copy()
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

/** Codegen-visible face of the prepared-literal spatial predicates: the
  * generated code types its plan reference as this TOP-LEVEL trait (a
  * nested case-class binary name like `SpatialExpressions$STIntersects`
  * is not a valid Janino source-form type). */
trait WkbPairPredicate {
  def run(a: Array[Byte], b: Array[Byte]): Boolean
}

/** Spatial predicates/transforms as native Catalyst expressions over WKB
  * binary columns (SURVEY §2.13): the engine's replacement for the PostGIS
  * operators the reference leans on (ST_Intersects / ST_Relate /
  * ST_Intersection / ST_Transform — pg_containers.go:302-311,
  * pg_grids.go:113-151).
  *
  * All expressions implement `doGenCode` (since r15): the generated code
  * calls a static [[SpatialRuntime]] method (or the expression instance
  * through [[WkbPairPredicate]] where the prepared-literal cache lives),
  * so the surrounding filter/join stage keeps whole-stage codegen — the
  * JTS call still dominates per evaluated row, but the codegen'd coarse
  * predicates in the same stage no longer drop to interpreted evaluation
  * alongside it (that cost was per candidate row, not per survivor).
  * Every spatial filter in the query builders pairs one of these with a
  * bbox-column pre-filter that is parquet-prunable — the two-stage
  * structure of the reference's coarse `&&` + fine `ST_Relate` (SURVEY §4).
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

  /** Shared codegen for the two prepared-literal predicates: reference the
    * expression instance (it owns the prepared-geometry cache) as a
    * [[WkbPairPredicate]] and call `run` on the two WKB operands. */
  private def pairPredicateGenCode(e: BinaryExpression with WkbPairPredicate,
      ctx: CodegenContext, ev: ExprCode,
      nullSafe: ((String, String) => String) => ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wkbPred", e, classOf[WkbPairPredicate].getName)
    nullSafe((a, b) => s"${ev.value} = $ref.run($a, $b);")
  }

  /** ST_Intersects(wkbA, wkbB). The predicate is symmetric, so EITHER
    * foldable operand may be the prepared one — a literal-on-the-left
    * call (a shape the pushdown rule explicitly matches) must not
    * re-parse its constant per row. */
  case class STIntersects(left: Expression, right: Expression)
      extends BinaryExpression with WkbPairPredicate {
    override def dataType: DataType = BooleanType
    @transient private lazy val prepared = prepareFoldable(right)
      .map((_, false)).orElse(prepareFoldable(left).map((_, true)))
    override def run(a: Array[Byte], b: Array[Byte]): Boolean = prepared match {
      case Some((p, prepIsLeft)) =>
        p.intersects(GeomOps.readWkb(if (prepIsLeft) b else a))
      case None => SpatialRuntime.intersects(a, b)
    }
    override def nullSafeEval(a: Any, b: Any): Any =
      run(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      pairPredicateGenCode(this, ctx, ev, nullSafeCodeGen(ctx, ev, _))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Interior-intersects: ST_Relate(a, b, 'T********') — the refined
    * same-SRID predicate (pg_containers.go:308-310). The II cell of the
    * intersection matrix is symmetric, so the cached-literal path may
    * swap operands freely; the prepared indexed `intersects` serves as
    * an exact-negative short-circuit before the full relate. */
  case class STInteriorIntersects(left: Expression, right: Expression)
      extends BinaryExpression with WkbPairPredicate {
    override def dataType: DataType = BooleanType
    @transient private lazy val prepared = prepareFoldable(right)
      .map((_, false)).orElse(prepareFoldable(left).map((_, true)))
    override def run(a: Array[Byte], b: Array[Byte]): Boolean = prepared match {
      case Some((p, prepIsLeft)) =>
        val g = GeomOps.readWkb(if (prepIsLeft) b else a)
        p.intersects(g) && GeomOps.interiorIntersects(g, p.getGeometry)
      case None => SpatialRuntime.interiorIntersects(a, b)
    }
    override def nullSafeEval(a: Any, b: Any): Any =
      run(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      pairPredicateGenCode(this, ctx, ev, nullSafeCodeGen(ctx, ev, _))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** ST_Intersection(wkbA, wkbB) → WKB (empty geometry → null). */
  case class STIntersection(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true // empty intersection → null
    override def nullSafeEval(a: Any, b: Any): Any =
      SpatialRuntime.intersection(
        a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = graft.functions.SpatialRuntime.intersection($a, $b);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** ST_Area(wkb). */
  case class STArea(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any =
      SpatialRuntime.area(a.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.SpatialRuntime.area($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** ST_Transform(wkb, fromCrs, toCrs) → WKB with every coordinate
    * reprojected through the engine CRS registry (F6, the per-cell SRID
    * transform of FindCells, pg_grids.go:118-126; proj.go:287-331). CRS
    * arguments accept anything [[graft.geo.CRS.parse]] does (EPSG/proj4/
    * WKT). */
  case class STTransform(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(wkb: Any, from: Any, to: Any): Any =
      SpatialRuntime.transform(
        wkb.asInstanceOf[Array[Byte]], from.toString, to.toString)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (w, f, t) =>
        s"graft.functions.SpatialRuntime.transform($w, $f.toString(), $t.toString())")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** ST_MakeBox(xmin, ymin, xmax, ymax) → WKB polygon (the envelope
    * constructor, proj.go:287-316 NewRingFromExtent). */
  case class STMakeBox(first: Expression, second: Expression,
      third: Expression, fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = BinaryType
    private def toD(x: Any): Double = x match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case n => n.asInstanceOf[Number].doubleValue()
    }
    override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
      SpatialRuntime.makeBox(toD(a), toD(b), toD(c), toD(d))
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c, d) =>
        s"graft.functions.SpatialRuntime.makeBox((double)($a), (double)($b), (double)($c), (double)($d))")
    override protected def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  /** ST_Point(x, y) → WKB point (proj.go's point constructor shape). */
  case class STPoint(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      SpatialRuntime.point(
        a.asInstanceOf[Number].doubleValue(), b.asInstanceOf[Number].doubleValue())
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SpatialRuntime.point((double)($a), (double)($b))")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** ST_X(wkb) — x of the first coordinate. */
  case class STX(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any =
      SpatialRuntime.x(a.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.SpatialRuntime.x($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** ST_Y(wkb) — y of the first coordinate. */
  case class STY(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any =
      SpatialRuntime.y(a.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.SpatialRuntime.y($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Geometry SHA-1 hash (record.go:33-46) as hex string. */
  case class GeomHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(a: Any): Any =
      SpatialRuntime.geomHash(a.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.SpatialRuntime.geomHash($a)")
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
  // numeric children are cast to double IN THE BUILDER: STMakeBox/STPoint
  // codegen emits `(double)($a)`, which is valid Java only for primitive
  // numerics — a DecimalType child would fail Janino compilation (whole
  // stage falls back interpreted, and the interpreted Number cast throws
  // on Spark Decimal). The cast is a no-op for already-double inputs
  // (optimizer removes same-type casts), so existing plans are unchanged.
  def st_make_box(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    toCol(STMakeBox(toExpr(xmin.cast("double")), toExpr(ymin.cast("double")),
      toExpr(xmax.cast("double")), toExpr(ymax.cast("double"))))
  def st_transform(wkb: Column, fromCrs: Column, toCrs: Column): Column =
    toCol(STTransform(toExpr(wkb), toExpr(fromCrs), toExpr(toCrs)))
  def st_point(x: Column, y: Column): Column =
    toCol(STPoint(toExpr(x.cast("double")), toExpr(y.cast("double"))))
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
