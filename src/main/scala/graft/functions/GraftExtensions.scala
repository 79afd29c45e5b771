package graft.functions

import graft.geo.GeomOps
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, DoubleType, StructType}

/** Catalyst integration (SURVEY §4 "custom Catalyst work", item a):
  *
  * [[SpatialFilterPushdown]] — an optimizer rule that gives every
  * `st_intersects`/`st_interior_intersects` filter against a literal
  * geometry a codegen'd bbox conjunct over the relation's `bbox` struct
  * companion (the catalog convention, [[graft.catalog.Schemas.bbox]]).
  * The conjunct is what Parquet min/max skipping and whole-stage codegen
  * can chew on — the JTS predicate then only runs on surviving rows. The
  * engine's own query builders emit the pair explicitly; this rule closes
  * the gap for ad-hoc DataFrame/SQL users, reproducing the reference's
  * coarse `&&` + fine `ST_Relate` structure (pg_containers.go:302-311)
  * no matter how the query is written.
  *
  * [[GraftSparkExtensions]] — `SparkSessionExtensions` entry point: inject
  * via `.config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")`,
  * which also registers the engine expressions as SQL functions
  * (`st_intersects`, `st_interior_intersects`, `st_intersection`,
  * `st_area`, `geom_hash`, `st_make_box`, `st_transform`,
  * `sorted_intersect_size`, `vec_dot`, `vec_dist2`).
  */
object SpatialFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** Catalog convention ([[graft.catalog.Schemas]]): the `bbox` struct is the
    * geographic prune companion of exactly these geometry columns (aoi
    * `geom_wkb`, datasets `geog_wkb`, cells `coordinates_wkb`). A predicate
    * over any other expression — `shape_wkb` (native CRS), an
    * `st_transform`'d geometry, a computed column — must NOT gain a bbox
    * conjunct: the box would be in the wrong CRS or simply unrelated. */
  private val companionGeomNames = Set("geom_wkb", "geog_wkb", "coordinates_wkb")

  private def isBBoxStruct(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case s: StructType => s.fieldNames.toSeq == Seq("xmin", "ymin", "xmax", "ymax")
    case _ => false
  }

  /** bbox-overlap conjunct over the struct attribute for a literal bbox. */
  private def conjunct(b: Attribute, bb: graft.geo.BBox): Expression = {
    def f(i: Int, n: String) = GetStructField(b, i, Some(n))
    And(And(LessThanOrEqual(f(0, "xmin"), Literal(bb.xmax, DoubleType)),
        GreaterThanOrEqual(f(2, "xmax"), Literal(bb.xmin, DoubleType))),
      And(LessThanOrEqual(f(1, "ymin"), Literal(bb.ymax, DoubleType)),
        GreaterThanOrEqual(f(3, "ymax"), Literal(bb.ymin, DoubleType))))
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child)
        if child.output.exists(a => a.name == "bbox" && isBBoxStruct(a.dataType)) =>
      // The bbox conjunct must come from the SAME source relation as the
      // predicate's geometry column: after a join, child.output can carry
      // SEVERAL same-named bbox structs, and pairing the geometry with an
      // arbitrary one would AND another relation's box onto the filter —
      // silently dropping rows whose own geometry satisfies the user
      // predicate. Resolve the companion through the LEAF that produced
      // the geometry attribute; renames/computed columns find no leaf and
      // safely gain no conjunct.
      def bboxFor(g: Attribute): Option[Attribute] =
        child.collectLeaves()
          .find(_.output.exists(_.exprId == g.exprId))
          .flatMap(_.output.find(a =>
            a.name == "bbox" && isBBoxStruct(a.dataType)))
          .filter(b => child.outputSet.contains(b)) // pruned → no pushdown
      def isCompanion(e: Expression): Boolean = e match {
        case a: Attribute => companionGeomNames(a.name)
        case _ => false
      }
      // Only TOP-LEVEL conjuncts may contribute: a predicate sitting
      // under Or/Not/CaseWhen is not an implication of the whole filter,
      // so ANDing its bbox onto the filter would silently drop rows
      // (e.g. `NOT st_intersects(g, A)` or `st_intersects(g, A) OR
      // st_intersects(g, B)`).
      val literalGeoms: Seq[(Attribute, Array[Byte])] =
        splitConjunctivePredicates(cond).collect {
          case SpatialExpressions.STIntersects(g: Attribute, Literal(w: Array[Byte], BinaryType)) if isCompanion(g) => (g, w)
          case SpatialExpressions.STIntersects(Literal(w: Array[Byte], BinaryType), g: Attribute) if isCompanion(g) => (g, w)
          case SpatialExpressions.STInteriorIntersects(g: Attribute, Literal(w: Array[Byte], BinaryType)) if isCompanion(g) => (g, w)
          case SpatialExpressions.STInteriorIntersects(Literal(w: Array[Byte], BinaryType), g: Attribute) if isCompanion(g) => (g, w)
        }
      val adds = literalGeoms
        .flatMap { case (g, w) =>
          bboxFor(g).map(b => conjunct(b, GeomOps.bbox(GeomOps.readWkb(w))))
        }
        .filterNot(c => cond.exists(_.semanticEquals(c))) // fixpoint-safe
      if (adds.isEmpty) f
      else Filter(adds.foldLeft(cond)((acc, c) => And(c, acc)), child)
  }
}

class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SpatialFilterPushdown)
    GraftSparkExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
  }
}

object GraftSparkExtensions {
  import SpatialExpressions._

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "st_intersects" -> ((args: Seq[Expression]) => STIntersects(args(0), args(1))),
    "st_interior_intersects" -> ((args: Seq[Expression]) => STInteriorIntersects(args(0), args(1))),
    "st_intersection" -> ((args: Seq[Expression]) => STIntersection(args(0), args(1))),
    "st_area" -> ((args: Seq[Expression]) => STArea(args(0))),
    "geom_hash" -> ((args: Seq[Expression]) => GeomHash(args(0))),
    "st_make_box" -> ((args: Seq[Expression]) => {
      require(args.size == 4, "st_make_box(xmin, ymin, xmax, ymax)")
      STMakeBox(args(0), args(1), args(2), args(3))
    }),
    "st_transform" -> ((args: Seq[Expression]) => {
      require(args.size == 3, "st_transform(wkb, fromCrs, toCrs)")
      STTransform(args(0), args(1), args(2))
    }),
    "st_point" -> ((args: Seq[Expression]) => STPoint(args(0), args(1))),
    "st_x" -> ((args: Seq[Expression]) => STX(args(0))),
    "st_y" -> ((args: Seq[Expression]) => STY(args(0))),
    "sorted_intersect_size" -> ((args: Seq[Expression]) =>
      ArrayExpressions.SortedIntersectSize(args(0), args(1))),
    "vec_dot" -> ((args: Seq[Expression]) =>
      ArrayExpressions.DotProduct(args(0), args(1))),
    "vec_dist2" -> ((args: Seq[Expression]) =>
      ArrayExpressions.SquaredDistance(args(0), args(1))))

  /** Install on a live session (no spark.sql.extensions restart needed):
    * SQL functions via the registry bridge + the bbox rule as an
    * experimental extra optimization. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(
        spark, name, new ExpressionInfo("graft", name), builder)
    }
    if (!spark.experimental.extraOptimizations.contains(SpatialFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpatialFilterPushdown
  }
}
