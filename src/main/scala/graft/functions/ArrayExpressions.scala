package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Array expressions for the dedup hot path.
  *
  * The LSH confirm step computes one Jaccard per candidate pair, and
  * `size(array_intersect(a, b))` is its inner loop: Spark's
  * `array_intersect` builds a hash set AND materializes the intersection
  * array per row, only for `size` to throw the elements away. The token
  * relations the dedup operators build are `array_sort(array_distinct(…))`,
  * so the count is a straight sorted-merge — no allocation, fully
  * codegen'd. At 100 TB this is the innermost loop of the whole dedup
  * pipeline.
  */
object ArrayExpressions {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  /** ExpectsInputTypes is private[sql], but `checkInputDataTypes()` is a
    * public Expression override — these functions are REGISTERED AS SQL
    * functions, and without the check `array<int>` input would be read
    * through `getDouble` on 4-byte-packed elements: silently wrong
    * scores, not an analysis error. */
  private def checkArrays(name: String, want: String,
      elemOk: DataType => Boolean, l: Expression, r: Expression): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(et, _) => elemOk(et)
      case _ => false
    }
    if (ok(l.dataType) && ok(r.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<$want> inputs, got " +
        s"${l.dataType.simpleString} and ${r.dataType.simpleString}")
  }

  /** |a ∩ b| for SORTED DISTINCT string arrays, by merge-count. */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrays("sorted_intersect_size", "string",
        _ == StringType, left, right)
    override def dataType: DataType = IntegerType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val na = x.numElements(); val nb = y.numElements()
      var i = 0; var j = 0; var n = 0
      while (i < na && j < nb) {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      n
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val n = ctx.freshName("n"); val c = ctx.freshName("c")
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        s"""
         |int $i = 0, $j = 0, $n = 0;
         |final int $na = $a.numElements(), $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  final int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $n;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Σ aᵢ·bᵢ over EQUAL-LENGTH numeric arrays with NON-NULL elements
    * (float or double), accumulating LEFT-TO-RIGHT in double — the exact
    * addition order of
    * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)`, so
    * for such inputs results are bit-identical to the higher-order-function
    * form (and to the DuckDB oracle's list_aggregate sum) while skipping
    * the two intermediate arrays that form allocates per row. Length
    * mismatch throws (the HOF form would silently yield null — a dimension
    * mismatch in an embedding pipeline is a bug, not a score); null
    * elements are the caller's contract, as with every vector column the
    * engine builds. The ANN/near-dup scoring steps call this once per
    * candidate pair. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrays("vec_dot", "float|double",
        dt => dt == FloatType || dt == DoubleType, left, right)
    override def dataType: DataType = DoubleType
    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements())
        throw new IllegalArgumentException(
          s"vec_dot: length mismatch $n vs ${y.numElements()}")
      val lf = isFloat(left); val rf = isFloat(right)
      var acc = 0.0; var i = 0
      while (i < n) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
      acc
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Σ (aᵢ−bᵢ)² — squared L2, same loop/fold-order/equal-length contract
    * as [[DotProduct]]. The IVF assignment computes one per (vector,
    * centroid). */
  case class SquaredDistance(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrays("vec_dist2", "float|double",
        dt => dt == FloatType || dt == DoubleType, left, right)
    override def dataType: DataType = DoubleType
    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements())
        throw new IllegalArgumentException(
          s"vec_dist2: length mismatch $n vs ${y.numElements()}")
      val lf = isFloat(left); val rf = isFloat(right)
      var acc = 0.0; var i = 0
      while (i < n) {
        val d = (if (lf) x.getFloat(i).toDouble else x.getDouble(i)) -
          (if (rf) y.getFloat(i).toDouble else y.getDouble(i))
        acc += d * d
        i += 1
      }
      acc
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
        val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dist2: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = $getA - $getB;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
  def sorted_intersect_size(a: Column, b: Column): Column =
    toCol(SortedIntersectSize(toExpr(a), toExpr(b)))
  def vec_dot(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))
  def vec_dist2(a: Column, b: Column): Column =
    toCol(SquaredDistance(toExpr(a), toExpr(b)))
}
