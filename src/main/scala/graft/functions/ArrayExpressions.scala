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

  /** |a ∩ b| for SORTED DISTINCT string arrays, by merge-count. */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression {
    // AbstractDataType (ExpectsInputTypes) is private[sql]; inputs are
    // array<string> by construction at every call site
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

  import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
  def sorted_intersect_size(a: Column, b: Column): Column =
    toCol(SortedIntersectSize(toExpr(a), toExpr(b)))
}
