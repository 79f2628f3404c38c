package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sorted-set intersection — the set-similarity-join verify hot
  * path. The join/aggregate formulation (explode each candidate pair's
  * elements, equi-join, count) shuffles Σ|set| rows per candidate; this
  * computes |A ∩ B| in one primitive merge loop per candidate pair inside
  * whole-stage codegen, with early REJECT as soon as the remaining
  * elements cannot reach the required overlap — the dominant exit on real
  * candidate sets, where most pairs fail verification.
  */
object SetMath {

  /** Intersection size of two SORTED (ascending, nulls last — array_sort
    * order) string arrays, or -1 as soon as the final count provably
    * cannot reach `required`. For any pair whose true intersection is
    * >= required the loop never takes the reject branch and the EXACT
    * count is returned — the early exit only accelerates rejections, it
    * never distorts an accepted pair's overlap. Null elements match
    * nothing (SQL equi-join semantics, matching the join-based verify
    * this replaces); since array_sort puts them last, the merge stops at
    * the first null. */
  def sortedOverlap(a: ArrayData, b: ArrayData, required: Int): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val remaining = math.min(na - i, nb - j)
      if (c + remaining < required) return -1
      if (a.isNullAt(i) || b.isNullAt(j)) return c
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** `sorted_overlap(a, b, required)`: |A ∩ B| of two array_sort'ed string
  * arrays, or -1 once the count provably cannot reach `required` (see
  * [[SetMath.sortedOverlap]]). `required` <= any downstream accept
  * threshold keeps accepted counts exact. */
case class SortedOverlap(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  // contract: first/second are array<string> sorted ascending (array_sort
  // order), third is int — internal verify expression, callers in
  // OverlapJoin construct it correctly by shape

  override def nullSafeEval(a: Any, b: Any, r: Any): Any =
    java.lang.Integer.valueOf(SetMath.sortedOverlap(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      r.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r) =>
      s"${ev.value} = graft.functions.SetMath.sortedOverlap($a, $b, $r);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): SortedOverlap = copy(first = f, second = s, third = t)
}

object OverlapExprFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def sorted_overlap(a: Column, b: Column, required: Column): Column =
    ColumnBridge.column(SortedOverlap(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(required)))
}
