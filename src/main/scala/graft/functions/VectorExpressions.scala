package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math expressions — the ANN/dedup hot path. The
  * `aggregate`/`zip_with` compositions in [[VectorFunctions]] are
  * higher-order functions and therefore interpreted: exact top-k evaluates
  * an interpreted fold per (query, corpus) PAIR. These expressions compute
  * the same sequential left-to-right double accumulation (bit-parity with
  * the lambda forms and with DuckDB's `list_dot_product`) in primitive
  * loops inside whole-stage codegen.
  *
  * Null/length parity with the lambda forms: any null element, or a length
  * mismatch (zip_with pads with nulls), nulls the whole result; an empty
  * pair yields 0.0.
  */
object VectorMath {
  /** Read element d as double regardless of float/double storage. */
  private def elem(a: ArrayData, d: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)

  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var d = 0
    while (d < n) {
      if (a.isNullAt(d) || b.isNullAt(d)) return null
      acc += elem(a, d, aF) * elem(b, d, bF)
      d += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def l2sq(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var d = 0
    while (d < n) {
      if (a.isNullAt(d) || b.isNullAt(d)) return null
      val diff = elem(a, d, aF) - elem(b, d, bF)
      acc += diff * diff
      d += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Sign-projection LSH bucket: bit p set iff Σ_d vec[d]·coef(p,d) > 0
    * with coef(p,d) = ((31p+d)·2654435761 mod 2³¹)/2³¹ − 0.5 — identical
    * arithmetic (and accumulation order) to the declarative form and its
    * SQL oracle. A null element nulls a plane's dot → bit stays 0. */
  def signLsh(vec: ArrayData, planes: Int, isFloat: Boolean): Long = {
    val n = vec.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var sawNull = false
      var d = 0
      while (d < n && !sawNull) {
        if (vec.isNullAt(d)) sawNull = true
        else {
          val c = ((31L * p + d) * 2654435761L % 2147483648L).toDouble /
            2147483648.0 - 0.5
          acc += elem(vec, d, isFloat) * c
        }
        d += 1
      }
      if (!sawNull && acc > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** PQ asymmetric-distance fold: Σ_s dtab(s)(code(s)) — the native form of
    * `aggregate(zip_with(code, dtab, (cd, row) => element_at(row, cd + 1)),
    * 0.0, (acc, x) => acc + x)`, which is interpreted lambda evaluation per
    * CANDIDATE pair in the ADC scan. Identical left-to-right double
    * accumulation; identical null semantics: a length mismatch between code
    * and dtab, a null element on either side, or an out-of-range code nulls
    * the whole sum (codes are in-range by construction — encode() emits
    * codebook positions — so the out-of-range branch is unreachable in
    * practice); two empty arrays fold to 0.0 (the aggregate's init). */
  def pqAdc(code: ArrayData, dtab: ArrayData, codeLong: Boolean): Any = {
    val n = code.numElements()
    val m = dtab.numElements()
    if (n != m) return null
    var acc = 0.0
    var s = 0
    while (s < n) {
      if (code.isNullAt(s) || dtab.isNullAt(s)) return null
      val cd = if (codeLong) code.getLong(s).toInt else code.getInt(s)
      val row = dtab.getArray(s)
      if (cd < 0 || cd >= row.numElements() || row.isNullAt(cd)) return null
      acc += row.getDouble(cd)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** Nearest-cell argmin over a (cent, cv) array — the per-ROW form of the
    * `broadcast-join × k centroids → min_by(struct(cent..), struct(d2, cent))`
    * (equivalently `row_number over (d2, cent) = 1`) assignment aggregate:
    * with `cents` sorted by cent ascending, scanning in array order and
    * keeping only a STRICTLY smaller d2 is exactly the min over the
    * (d2, cent) total order — identical winner, identical tie-break,
    * identical [[l2sq]] arithmetic per candidate — with no join, no
    * shuffle and no aggregate. A cell whose d2 is null (dimension
    * mismatch / null element — unreachable for fixed-dim corpora) can
    * never win, matching an ordering key that only compares non-null
    * candidates; all-null (or empty cents) returns null.
    * Returns (cent, d2, cv-of-winner). */
  def nearestCell(vec: ArrayData, cents: ArrayData, vF: Boolean,
      cvF: Boolean, centLong: Boolean): Any = {
    val k = cents.numElements()
    var best = -1
    var bestD2 = 0.0
    var i = 0
    while (i < k) {
      if (!cents.isNullAt(i)) {
        val c = cents.getStruct(i, 2)
        // a null cent id must be skipped like a null cv: reading the id
        // slot of a null-cent winner would fabricate cell id 0 instead of
        // mirroring the old min_by/window null ordering (ADVICE r15)
        if (!c.isNullAt(0) && !c.isNullAt(1)) {
          val d2 = l2sq(vec, c.getArray(1), vF, cvF)
          if (d2 != null) {
            val d = d2.asInstanceOf[java.lang.Double].doubleValue()
            if (best < 0 || d < bestD2) { best = i; bestD2 = d }
          }
        }
      }
      i += 1
    }
    if (best < 0) return null
    val w = cents.getStruct(best, 2)
    val centVal: Any =
      if (centLong) java.lang.Long.valueOf(w.getLong(0))
      else java.lang.Integer.valueOf(w.getInt(0))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](centVal, java.lang.Double.valueOf(bestD2), w.getArray(1)))
  }

  /** The `nprobe` nearest cells by the same (d2, cent) total order —
    * the per-ROW form of `row_number over (d2, cent) <= nprobe` (and of
    * the bounded-heap `top_k` over negated (d2, cent)): output ascending
    * by (d2, cent), so position p is exactly the rank-(p+1) probe. Same
    * skip-null doctrine as [[nearestCell]]; returns null only for a null
    * input row. Returns array<struct(cent, cv)>. */
  def probeCells(vec: ArrayData, cents: ArrayData, nprobe: Int, vF: Boolean,
      cvF: Boolean, centLong: Boolean): Any = {
    val k = cents.numElements()
    val cap = math.min(nprobe, k)
    if (cap <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](0))
    val d2s = new Array[Double](cap)
    val idx = new Array[Int](cap)
    var n = 0
    var i = 0
    while (i < k) {
      if (!cents.isNullAt(i)) {
        val c = cents.getStruct(i, 2)
        // null cent id skipped like a null cv — see [[nearestCell]]
        if (!c.isNullAt(0) && !c.isNullAt(1)) {
          val d2 = l2sq(vec, c.getArray(1), vF, cvF)
          if (d2 != null) {
            val d = d2.asInstanceOf[java.lang.Double].doubleValue()
            // insertion into the sorted bounded buffer: strictly-less moves
            // ahead, equal keeps earlier (lower cent — array is cent-sorted)
            if (n < cap || d < d2s(n - 1)) {
              var p = if (n < cap) n else n - 1
              while (p > 0 && d < d2s(p - 1)) {
                d2s(p) = d2s(p - 1); idx(p) = idx(p - 1); p -= 1
              }
              d2s(p) = d; idx(p) = i
              if (n < cap) n += 1
            }
          }
        }
      }
      i += 1
    }
    val out = new Array[Any](n)
    var p = 0
    while (p < n) {
      val w = cents.getStruct(idx(p), 2)
      val centVal: Any =
        if (centLong) java.lang.Long.valueOf(w.getLong(0))
        else java.lang.Integer.valueOf(w.getInt(0))
      out(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](centVal, w.getArray(1)))
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** (centType isLong, cv ArrayType, cv isFloat) of an
    * array<struct<cent, cv>> cells column. */
  def centsMeta(t: DataType): (Boolean, DataType, Boolean) = t match {
    case ArrayType(StructType(fields), _) if fields.length == 2 =>
      val centLong = fields(0).dataType match {
        case LongType => true
        case IntegerType => false
        case other => throw new IllegalArgumentException(
          s"cent field must be int/long, got $other")
      }
      (centLong, fields(1).dataType, isFloatArray(fields(1).dataType))
    case other => throw new IllegalArgumentException(
      s"cells column must be array<struct<cent, cv>>, got $other")
  }
}

case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // result can be null even for non-null inputs (length mismatch / null
  // element) — keeps ev.isNull a real variable in codegen
  override def nullable: Boolean = true
  private lazy val lF = VectorMath.isFloatArray(left.dataType)
  private lazy val rF = VectorMath.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lF, rF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.VectorMath.dot($a, $b, $lF, $rF);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $boxed).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  private lazy val lF = VectorMath.isFloatArray(left.dataType)
  private lazy val rF = VectorMath.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lF, rF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.VectorMath.l2sq($a, $b, $lF, $rF);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $boxed).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
    copy(left = l, right = r)
}

/** See [[VectorMath.pqAdc]]: Σ_s dtab(s)(code(s)) in one codegen'd primitive
  * loop — the ADC scan's per-candidate hot path. */
case class PqAdcSum(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  private lazy val codeLong = VectorMath.isLongArray(left.dataType)

  override def nullSafeEval(code: Any, dtab: Any): Any =
    VectorMath.pqAdc(code.asInstanceOf[ArrayData],
      dtab.asInstanceOf[ArrayData], codeLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, d) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.VectorMath.pqAdc($c, $d, $codeLong);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $boxed).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcSum =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}

/** See [[VectorMath.nearestCell]]: per-row nearest-cell argmin over a
  * cent-ascending (cent, cv) cells array — replaces the broadcast-join +
  * argmin-aggregate (or argmin-window) assignment shape with pure
  * projection work: no join, no exchange. Output struct(cent, d2, cv). */
case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val meta = VectorMath.centsMeta(right.dataType)
  override def dataType: DataType = StructType(Seq(
    StructField("cent", if (meta._1) LongType else IntegerType),
    StructField("d2", DoubleType),
    StructField("cv", meta._2)))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  private lazy val vF = VectorMath.isFloatArray(left.dataType)

  override def nullSafeEval(vec: Any, cents: Any): Any =
    VectorMath.nearestCell(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], vF, meta._3, meta._1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.VectorMath.nearestCell(
         |  $v, $c, $vF, ${meta._3}, ${meta._1});
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (InternalRow) $boxed; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCell =
    copy(left = l, right = r)
  override def prettyName: String = "nearest_cell"
}

/** See [[VectorMath.probeCells]]: the nprobe nearest cells per row,
  * ascending (d2, cent) — replaces the top_k-aggregate / rank-window probe
  * derivation. Output array<struct(cent, cv)>. */
case class ProbeCellsExpr(left: Expression, right: Expression, nprobe: Int)
    extends BinaryExpression {
  private lazy val meta = VectorMath.centsMeta(right.dataType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cent", if (meta._1) LongType else IntegerType),
    StructField("cv", meta._2))))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  private lazy val vF = VectorMath.isFloatArray(left.dataType)

  override def nullSafeEval(vec: Any, cents: Any): Any =
    VectorMath.probeCells(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], nprobe, vF, meta._3, meta._1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.VectorMath.probeCells(
         |  $v, $c, $nprobe, $vF, ${meta._3}, ${meta._1});
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $boxed; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ProbeCellsExpr =
    copy(left = l, right = r)
  override def prettyName: String = "probe_cells"
}

case class SignLshBucket(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  private lazy val isF = VectorMath.isFloatArray(child.dataType)

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      VectorMath.signLsh(input.asInstanceOf[ArrayData], planes, isF))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorMath.signLsh($c, $planes, $isF);")

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}

object VectorExprFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vec_l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(VecL2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sign_lsh_bucket(vec: Column, planes: Int): Column =
    ColumnBridge.column(SignLshBucket(ColumnBridge.expression(vec), planes))

  def pq_adc(code: Column, dtab: Column): Column =
    ColumnBridge.column(PqAdcSum(ColumnBridge.expression(code),
      ColumnBridge.expression(dtab)))

  def nearest_cell(vec: Column, cents: Column): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(vec),
      ColumnBridge.expression(cents)))

  def probe_cells(vec: Column, cents: Column, nprobe: Int): Column =
    ColumnBridge.column(ProbeCellsExpr(ColumnBridge.expression(vec),
      ColumnBridge.expression(cents), nprobe))
}
