package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sketch expressions for the dedup hot path. The declarative
  * versions ([[graft.dedup.TextDedup]]'s original `transform`/`aggregate`
  * compositions) are higher-order functions, which Spark evaluates
  * INTERPRETED — a 16-permutation minhash walks the hash array 16 times
  * through boxed lambda calls, and a 32-bit simhash evaluates 32 separate
  * aggregate folds per row. These expressions compute the same values in
  * ONE pass of tight primitive loops and stay inside whole-stage codegen
  * (`doGenCode` emits a static call into [[Sketches]]).
  *
  * Bit-parity with the declarative forms (and therefore with the DuckDB
  * oracle) is exact for the engine's own hashes, including null edge
  * cases: a null element behaves like the lambda chain did (skipped by
  * `array_min`; bit-0 contribution -1 in simhash), and an empty input
  * yields all-null minhash entries and simhash 0. One DELIBERATE
  * divergence: for a NEGATIVE input hash the old `shiftright(h,j) % 2 = 1`
  * test never fired (SQL remainder of a negative is negative), treating
  * every bit as 0 — [[Sketches.simhash32]] tests the real bit instead.
  * Engine hash functions (md5Int, poly_hash) are non-negative by
  * construction, so the oracle paths are unaffected; user-supplied signed
  * hashes (e.g. xxhash64) now get correct bit treatment.
  */
object Sketches {
  final val Mod: Long = 1000000007L

  /** minhash_i = min over non-null h of (h·(2i+1) + (7i+13)) mod p. */
  def minhashSig(arr: ArrayData, numPerm: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](numPerm)
    var i = 0
    while (i < numPerm) {
      val a = 2L * i + 1
      val b = 7L * i + 13
      var min = Long.MaxValue
      var found = false
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val v = (arr.getLong(j) * a + b) % Mod
          if (v < min) min = v
          found = true
        }
        j += 1
      }
      out(i) = if (found) java.lang.Long.valueOf(min) else null
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit simhash: bit j set iff Σ (bit j of h ? +1 : -1) > 0; null
    * elements contribute -1 (the `when` otherwise-branch the lambda form
    * took on null). */
  def simhash32(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Long](32)
    var j = 0
    while (j < n) {
      val h = if (arr.isNullAt(j)) 0L else arr.getLong(j)
      var bit = 0
      while (bit < 32) {
        counts(bit) += (if (((h >> bit) & 1L) == 1L) 1L else -1L)
        bit += 1
      }
      j += 1
    }
    var result = 0L
    var bit = 0
    while (bit < 32) {
      if (counts(bit) > 0) result |= (1L << bit)
      bit += 1
    }
    result
  }
}

/** MinHash signature over a pre-staged array<long> of element hashes. */
case class MinHashSig(child: Expression, numPerm: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Sketches.minhashSig(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.minhashSig($c, $numPerm);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 32-bit SimHash over a pre-staged array<long> of element hashes. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Sketches.simhash32(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SketchFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def min_hash_sig(hashes: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), numPerm))

  def sim_hash(hashes: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(hashes)))
}
