package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string → non-negative long — a native
  * Catalyst `Expression` with `doGenCode` so it stays inside whole-stage
  * codegen (the preferred extension point over UDFs).
  *
  * This is the scale-path
  * shingle/fingerprint hash for MinHash/SimHash (§ dedup): ~10× cheaper than
  * md5-hex-parse, branch-free, and deterministic across JVMs. The md5-based
  * variants in the oracle-checked queries exist because the DuckDB oracle
  * can't evaluate this expression; production paths should prefer
  * [[GraftFunctions.poly_hash]]. h = (Σ h*31 + byte) mod 1e9+7.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = PolyHash.step(h, bytes(i))
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = graft.functions.PolyHash.step($h, $bytes[$i]);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Prime modulus small enough that h*31+255 never overflows a long. */
  final val Mod: Long = 1000000007L

  /** One hash step; public static for codegen reuse. */
  def step(h: Long, b: Byte): Long =
    (h * 31 + (b & 0xffL)) % Mod
}

/** Column-facing registry of the engine's custom expressions. */
object GraftFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def poly_hash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))

  /** Bounded-heap top-k aggregate ([[TopKAgg]]): the k largest values of
    * `c` (struct = lexicographic order; pack `struct(rank, tiebreaks,
    * payload)`), descending. O(k) state per group, map-side partial. */
  def top_k(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())

  /** Canonical Unicode normalization (NFC/NFD/NFKC/NFKD). */
  def unicode_norm(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(
      UnicodeNorm(ColumnBridge.expression(c), form, stripMarks = false))

  /** Accent stripping: NFD-decompose, drop category-M marks, recompose. */
  def strip_accents(c: Column): Column =
    ColumnBridge.column(
      UnicodeNorm(ColumnBridge.expression(c), "NFC", stripMarks = true))

  /** BPE-encode under a learned merge list ([[Bpe.train]]). */
  def bpe_encode(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(c), merges))

  /** Inverse of [[bpe_encode]]: units → original single-space text. */
  def bpe_decode(c: Column): Column =
    ColumnBridge.column(BpeDecode(ColumnBridge.expression(c)))

  /** SQL registration — the engine's custom expressions usable from
    * `spark.sql` (Q1's arbitrary-SQL surface reaches them too):
    * `poly_hash(s)`, `unicode_norm(s[, form])`, `strip_accents(s)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def arity1(name: String)(build: Expression => Expression)
        : Seq[Expression] => Expression = {
      case Seq(e) => build(e)
      case other => throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${other.size}")
    }
    reg.createOrReplaceTempFunction(
      "poly_hash", arity1("poly_hash")(PolyHash(_)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "unicode_norm", {
        case Seq(e) => UnicodeNorm(e, "NFC", stripMarks = false)
        case Seq(e, f) =>
          // the form must be a STRING LITERAL — eval() on a non-foldable
          // or non-string expression dies opaquely mid-analysis otherwise
          val form = f match {
            case lit if lit.foldable => lit.eval() match {
              case s: org.apache.spark.unsafe.types.UTF8String => s.toString
              case other => throw new IllegalArgumentException(
                s"unicode_norm form must be a string literal, got $other")
            }
            case _ => throw new IllegalArgumentException(
              "unicode_norm form must be a string literal (NFC/NFD/NFKC/NFKD), " +
                "not a column or expression")
          }
          UnicodeNorm(e, form, stripMarks = false)
        case other => throw new IllegalArgumentException(
          s"unicode_norm expects 1 or 2 args, got ${other.size}")
      }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "strip_accents",
      arity1("strip_accents")(UnicodeNorm(_, "NFC", stripMarks = true)),
      "scala_udf")
  }
}
