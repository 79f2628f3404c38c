package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hash expressions — the MinHash-LSH / set-similarity front
  * half ([[graft.dedup.TextDedup]]). The declarative forms they replace are
  * exactly value-equivalent but pay real per-element costs:
  *
  *  - `md5Int` was `conv(substring(md5(c), 1, 8), 16, 10).cast(long)` —
  *    digest → 32-char hex STRING → substring → string base-16 parse →
  *    decimal STRING → long, four allocations and two string walks per
  *    hash; [[Md5IntExpr]] reads the first 4 digest bytes as an unsigned
  *    32-bit big-endian int, the same number by construction.
  *  - `wordShingles` was `array_distinct(transform(sequence(...), i =>
  *    concat_ws(" ", slice(toks, i+1, n))))` — an INTERPRETED lambda per
  *    window, each `slice` materializing a copy of its n-token view;
  *    [[WordShinglesExpr]] emits the same distinct shingles (first-
  *    occurrence order, `concat_ws` null-skip semantics via
  *    `UTF8String.concatWs`) in one primitive pass.
  *  - `shingleHashes` / `bandHashes` were interpreted `transform` lambdas
  *    per element/band; [[ShingleHashesExpr]]/[[BandHashesExpr]] run the
  *    identical per-element hash (md5Int, [[PolyHash.step]] chain, or the
  *    band's `md5(concat_ws(",", casts))` lowercase-hex) in one loop.
  *
  * Null parity with the lambda forms: a null ELEMENT hashes to a null
  * element (shingle hashes), is skipped by concat_ws (shingles, bands); a
  * null INPUT nulls the result (all four are null-intolerant — callers
  * that need the `when(size(toks) >= n, ...).otherwise(array())` guard
  * keep it outside, unchanged).
  */
object TextHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(bytes)
  }

  /** First 8 hex chars of md5 as an unsigned 32-bit int = first 4 digest
    * bytes big-endian — the exact value of
    * `conv(substring(md5(c), 1, 8), 16, 10)`. */
  def md5Int(s: UTF8String): Long = {
    val d = digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Full lowercase-hex md5 of a string — the exact value of `md5(c)`. */
  def md5Hex(s: UTF8String): UTF8String = {
    val d = digest(s.getBytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def polyHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = PolyHash.step(h, bytes(i))
      i += 1
    }
    h
  }

  private def windowAt(toks: ArrayData, from: Int, until: Int,
      sep: UTF8String): UTF8String = {
    val window = new Array[UTF8String](until - from)
    var j = from
    while (j < until) {
      window(j - from) =
        if (toks.isNullAt(j)) null else toks.getUTF8String(j)
      j += 1
    }
    UTF8String.concatWs(sep, window: _*)
  }

  /** Word n-gram shingles; per window the shingle is
    * `concat_ws(" ", tokens i..i+n-1)` (null tokens skipped). Windows
    * count = max(0, numTokens - n + 1), matching `sequence(0, size - n)`
    * under the caller's `size >= n` guard. `distinct` keeps the first
    * occurrence only (array_distinct order). */
  def wordShingles(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val sep = UTF8String.fromString(" ")
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= m - n) { seen.add(windowAt(toks, i, i + n, sep)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) { out(i) = windowAt(toks, i, i + n, sep); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** Consecutive non-overlapping n-token segments including the trailing
    * partial — the exact value of `transform(sequence(0,
    * (size-1) div n), i -> concat_ws(" ", slice(toks, i*n+1, n)))`:
    * ceil(m/n) segments for m >= 1, and ONE empty-string segment for
    * m = 0 (sequence(0, (0-1) div n = 0) is [0]; the slice is empty). */
  def tokenSegments(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val sep = UTF8String.fromString(" ")
    val count = ((m - 1) / n) + 1 // m=0 -> 1, matching the sequence form
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = windowAt(toks, i * n, math.min(i * n + n, m), sep)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct character q-grams, first-occurrence order — the exact value
    * of `array_distinct(transform(sequence(0, length(s) - q),
    * i -> substring(s, i + 1, q)))` for strings of >= q characters
    * (grams = chars [i, i+q), codepoint-aware): ONE boundary walk and
    * byte-slice per gram instead of an interpreted lambda whose substring
    * re-walks the string per position (O(len²) chars per row). */
  def charGrams(s: UTF8String, q: Int): ArrayData = {
    val bytes = s.getBytes
    // char-start byte offsets (one extra slot for the end sentinel)
    val starts = new Array[Int](s.numChars() + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(c) = bytes.length
    val m = c
    if (m < q) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var p = 0
    while (p <= m - q) {
      seen.add(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, starts(p), starts(p + q))))
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Per-element base hash: md5Int or polyHash; null elements stay null. */
  def shingleHashes(sh: ArrayData, useMd5: Boolean): ArrayData = {
    val m = sh.numElements()
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) =
        if (sh.isNullAt(i)) null
        else java.lang.Long.valueOf(
          if (useMd5) md5Int(sh.getUTF8String(i))
          else polyHash(sh.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-band md5 hex of the comma-joined signature slice — the exact
    * value of `md5(concat_ws(",", transform(slice(sig, b*r+1, r),
    * x => cast(x as string))))` per band b in 0 until bands. */
  def bandHashes(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val len = sig.numElements()
    val sep = UTF8String.fromString(",")
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val from = b * rowsPerBand
      val until = math.min(from + rowsPerBand, len)
      val parts = new Array[UTF8String](math.max(0, until - from))
      var i = from
      while (i < until) {
        parts(i - from) =
          if (sig.isNullAt(i)) null
          else UTF8String.fromString(java.lang.Long.toString(sig.getLong(i)))
        i += 1
      }
      out(b) = md5Hex(UTF8String.concatWs(sep, parts: _*))
      b += 1
    }
    new GenericArrayData(out)
  }

  def requireStringArray(t: DataType, what: String): Unit = t match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"$what needs array<string>, got $other")
  }
}

/** See [[TextHash.md5Int]]. */
case class Md5IntExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TextHash.md5Int(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.md5Int($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5IntExpr =
    copy(child = newChild)
  override def prettyName: String = "md5_int"
}

/** See [[TextHash.wordShingles]]. */
case class WordShinglesExpr(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHash.wordShingles(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.wordShingles($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = if (distinct) "word_shingles" else "word_windows"
}

/** See [[TextHash.charGrams]]. */
case class CharGramsExpr(child: Expression, q: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHash.charGrams(input.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.charGrams($c, $q);")

  override protected def withNewChildInternal(newChild: Expression): CharGramsExpr =
    copy(child = newChild)
  override def prettyName: String = "char_grams"
}

/** See [[TextHash.tokenSegments]]. */
case class TokenSegmentsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHash.tokenSegments(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.tokenSegments($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenSegmentsExpr =
    copy(child = newChild)
  override def prettyName: String = "token_segments"
}

/** See [[TextHash.shingleHashes]]. */
case class ShingleHashesExpr(child: Expression, useMd5: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHash.shingleHashes(input.asInstanceOf[ArrayData], useMd5)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.shingleHashes($c, $useMd5);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** See [[TextHash.bandHashes]]. */
case class BandHashesExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHash.bandHashes(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.bandHashes($c, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): BandHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "band_hashes"
}

object TextHashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def md5_int(c: Column): Column =
    ColumnBridge.column(Md5IntExpr(ColumnBridge.expression(c)))

  def word_shingles(toks: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(toks), n))

  /** ALL sliding windows (duplicates kept) — tx13's span-coverage shape. */
  def word_windows(toks: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(toks), n,
      distinct = false))

  def token_segments(toks: Column, n: Int): Column =
    ColumnBridge.column(TokenSegmentsExpr(ColumnBridge.expression(toks), n))

  def char_grams(s: Column, q: Int): Column =
    ColumnBridge.column(CharGramsExpr(ColumnBridge.expression(s), q))

  def shingle_hashes(sh: Column, useMd5: Boolean): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(sh), useMd5))

  def band_hashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(BandHashesExpr(ColumnBridge.expression(sig), bands,
      rowsPerBand))
}
