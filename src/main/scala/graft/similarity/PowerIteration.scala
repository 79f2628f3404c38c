package graft.similarity

import java.math.{BigDecimal => JBD, RoundingMode}

/** Driver-local EXACT-decimal power iteration over a collected Gram matrix —
  * the post-Gram half of the fe3/fe4 PCA queries.
  *
  * Why local: after the one corpus-sized centering/Gram pass, every table in
  * the power/deflation loop is d- or d²-sized (d = 64 → at most 4096 rows,
  * 32 KB of doubles) — bounded MODEL state by construction, the same
  * driver-side doctrine as the KMeans/PQ codebooks (which are collected per
  * iteration already). Running the loop distributed cost ~25 adaptive query
  * stages per component (join + broadcast build + agg per unrolled round) —
  * pure job-submission overhead on corpus-independent data, at ANY corpus
  * scale.
  *
  * Bit-parity is the contract: each helper replays the exact Catalyst
  * arithmetic of the expression it replaces, so the emitted doubles are
  * IDENTICAL to the distributed formulation's (PowerIterationSpec pins this
  * per operation and end-to-end against a live Spark re-derivation):
  *
  *  - `castD(x, s)` = Spark's `Cast(double, DecimalType(p, s))`:
  *    `Decimal(BigDecimal(x))` goes through `Double.toString` (shortest
  *    repr — java `BigDecimal.valueOf`), then `changePrecision` =
  *    `setScale(s, HALF_UP)`.
  *  - decimal SUM is exact (order-free) — a plain java BigDecimal add loop.
  *  - `Cast(decimal, double)` = `BigDecimal.doubleValue`.
  *  - products/divisions stay primitive doubles in the same association
  *    order as the Column expressions they mirror.
  */
private[graft] object PowerIteration {

  /** Spark's Cast(DoubleType → DecimalType(_, scale)) on this data: through
    * the double's shortest decimal string, then HALF_UP to `scale`.
    *
    * Parity is TOTAL, not data-dependent (ADVICE r15): Spark's cast
    * returns NULL on precision overflow (scale 12 ⇒ DECIMAL(28,12), so
    * |x| ≥ ~1e16; scale 6 ⇒ DECIMAL(18,6), |x| ≥ ~1e12) and `sum` then
    * silently skips the term — a magnitude the local loop would happily
    * keep. Rather than threading Option through the whole iteration, the
    * bound is ASSERTED: Gram magnitudes anywhere near 1e16 mean the
    * corpus stats are broken, and a loud error beats a silent fork from
    * the distributed formulation. */
  def castD(x: Double, scale: Int): JBD = {
    val d = JBD.valueOf(x).setScale(scale, RoundingMode.HALF_UP)
    val precision = scale match { case 12 => 28; case 6 => 18
      case s => throw new IllegalArgumentException(s"unmapped scale $s") }
    if (d.precision > precision) throw new ArithmeticException(
      s"castD($x, $scale) needs ${d.precision} digits > DECIMAL($precision," +
        s"$scale): Spark's cast would return NULL here and the decimal sum " +
        "would skip the term — input magnitude is outside the bit-parity " +
        "contract's bound")
    d
  }

  /** `sum(expr.cast(DECIMAL(28,12))).cast("double")` over the given terms.
    * Spark accumulates in DECIMAL(38,12); an accumulator needing more
    * digits nulls the whole sum — asserted for the same reason as
    * [[castD]]'s bound. */
  def sumD12(xs: IterableOnce[Double]): Double = {
    var acc = JBD.ZERO
    val it = xs.iterator
    while (it.hasNext) acc = acc.add(castD(it.next(), 12))
    if (acc.precision > 38) throw new ArithmeticException(
      s"sumD12 accumulator needs ${acc.precision} digits > DECIMAL(38,12): " +
        "Spark's sum would overflow to NULL — outside the parity contract")
    acc.doubleValue()
  }

  /** `x.cast(DECIMAL(18,6)).cast("double")` — the final display rounding. */
  def d6(x: Double): Double = castD(x, 6).doubleValue()

  /** One matrix-vector multiply exactly as the distributed `mul`:
    * wᵢ = castDouble(Σⱼ castD12(G(i)(j) · vⱼ)). */
  def mul(g: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array.tabulate(g.length) { i =>
      val row = g(i)
      sumD12((0 until row.length).iterator.map(j => row(j) * v(j)))
    }

  /** Three unrolled power rounds from v₀ = fill(1/√d), exactly as fe3/fe4:
    * per round w = G·v, nrm = sqrt(castDouble(Σ castD12(wᵢ·wᵢ))),
    * v = w / nrm. Returns the final iterate. */
  def threeRounds(g: Array[Array[Double]], d: Int, v0: Double): Array[Double] = {
    var v = Array.fill(d)(v0)
    var r = 0
    while (r < 3) {
      val w = mul(g, v)
      val nrm = math.sqrt(sumD12(w.iterator.map(x => x * x)))
      v = w.map(_ / nrm)
      r += 1
    }
    v
  }

  /** Rayleigh numerator s = castDouble(Σ castD12(wᵢ·vᵢ)) with w = G·v. */
  def rayleigh(g: Array[Array[Double]], v: Array[Double]): Double = {
    val w = mul(g, v)
    sumD12(v.indices.iterator.map(i => w(i) * v(i)))
  }

  /** Hotelling deflation G' = G − s·v·vᵀ, exactly as the Column tree
    * `gij - s * vi * vj` (left-associated double multiplies). */
  def deflate(g: Array[Array[Double]], s: Double,
      v: Array[Double]): Array[Array[Double]] =
    Array.tabulate(g.length, g.length)((i, j) => g(i)(j) - s * v(i) * v(j))
}
