package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.PowerIteration

/** Bit-parity of the driver-local exact-decimal power iteration against the
  * live Catalyst expressions it replaced (the fe3/fe4 post-Gram loop): the
  * optimization's whole contract is that the emitted doubles are IDENTICAL,
  * so every helper is pinned against Spark evaluating the original
  * expression tree on the same inputs — including awkward doubles (ties at
  * the 12th fractional digit, negatives, subnormal-ish magnitudes). */
class PowerIterationSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val d28 = org.apache.spark.sql.types.DecimalType(28, 12)

  private def awkward(seed: Long, n: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      i % 7 match {
        case 0 => r.nextDouble() * 1e-9            // rounds to ~0 at scale 12
        case 1 => -r.nextDouble() * 1e6
        case 2 => (r.nextInt(2000001) - 1000000) * 5e-13 // half-up ties
        case 3 => r.nextGaussian()
        case 4 => r.nextDouble() * r.nextInt(1000)
        case 5 => -r.nextGaussian() * 1e3
        case _ => r.nextDouble()
      }
    }
  }

  test("castD(x, 12) equals Spark's Cast(double, DECIMAL(28,12)) exactly") {
    val s = spark; import s.implicits._
    val xs = awkward(1L, 2000)
    val viaSpark = xs.toDF("x")
      .select(col("x").cast(d28).cast("string")).as[String].collect()
    val local = xs.map(x => PowerIteration.castD(x, 12).toPlainString)
    // Spark's Decimal.toString drops trailing zeros via BigDecimal scale
    // handling identically to toPlainString at fixed scale 12
    assert(viaSpark.toSeq == local)
  }

  test("sumD12 equals sum(cast(d28)).cast(double) exactly, any partitioning") {
    val s = spark; import s.implicits._
    val xs = awkward(2L, 3001)
    val viaSpark = xs.toDF("x").repartition(13)
      .agg(sum(col("x").cast(d28)).cast("double")).as[Double].head()
    assert(java.lang.Double.doubleToRawLongBits(viaSpark) ==
      java.lang.Double.doubleToRawLongBits(PowerIteration.sumD12(xs)))
  }

  test("local three-round power + Rayleigh + deflation equals the distributed formulation bit-for-bit") {
    val s = spark; import s.implicits._
    val d = 8
    val r = new scala.util.Random(7L)
    // a symmetric "Gram" with rough magnitudes of the real one
    val base = Array.tabulate(d, d)((i, j) => r.nextGaussian() * 10)
    val g = Array.tabulate(d, d)((i, j) => base(math.min(i, j))(math.max(i, j)))
    val gDf = (for { i <- 0 until d; j <- 0 until d }
      yield (i, j, g(i)(j))).toDF("i", "j", "gij")

    // the ORIGINAL distributed loop (verbatim expression trees)
    def mulD(v: org.apache.spark.sql.DataFrame) =
      gDf.join(broadcast(v.select(col("i").as("j"), col("v").as("vj"))), "j")
        .groupBy("i")
        .agg(sum((col("gij") * col("vj")).cast(d28)).cast("double").as("w"))
    var vD = s.range(d.toLong)
      .select(col("id").cast("int").as("i"), lit(0.125).as("v"))
    for (_ <- 1 to 3) {
      val w = mulD(vD)
      val nrm = w.agg(
        sqrt(sum((col("w") * col("w")).cast(d28)).cast("double")).as("nrm"))
      vD = w.crossJoin(broadcast(nrm))
        .select(col("i"), (col("w") / col("nrm")).as("v"))
    }
    val sval = mulD(vD).join(vD, "i")
      .agg(sum((col("w") * col("v")).cast(d28)).cast("double")).as[Double].head()
    val vDist = vD.orderBy("i").select("v").as[Double].collect()

    val vLoc = PowerIteration.threeRounds(g, d, 0.125)
    val sLoc = PowerIteration.rayleigh(g, vLoc)
    assert(vDist.toSeq.map(java.lang.Double.doubleToRawLongBits) ==
      vLoc.toSeq.map(java.lang.Double.doubleToRawLongBits))
    assert(java.lang.Double.doubleToRawLongBits(sval) ==
      java.lang.Double.doubleToRawLongBits(sLoc))

    // deflation parity: gij - s * vi * vj
    val vDf = vLoc.toSeq.zipWithIndex.map { case (x, i) => (i, x) }.toDF("i", "v")
    val gDefD = gDf
      .join(broadcast(vDf.select(col("i"), col("v").as("vi"))), "i")
      .join(broadcast(vDf.select(col("i").as("j"), col("v").as("vj"))), "j")
      .select(col("i"), col("j"),
        (col("gij") - lit(sLoc) * col("vi") * col("vj")).as("gij"))
      .orderBy("i", "j").select("gij").as[Double].collect()
    val gDefL = PowerIteration.deflate(g, sLoc, vLoc)
    val flatL = for { i <- 0 until d; j <- 0 until d } yield gDefL(i)(j)
    assert(gDefD.toSeq.map(java.lang.Double.doubleToRawLongBits) ==
      flatL.map(java.lang.Double.doubleToRawLongBits))
  }
}
