package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExprFunctions.{nearest_cell, probe_cells}
import graft.functions.VectorFunctions.l2sq

/** Parity of the per-row assignment expressions against the join+aggregate /
  * join+window formulations they replaced (guide §2.4: the optimization's
  * contract is identical winners, identical tie-breaks, identical d2
  * arithmetic — just no shuffle). Random vectors plus engineered EXACT
  * distance ties (duplicate centroids) exercise the (d2, cent) tie-break. */
class NearestCellSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val dim = 8

  private def vecs(seed: Long, n: Int, withTies: Boolean): Seq[(Long, Seq[Double])] = {
    val r = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      val v =
        if (withTies && i % 5 == 0) Seq.fill(dim)(0.25) // equidistant to dup cents
        else Seq.fill(dim)(r.nextGaussian())
      (i.toLong, v)
    }
  }

  /** Centroids with a DUPLICATE pair (cents 2 and 3 identical) so some rows
    * tie exactly on d2 and only the cent tie-break decides. */
  private def cents(seed: Long, k: Int): Seq[(Long, Seq[Double])] = {
    val r = new scala.util.Random(seed)
    val base = Seq.tabulate(k)(c => (c.toLong, Seq.fill(dim)(r.nextGaussian())))
    base.updated(3, (3L, base(2)._2))
  }

  private def df(rows: Seq[(Long, Seq[Double])], id: String, vec: String): DataFrame = {
    val rws = rows.map { case (i, v) => Row(i, v) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rws).asJava),
      StructType(Seq(StructField(id, LongType, nullable = false),
        StructField(vec, ArrayType(DoubleType), nullable = false))))
  }

  private def centsRowDf(c: DataFrame): DataFrame =
    c.agg(sort_array(collect_list(struct(col("cent"), col("cv")))).as("__cs"))

  test("nearest_cell == broadcast-join + min_by argmin, including exact ties") {
    val corpus = df(vecs(7L, 300, withTies = true), "id", "vec")
    val cent = df(cents(11L, 6), "cent", "cv")

    val oldWay = corpus.join(broadcast(cent))
      .select(col("id"), col("cent"), l2sq(col("vec"), col("cv")).as("d2"))
      .groupBy("id")
      .agg(min_by(struct(col("cent"), col("d2")), struct(col("d2"), col("cent"))).as("m"))
      .select(col("id"), col("m.cent").as("cent"), col("m.d2").as("d2"))

    val newWay = corpus.crossJoin(broadcast(centsRowDf(cent)))
      .select(col("id"), nearest_cell(col("vec"), col("__cs")).as("nc"))
      .select(col("id"), col("nc.cent").as("cent"), col("nc.d2").as("d2"))

    val o = oldWay.orderBy("id").collect()
    val n = newWay.orderBy("id").collect()
    assert(o.length == n.length)
    o.zip(n).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getLong(1) == b.getLong(1), s"winner differs for id ${a.getLong(0)}")
      assert(java.lang.Double.doubleToRawLongBits(a.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(b.getDouble(2)),
        s"d2 not bit-identical for id ${a.getLong(0)}")
    }
  }

  test("nearest_cell winner cv is the winning centroid's exact vector") {
    val corpus = df(vecs(3L, 50, withTies = true), "id", "vec")
    val cent = df(cents(11L, 6), "cent", "cv")
    val centMap = cents(11L, 6).toMap
    corpus.crossJoin(broadcast(centsRowDf(cent)))
      .select(col("id"), nearest_cell(col("vec"), col("__cs")).as("nc"))
      .select(col("id"), col("nc.cent"), col("nc.cv")).collect()
      .foreach { r =>
        assert(r.getSeq[Double](2) == centMap(r.getLong(1)))
      }
  }

  test("probe_cells == row_number window over (d2, cent), order included") {
    val corpus = df(vecs(19L, 300, withTies = true), "id", "vec")
    val cent = df(cents(11L, 6), "cent", "cv")
    val nprobe = 3

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("d2"), col("cent"))
    val oldWay = corpus.join(broadcast(cent))
      .select(col("id"), col("cent"), l2sq(col("vec"), col("cv")).as("d2"))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nprobe)
      .select(col("id"), col("crank"), col("cent"))

    val newWay = corpus.crossJoin(broadcast(centsRowDf(cent)))
      .select(col("id"), posexplode(probe_cells(col("vec"), col("__cs"), nprobe)
        .getField("cent")))
      .select(col("id"), (col("pos") + 1).as("crank"), col("col").as("cent"))

    val o = oldWay.orderBy("id", "crank").collect()
    val n = newWay.orderBy("id", "crank").collect()
    assert(o.length == n.length)
    o.zip(n).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(2) == b.getLong(2),
        s"probe rank ${a.getInt(1)} differs for id ${a.getLong(0)}")
    }
  }

  test("probe_cells caps at the cell count; int cent type preserved") {
    val corpus = df(vecs(5L, 20, withTies = false), "id", "vec")
    val cent = df(cents(11L, 4), "cent", "cv")
      .select(col("cent").cast("int").as("cent"), col("cv"))
    val out = corpus.crossJoin(broadcast(centsRowDf(cent)))
      .select(col("id"), probe_cells(col("vec"), col("__cs"), 99).as("p"))
    assert(out.schema("p").dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType]("cent").dataType == IntegerType)
    out.collect().foreach(r => assert(r.getSeq[Row](1).length == 4))
  }
}
