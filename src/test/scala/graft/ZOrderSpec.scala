package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.ZOrder

/** Z-order layout contract: after clustering, every output file's
  * bounding box is tight on BOTH dimensions — the property parquet
  * min/max skipping actually prunes on — whereas a single-column sort
  * leaves the second dimension's per-file range at ~the full domain. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("zValue interleaves monotonically within each dimension") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 0L, 65535L, 0L, 65535L).as("z"))
    val zs = df.as[Long].collect()
    assert(zs(0) === 0L)
    assert(zs(3) === (1L << 32) - 1, s"full-corner z was ${zs(3)}")
    // a occupies even bits, b odd: the two single-corner codes are disjoint
    assert((zs(1) & zs(2)) === 0L && (zs(1) | zs(2)) === zs(3))
  }

  /** mean per-file normalized range of `c` over already-written files. */
  private def meanFileRange(written: org.apache.spark.sql.DataFrame,
      c: String): Double = {
    val global = written
      .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val span = math.max(global.getDouble(1) - global.getDouble(0), 1.0)
    val perFile = written
      .withColumn("__f", input_file_name())
      .groupBy("__f")
      .agg((max(col(c)).cast("double") - min(col(c)).cast("double")).as("r"))
      .agg(avg(col("r"))).head().getDouble(0)
    perFile / span
  }

  private def meanFileRange(dir: String, c: String): Double =
    meanFileRange(spark.read.parquet(dir), c)

  test("z-clustered files have tight bounding boxes on BOTH dimensions") {
    val orders = Tables.t(spark, TestSession.sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), to_date(lit("2020-01-01")))
          .cast("long").as("d_days"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // write each layout ONCE; measure both dimensions from the same files
    ZOrder.clustered(orders, "o_custkey", "d_days", numFiles = 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(s"$dir/s")
    val custRange = meanFileRange(s"$dir/z", "o_custkey")
    // same data, single-column sort: the OTHER dimension stays wide
    val dayRangeSorted = meanFileRange(s"$dir/s", "d_days")
    val dayRangeZ = meanFileRange(s"$dir/z", "d_days")
    // 16 z-tiles → each dim range ~1/sqrt(16)=0.25 of the domain; allow 2x
    assert(custRange <= 0.5, s"custkey per-file range too wide: $custRange")
    assert(dayRangeZ <= 0.5, s"date per-file range too wide: $dayRangeZ")
    assert(dayRangeSorted >= 0.8,
      s"control violated: single-column sort should leave dates wide, got $dayRangeSorted")
  }

  test("writeZOrdered keeps the bounding-box property through the store path") {
    val store = new graft.store.BucketStore(spark,
      java.nio.file.Files.createTempDirectory("graft_zstore").toString)
    val b = graft.model.Bucket("/z/orders", graft.model.DataSchema())
    val orders = Tables.t(spark, TestSession.sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), to_date(lit("2020-01-01")))
          .cast("long").as("d_days"))
    store.writeZOrdered(b, orders, "o_custkey", "d_days", numFiles = 16)
    val written = store.read(b)
    assert(written.count() === orders.count())
    assert(meanFileRange(written, "o_custkey") <= 0.5)
    assert(meanFileRange(written, "d_days") <= 0.5)
  }
}
