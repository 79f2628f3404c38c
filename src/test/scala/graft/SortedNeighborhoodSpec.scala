package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SortedNeighborhood

/** Distributed sorted-neighborhood pairing vs a naive in-memory reference.
  * The test data spans MANY range partitions (hundreds of rows, 32 shuffle
  * partitions), so pairs crossing partition boundaries — the case the
  * offset arithmetic exists for — occur throughout. */
class SortedNeighborhoodSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("pairs match the naive global-sort reference across partition boundaries") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(41)
    // duplicate keys included: the idCol tiebreaker must keep the global
    // order (and thus the pair set) deterministic
    val rows = (1L to 400L).map(i => (i, s"k${rnd.nextInt(60)}"))
    val w = 4
    val got = SortedNeighborhood.pairs(rows.toDF("id", "key"), "id",
        Seq("key"), window = w)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq

    val order = rows.sortBy { case (id, k) => (k, id) }.map(_._1)
    val naive = (for {
      i <- order.indices; j <- (i + 1) to math.min(i + w, order.size - 1)
    } yield (order(i), order(j))).sorted
    assert(got === naive)
    assert(got.size === naive.size)
    assert(got.distinct.size === got.size) // each pair exactly once
  }

  test("window larger than the corpus yields all ordered pairs, no phantoms") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq((1L, "b"), (2L, "a"), (3L, "c"))
    val got = SortedNeighborhood.pairs(rows.toDF("id", "key"), "id",
        Seq("key"), window = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    // sort order: a(2), b(1), c(3)
    assert(got === Seq((1L, 3L), (2L, 1L), (2L, 3L)))
  }
}
