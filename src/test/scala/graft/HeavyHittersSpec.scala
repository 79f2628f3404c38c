package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Funnel, HeavyHitters}

/** Heavy hitters vs the naive full count (incl. the adversarial case of a
  * true hitter spread thinly across partitions), and the funnel operator vs
  * a naive per-key reference. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("exact heavy hitters match the naive full count on zipf-ish data") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(53)
    // 40% of mass on 10 hot tokens (~4% each, above the 2% threshold),
    // the rest spread over a 500-token cold tail (~0.12% each, below it)
    val items = (1 to 20000).map(_ =>
      if (rnd.nextInt(10) < 4) s"hot${rnd.nextInt(10)}"
      else s"w${rnd.nextInt(500)}")
    val m = 50
    val got = HeavyHitters.exact(items.toDF("item"), "item", m)
      .as[(String, Long)].collect().sorted.toSeq
    val naive = items.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .filter(_._2 * m > items.size).toSeq.sorted
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("a hitter spread evenly across all partitions is still found") {
    val spark2 = spark
    import spark2.implicits._
    // 64 partitions, "hot" appears once per 7 rows spread over EVERY
    // partition — never locally dominant, globally just over n/8. The
    // per-partition summaries must still surface it (superset lemma),
    // the exact pass must keep it.
    val rows = (0 until 6400).map(i =>
      if (i % 7 == 0) "hot" else s"cold_${i}")
    val df = rows.toDF("item").repartition(64)
    val got = HeavyHitters.exact(df, "item", m = 8)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("hot", rows.count(_ == "hot").toLong)))
  }

  test("funnel timestamps match a naive per-key scan, drop-off included") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(59)
    val evs = (1 to 3000).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(3) match {
        case 0 => "a"; case 1 => "b"; case _ => "c"
      }, rnd.nextInt(1000).toLong)
    }
    val w = 120L
    val got = Funnel.funnel(evs.toDF("k", "et", "t"), "k", "t",
        Seq("a" -> (org.apache.spark.sql.functions.col("et") === "a"),
          "b" -> (org.apache.spark.sql.functions.col("et") === "b"),
          "c" -> (org.apache.spark.sql.functions.col("et") === "c")),
        windowMicros = w)
      .as[(Long, Long, Option[Long], Option[Long])].collect().sorted.toSeq

    val naive = evs.groupBy(_._1).toSeq.flatMap { case (k, kevs) =>
      def firstAfter(et: String, lo: Option[Long]): Option[Long] = lo.flatMap(p =>
        kevs.filter(e => e._2 == et && e._3 > p && e._3 <= p + w)
          .map(_._3).minOption)
      val t1 = kevs.filter(_._2 == "a").map(_._3).minOption
      t1.map { t =>
        val t2 = firstAfter("b", Some(t))
        val t3 = firstAfter("c", t2)
        (k, t, t2, t3)
      }
    }.sorted
    assert(got === naive)
    assert(naive.exists(_._3.isEmpty) || naive.exists(_._4.isEmpty))
  }
}
