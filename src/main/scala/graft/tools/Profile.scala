package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc profiling: run selected queries N times, print per-iteration secs. */
object Profile {
  def main(args: Array[String]): Unit = {
    val (sfDir, names0) = args.toSeq match {
      case head +: rest if head.startsWith("/") => (head, rest)
      case other => (sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), other)
    }
    val names = if (names0.nonEmpty) names0 else Seq("q1_agg", "j2_semi")
    val spark = GraftSession.local()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"$n%-20s iter$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
