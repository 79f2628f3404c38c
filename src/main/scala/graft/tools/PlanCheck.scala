package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc: print the optimized plan of a query without running it. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sfDir = "/root/testdata/sf0.001"
    args.foreach { n =>
      println(s"=== $n ===")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.optimizedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
