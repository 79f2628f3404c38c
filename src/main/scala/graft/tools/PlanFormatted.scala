package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence artifact (`plans/rNN/<query>_<suffix>.txt`).
  * Usage: runMain graft.tools.PlanFormatted <outDir> <suffix> <query>...
  * (suffix = "before" / "after"). Runs at sf0.001 — plan SHAPE is what's
  * recorded (join strategy, Exchange count, PushedFilters/ReadSchema);
  * AQE-final plans differ only in runtime stats, not shape, at this size. */
object PlanFormatted {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanFormatted <outDir> <suffix> <query>...")
    val (outDir, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"[plan] wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
