package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // warm-up pass at the smallest SF: JIT + codegen + catalog caches are
    // per-JVM one-time costs, not per-query throughput — time steady state
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must NOT look like a fast one: report -1, not elapsed
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Per-query detail (a few KB for ~90 queries) lands in a file only: a
    // line-oriented stdout parser with a bounded tail window would truncate it.
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // a failed detail write (read-only cwd, full disk) must not cost the
    // stdout metric line below
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.props("user.dir"), "bench_out.json"),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    // The LAST stdout line is a short total-only metric so it survives any
    // tail window; a stop() failure must not swallow it.
    try spark.stop()
    finally {
      println(s"""{"metric":"total","value":$total,"unit":"sec"}""")
      System.out.flush()
    }
  }
}
