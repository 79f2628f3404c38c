package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.PartitionedStore

/** The second WRITER PROCESS in RaceCommitSpec's cross-process commit
  * race — a real JVM with its own SparkSession and its own (useless, by
  * construction) in-process commit lock, so the only thing arbitrating
  * its commits against the parent test's is [[PartitionedStore]]'s
  * on-disk machinery: the `manifest.v<N>` hard-link arbiter and the
  * post-link stale-writer re-check. Coordination is file-based (the
  * parent creates `go_<i>`, the child commits `commitsPerRound` refreshes
  * and creates `done_<i>`), which keeps ONE child JVM alive across every
  * race round instead of paying a Spark cold start per round.
  *
  * Args: storeRoot ctrlDir rounds commitsPerRound retainVersions.
  * Each committed refresh writes rows (k, k*1000 + round) over all 4
  * partitions so the parent can assert exactly WHOSE commit won. */
object RaceCommitChild {
  def main(args: Array[String]): Unit = {
    val Array(root, ctrl, roundsS, perRoundS, retainS) = args.take(5)
    val rounds = roundsS.toInt
    val perRound = perRoundS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-race-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val store = new PartitionedStore(spark, root, Seq("k"), 4,
      retainVersions = retainS.toInt)
    def await(name: String): Unit = {
      val deadline = System.nanoTime() + 300e9.toLong
      while (!Files.exists(Paths.get(ctrl, name))) {
        if (System.nanoTime() > deadline) sys.error(s"timeout waiting $name")
        Thread.sleep(20)
      }
    }
    for (i <- 1 to rounds) {
      await(s"go_$i")
      for (_ <- 1 to perRound)
        store.refresh(0 until 4, spark.range(40)
          .select(col("id").as("k"), (col("id") * 1000L + i).as("v")))
      Files.write(Paths.get(ctrl, s"done_$i"),
        store.version().toString.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
