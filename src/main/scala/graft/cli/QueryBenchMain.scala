package graft.cli

import graft.core.Sessions

/** Dev tool: rep a single SparkEntry query in one session (min-of-k is the
  * only honest estimator on this VM — BENCH.md). Usage:
  *   sbt "runMain graft.cli.QueryBenchMain q25_embedding_neardup [reps] [sfDir]"
  */
object QueryBenchMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q25_embedding_neardup")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(32, s"graft-qbench-$name")
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[qbench] $name rep $i: $t%.2f s ($n rows)")
      t
    }
    println(f"[qbench] $name min-of-$reps: ${times.min}%.2f s")
    spark.stop()
  }
}
