package graft.cli

import graft.core.Sessions

/** Dev tool (guide §1.4): time EVERY declared query with the noop sink —
  * every column of every row computed, no sink cost, full plan in the SQL
  * tab. Two passes per query (cold, warm) so codegen/JIT warmup is visible.
  *
  * Usage: sbt "runMain graft.cli.NoopBenchMain [sfDir] [q...]"
  */
object NoopBenchMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      "graft-noopbench")
    names.foreach { name =>
      spark.sparkContext.setJobDescription(name)
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[noop] $name%-28s cold=${times.head}%7.2f s warm=${times.last}%7.2f s")
    }
    spark.stop()
  }
}
