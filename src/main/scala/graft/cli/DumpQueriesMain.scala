package graft.cli

/** Dev tool: dump selected declared queries' full results as parquet (the
  * Verify shape, query subset) for cross-binary result-identity checks.
  * Usage: sbt "runMain graft.cli.DumpQueriesMain <sfDir> <outDir> q..."
  */
object DumpQueriesMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-dumpq")
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[dumpq] wrote $outDir/$name")
    }
    spark.stop()
  }
}
