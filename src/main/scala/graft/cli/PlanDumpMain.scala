package graft.cli

import java.nio.file.{Files, Paths}

import graft.core.Sessions

/** Dev tool: dump `.explain("formatted")` for declared queries to files
  * (the plan evidence the optimization rounds commit under plans/).
  *
  * Usage: sbt "runMain graft.cli.PlanDumpMain <outDir> <suffix> [q...]"
  *   e.g.  runMain graft.cli.PlanDumpMain plans/r07 before q21_ngram_jaccard
  * With no query names, dumps the Bench headline set.
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r07")
    val suffix = args.drop(1).headOption.getOrElse("before")
    val names = if (args.length > 2) args.drop(2).toSeq else graft.Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      "graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
