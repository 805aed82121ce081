package graft.cli

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.md north rule): the same ER
  * job, same input, at local[8] vs local[32] — the sandbox proxy for N vs 4N
  * executors. Reports pairs-scored/sec at both parallelism levels and the
  * scaling efficiency (T_8 / T_32) / 4. Run: sbt "runMain
  * graft.cli.ScalingBenchMain [nPages]". */
object ScalingBenchMain {

  private def sessionAt(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toLong).getOrElse(100000L)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val results = Seq(8, 32).map { cores =>
      val spark = sessionAt(cores)
      // warm-up pass (JIT/codegen caches) at small n, then min of `reps`
      // measured runs (min is the noise-robust estimator on a shared VM)
      graft.Bench.erPipeline(spark, 2000L)
      val runs = (1 to reps).map(_ => graft.Bench.erPipeline(spark, nPages))
      val (secs, pairs, clusters) = runs.minBy(_._1)
      spark.stop()
      // SparkContext must be fully cleared before a new master is allowed
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      (cores, secs, pairs, clusters)
    }
    val Seq((_, t8, p8, _), (_, t32, p32, c32)) = results
    val eff = (t8 / t32) / 4.0
    println(f"""{"n_pages":$nPages,"pairs_scored":$p8,"clusters":$c32,""" +
      f""""t_local8_sec":$t8%.2f,"t_local32_sec":$t32%.2f,""" +
      f""""pairs_per_sec_8":${(p8 / t8).round},"pairs_per_sec_32":${(p32 / t32).round},""" +
      f""""scaling_efficiency":$eff%.3f}""")
  }
}
