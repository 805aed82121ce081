package graft.cli

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence with REAL separate executor JVMs:
  * `local-cluster[N, 4, mem]` launches N worker processes with 4 cores each —
  * the faithful sandbox realization of "spark-submit at N and 4N executors"
  * (north rule). Compares N=2 vs 4N=8 executors (8 vs 32 total cores).
  *
  * Run: sbt "runMain graft.cli.ClusterScalingMain [nPages] [reps]".
  */
object ClusterScalingMain {

  private def sessionAt(workers: Int): SparkSession = {
    val totalCores = workers * 4
    val s = SparkSession.builder()
      .master(s"local-cluster[$workers,4,4096]")
      .appName(s"graft-cluster-scaling-$workers")
      .config("spark.sql.shuffle.partitions", totalCores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory", "4g")
      // this sandbox's resolv.conf points at a blackhole nameserver; any
      // DNS miss stalls ~5 s per attempt. Pin every address to loopback so
      // driver/executor RPC never consults DNS.
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.executorEnv.SPARK_LOCAL_IP", "127.0.0.1")
      .config("spark.executorEnv.SPARK_LOCAL_HOSTNAME", "localhost")
      // each executor must size its JVM pools (GC, netty, ForkJoin) for ITS
      // 4 cores, not the host's 32 — without this, 8 executors × 32-thread
      // pools thrash the box and more executors run slower
      .config("spark.executor.extraJavaOptions", "-XX:ActiveProcessorCount=4")
      // localCheckpoint pins blocks to executors; the default 3 s locality
      // wait then leaves other executors IDLE waiting for PROCESS_LOCAL
      // slots — on one box every fetch is loopback, so never wait
      .config("spark.locality.wait", "0")
      .config("spark.executor.extraClassPath",
        sys.props.getOrElse("graft.classes", "/root/repo/target/scala-2.13/classes"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toLong).getOrElse(400000L)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val baseN = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val results = Seq(baseN, baseN * 4).map { workers =>
      val spark = sessionAt(workers)
      graft.Bench.erPipeline(spark, 100000L) // warm-up: C2 JIT + shuffle dirs need real volume
      val runs = (1 to reps).map { i =>
        val r = graft.Bench.erPipeline(spark, nPages)
        println(f"[scaling] workers=$workers rep=$i ${r._1}%.2f s")
        r
      }
      val (secs, pairs, _) = runs.minBy(_._1)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      (workers, secs, pairs)
    }
    val Seq((_, tN, pN), (_, t4N, p4N)) = results
    val eff = (tN / t4N) / 4.0
    println(f"""{"mode":"local-cluster","executors_n":$baseN,"executors_4n":${baseN * 4},"cores_per_executor":4,""" +
      f""""n_pages":$nPages,"pairs_scored":$pN,""" +
      f""""t_n_sec":$tN%.2f,"t_4n_sec":$t4N%.2f,""" +
      f""""pairs_per_sec_n":${(pN / tN).round},"pairs_per_sec_4n":${(p4N / t4N).round},""" +
      f""""scaling_efficiency":$eff%.3f}""")
  }
}
