package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: isolates cluster-mode scaling of (a) pure CPU map work and
  * (b) a single shuffle, at 2 vs 8 local-cluster executors. */
object MicroBenchMain {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("cluster") // cluster | threads
    for (workers <- Seq(2, 8)) {
      val master = if (mode == "cluster") s"local-cluster[$workers,4,4096]"
                   else s"local[${workers * 4}]"
      val parts = if (mode == "threads-fixedparts") "32" else (workers * 4).toString
      val spark = SparkSession.builder().master(master)
        .appName(s"micro-$workers")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.ui.enabled", "false")
        .config("spark.executor.memory", "4g")
        .config("spark.executor.extraJavaOptions", "-XX:ActiveProcessorCount=4")
        .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
        .config("spark.eventLog.enabled", sys.env.getOrElse("GRAFT_EVENTLOG", "false"))
        .config("spark.eventLog.dir", "/tmp/spark-events")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._

      def time(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[micro] workers=$workers $name%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      // warmup
      spark.range(0, 1000000, 1, workers * 4).select(expr("bit_xor(xxhash64(id))")).collect()
      time("cpu") {
        spark.range(0, 400000000L, 1, workers * 4)
          .select(expr("bit_xor(xxhash64(id, id, id))")).collect()
      }
      time("shuffle") {
        // constant shuffle volume regardless of task count
        spark.range(0, 20000000L, 1, workers * 4)
          .repartition(workers * 4, $"id")
          .select(expr("bit_xor(xxhash64(id))")).collect()
      }
      time("join") {
        val a = spark.range(0, 5000000L, 1, workers * 4).select($"id", xxhash64($"id").as("h"))
        val b = spark.range(0, 5000000L, 1, workers * 4).select($"id", xxhash64($"id", $"id").as("h2"))
        a.join(b, "id").select(expr("bit_xor(h)"), expr("bit_xor(h2)")).collect()
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
