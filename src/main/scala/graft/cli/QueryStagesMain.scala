package graft.cli

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.core.Sessions

/** Dev tool: run one declared query (noop sink) with per-stage forensics —
  * task counts, executor run/CPU/GC, shuffle bytes — to attribute its time.
  * Usage: sbt "runMain graft.cli.QueryStagesMain <query> [sfDir]"
  */
object QueryStagesMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q22_minhash_dedup")
    val sfDir = args.drop(1).headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      s"graft-qstages-$name")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)
        stages.add(f"[stage] id=${si.stageId}%-4d tasks=${si.numTasks}%-4d " +
          f"wall=${wall / 1e3}%7.2fs run=${m.executorRunTime / 1e3}%8.2fs " +
          f"cpu=${m.executorCpuTime / 1e9}%8.2fs gc=${m.jvmGCTime / 1e3}%6.2fs " +
          f"in=${m.inputMetrics.recordsRead}%,12d rows " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB/${m.shuffleReadMetrics.recordsRead}%,d " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB/${m.shuffleWriteMetrics.recordsWritten}%,d")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to 2).foreach { rep =>
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[qstages] $name rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (rep == 2) stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
