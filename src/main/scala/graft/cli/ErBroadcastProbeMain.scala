package graft.cli

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev tool: runs the in-memory er pipeline at a given page count and prints
  * every BroadcastExchange the executed (post-AQE) plans contain, with its
  * materialized dataSize and row count — the forensic for "which table is
  * that 176 MB broadcast". Usage:
  *   sbt "runMain graft.cli.ErBroadcastProbeMain [pages=400000] [minMB=8] [cores=32]"
  */
object ErBroadcastProbeMain {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.map(_.toLong).getOrElse(400000L)
    val minMB = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val cores = args.drop(2).headOption.map(_.toInt).getOrElse(32)
    val spark = graft.core.Sessions.local(cores, "er-bcast-probe")
    spark.sparkContext.setLogLevel("WARN")

    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // materialized AQE stages wrap their subtree in `plan` with children=Nil
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: walk(q.plan)
      case other =>
        other +: (other.children.flatMap(walk) ++ other.subqueries.flatMap(walk))
    }
    // per-stage forensic: task-time AND wall timeline (submit→complete
    // offsets from job start) — the GAPS between stages are driver stalls /
    // AQE barriers, invisible to task-time alone. GC time shows heap churn.
    val jobT0 = System.currentTimeMillis()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val runSec = info.taskMetrics.executorRunTime / 1e3
        val gcSec = info.taskMetrics.jvmGCTime / 1e3
        val sub = info.submissionTime.map(t => (t - jobT0) / 1e3).getOrElse(-1.0)
        val fin = info.completionTime.map(t => (t - jobT0) / 1e3).getOrElse(-1.0)
        if (fin - sub > 1.0 || runSec > 20)
          println(f"[stage] ${info.stageId}%4d ${info.numTasks}%5d tasks " +
            f"[$sub%7.1f →$fin%7.1f wall] $runSec%7.1f s-task $gcSec%6.1f s-gc  " +
            info.name.linesIterator.next().take(60))
      }
    })
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit = {
        walk(qe.executedPlan).collect { case b: BroadcastExchangeExec =>
          val bytes = b.metrics.get("dataSize").map(_.value).getOrElse(-1L)
          val rows = b.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
          if (bytes > minMB.toLong * 1024 * 1024)
            println(f"[bcast] ${bytes / 1e6}%.1f MB, $rows rows, child:\n" +
              b.child.toString.linesIterator.take(6).map("[bcast]   " + _).mkString("\n"))
        }
        // join-strategy inventory: which physical join each query ran
        walk(qe.executedPlan).foreach { p =>
          val n = p.nodeName
          if (n.contains("Join")) {
            val rows = p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
            println(f"[join] $fn%-16s $n%-28s out=$rows%,14d")
          }
        }
      }
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = {
        // a FAILED broadcast build has no dataSize metric — print every
        // BroadcastExchange in the failed plan unconditionally
        println(s"[bcast] FAILED query ($fn): ${e.getMessage.take(120)}")
        walk(qe.executedPlan).collect { case b: BroadcastExchangeExec =>
          println("[bcast] failed-plan broadcast child:\n" +
            b.child.toString.linesIterator.take(8).map("[bcast]   " + _).mkString("\n"))
        }
      }
    })

    val t0 = System.nanoTime()
    try {
      val (secs, pairs, clusters) = graft.Bench.erPipeline(spark, pages)
      println(f"[bcast] er at $pages pages: $secs%.1f s, $pairs pairs, $clusters clusters " +
        f"(total ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    } catch {
      case e: Throwable =>
        println(s"[bcast] er FAILED after ${(System.nanoTime() - t0) / 1e9} s: " +
          e.getMessage.take(200))
    }
    Thread.sleep(2000)
    spark.stop()
  }
}
