package graft.cli

import org.apache.spark.sql.functions._

/** Dev probe: connected-components cost on the ER edge set — iterations,
  * per-iteration wall, and edge counts (the CC stage was ~40% of er_pipeline
  * in the round-7 phase breakdown). Run:
  *   sbt "runMain graft.cli.CcProbeMain [cores] [nPages] [reps]"
  */
object CcProbeMain {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val nPages = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.local(cores, "graft-ccprobe")
    import spark.implicits._
    val pages = graft.fixtures.Fixture.pages(spark, nPages).toDF().localCheckpoint()
    val pre = graft.scoring.Scoring.projected(pages).localCheckpoint()
    val attrs = graft.scoring.Scoring.attrsFromProjected(spark, pre)
      .toDF().localCheckpoint().as[graft.core.ScoreAttrs]
    val blocks = graft.blocking.Blocking.blockTableFromProjected(pre).localCheckpoint()
    val cands = graft.blocking.Blocking.candidatePairs(blocks)
    val scored = graft.scoring.Scoring.score(spark, cands, attrs)
    val edges = graft.scoring.Scoring.edges(scored, 0.5).localCheckpoint()
    println(s"[ccprobe] edges=${edges.count()}")
    val idUrl = attrs.toDF().select(col("id").as("node"), col("url"))
    val nodes = idUrl.select("node").localCheckpoint()
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val res = graft.clustering.ConnectedComponents.run(spark, edges,
        nodes = Some(nodes), trackMerges = false)
      val n = res.assignments.count()
      println(f"[ccprobe] rep $r: ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"iters=${res.iterations}  assignments=$n")
    }
    spark.stop()
  }
}
