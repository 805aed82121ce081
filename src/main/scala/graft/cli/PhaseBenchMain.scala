package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-phase wall times of the ER pipeline at a given parallelism
  * (phases isolated via localCheckpoint so each is measured once). */
object PhaseBenchMain {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val nPages = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.blocking.Blocking
    import graft.clustering.ConnectedComponents
    import graft.scoring.Scoring

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val pages = phase("fixture") {
      graft.fixtures.Fixture.pages(spark, nPages).toDF().localCheckpoint()
    }
    val cfg = Blocking.Config()
    val attrs = phase("attrs") { Scoring.attrs(spark, pages).toDF().localCheckpoint() }
    val blocks = phase("blocks") { Blocking.blockTable(pages, cfg).localCheckpoint() }
    val cands = phase("pairs") { Blocking.candidatePairs(blocks, cfg).localCheckpoint() }
    import spark.implicits._
    val scored = phase("score") {
      Scoring.score(spark, cands, attrs.as[graft.core.ScoreAttrs]).toDF().localCheckpoint()
    }
    val edges = Scoring.edges(scored.as[graft.core.ScoredPair], 0.5)
    phase("cc") {
      val idUrl = attrs.select(col("id").as("node"), col("url"))
      ConnectedComponents.run(spark, edges, Some(idUrl.select("node")), trackMerges = false)
        .assignments.count()
    }
    spark.stop()
  }
}
