package graft.cli

import org.apache.spark.sql.SparkSession

import graft.core.Sessions
import graft.fixtures.Fixture
import graft.pipeline.Linkage

/** spark-submit entry point:
  *
  *   LinkageMain --input <pages.parquet | fixture:N> --out <workDir>
  *               [--resume] [--parallelism N] [--threshold T]
  *
  * `--parallelism` drives the local[N] proxy for the N-vs-4N executor scaling
  * evidence (BASELINE.md); on a real cluster the same jar runs unchanged under
  * spark-submit --num-executors.
  */
object LinkageMain {
  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val parallelism = opts.getOrElse("parallelism", "32").toInt
    val out = opts.getOrElse("out", "/tmp/graft-linkage")
    val input = opts.getOrElse("input", "fixture:10000")
    val resume = opts.contains("resume")

    val spark: SparkSession = Sessions.auto(parallelism, "graft-linkage")
    val pages =
      if (input.startsWith("fixture:")) Fixture.pages(spark, input.stripPrefix("fixture:").toLong).toDF()
      else spark.read.parquet(input)

    val weights = opts.get("threshold")
      .map(t => graft.scoring.Scoring.Weights(threshold = t.toDouble))
      .getOrElse(graft.scoring.Scoring.Weights())
    val composition = opts.get("composition") match {
      case Some("idf") => graft.scoring.Scoring.Idf
      case _ => graft.scoring.Scoring.Average
    }
    val cfg = Linkage.Config(workDir = out, resume = resume, weights = weights,
      composition = composition)

    val t0 = System.nanoTime()
    val result = Linkage.run(spark, pages, cfg)
    val nClusters = result.clusters.select("cluster_id").distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    val pairsScored = result.counters.getOrElse("scored.pairs_scored", 0L)
    val evalJson =
      if (input.startsWith("fixture:") && opts.contains("eval")) {
        val pt = Fixture.pagesWithTruth(spark, input.stripPrefix("fixture:").toLong)
        val m = graft.eval.Eval.pairwise(result.clusters, Fixture.labeledPairs(spark, pt))
        f""","precision":${m.precision}%.6f,"recall":${m.recall}%.6f,"f1":${m.f1}%.6f""" +
          s""","tp":${m.tp},"fp":${m.fp},"fn":${m.fn},"tn":${m.tn}"""
      } else ""
    println(s"""{"pages":${result.counters.getOrElse("ingest.rows", -1L)},""" +
      s""""clusters":$nClusters,"pairs_scored":$pairsScored,""" +
      s""""resumed_stages":"${result.resumedStages.mkString(",")}",""" +
      s""""seconds":$secs,"pairs_per_sec":${if (secs > 0) pairsScored / secs else 0}""" +
      evalJson + "}")
    spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--resume" :: rest => parse(rest, acc + ("resume" -> "true"))
      case "--eval" :: rest => parse(rest, acc + ("eval" -> "true"))
      case key :: value :: rest if key.startsWith("--") =>
        parse(rest, acc + (key.stripPrefix("--") -> value))
      case _ :: rest => parse(rest, acc)
    }
}
