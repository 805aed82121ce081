package graft.cli

import org.apache.spark.sql.functions._

import graft.core.{ScoreAttrs, Sessions}
import graft.fixtures.Fixture
import graft.scoring.Scoring

/** Offline calibration of the frozen scorer weights (the analog of the
  * reference's training loop, train_deeper.py:348-424, collapsed into a
  * deterministic fit): score every labeled fixture pair, print per-label
  * feature distributions and the confusion at the current weights. The
  * committed Weights() defaults were chosen from this output. */
object CalibrateMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000L)
    // "textonly" second arg: drop the media column and fit the text+price
    // profile (Weights.withoutMedia) — media is not a pure bias shift
    // (it adds ~3.2 logits to the weakest positive but also ~0.8 to the
    // hottest negative), so the text-only bias is FIT here, not derived
    val textOnly = args.lift(1).contains("textonly")
    val spark = Sessions.local(16, "graft-calibrate")
    import spark.implicits._

    val pt = Fixture.pagesWithTruth(spark, n).cache()
    val pages0 = pt.drop("entity_id")
    val pages = if (textOnly) pages0.drop("html") else pages0
    val labeled = Fixture.labeledPairs(spark, pt).cache()

    val attrs = Scoring.attrs(spark, pages).cache()
    // the scorer joins on 128-bit ids (numeric-key pipeline); map urls → ids
    // the same way the pipeline does (Blocking.pageIdOf), join labels back by id
    val candidates = labeled.toDF()
      .withColumn("id1", graft.blocking.Blocking.pageIdOf(least(col("url1"), col("url2"))))
      .withColumn("id2", graft.blocking.Blocking.pageIdOf(greatest(col("url1"), col("url2"))))
    // threshold ~0 disarms the phase-1 admission gate (it is derived from
    // the threshold) so calibration sees UNGATED feature distributions;
    // the z-coefficients stay the committed defaults
    val scored = Scoring.score(spark, candidates.select("id1", "id2"), attrs,
        Scoring.Weights(threshold = 1e-12))
      .join(candidates.select(col("id1"), col("id2"), col("label")), Seq("id1", "id2"))

    println("=== feature distributions by label ===")
    scored.groupBy("label").agg(
      count(lit(1)).as("n"),
      round(avg("jaro_winkler"), 4).as("jw_avg"), round(min("jaro_winkler"), 4).as("jw_min"),
      round(max("jaro_winkler"), 4).as("jw_max"),
      round(avg("levenshtein_sim"), 4).as("lev_avg"), round(min("levenshtein_sim"), 4).as("lev_min"),
      round(max("levenshtein_sim"), 4).as("lev_max"),
      round(avg("cosine"), 4).as("cos_avg"), round(min("cosine"), 4).as("cos_min"),
      round(max("cosine"), 4).as("cos_max"),
      round(avg("inv_l1"), 4).as("l1_avg"), round(min("inv_l1"), 4).as("l1_min"),
      round(max("inv_l1"), 4).as("l1_max"),
      round(avg("num_sim"), 4).as("num_avg"), round(min("num_sim"), 4).as("num_min"),
      round(avg("mmr"), 4).as("mmr_avg"), round(min("mmr"), 4).as("mmr_min"),
      round(avg("img_cos"), 4).as("icos_avg"), round(min("img_cos"), 4).as("icos_min"),
      round(max("img_cos"), 4).as("icos_max"),
      round(avg("img_l1"), 4).as("il1_avg"), round(max("img_l1"), 4).as("il1_max"),
      round(avg("img_l2"), 4).as("il2_avg"), round(max("img_l2"), 4).as("il2_max"),
      round(avg("score"), 4).as("score_avg"), round(min("score"), 4).as("score_min"),
      round(max("score"), 4).as("score_max")
    ).orderBy("label").show(false)

    println("=== quantiles of score by label ===")
    for (lbl <- Seq(0, 1)) {
      val q = scored.where($"label" === lbl).stat
        .approxQuantile("score", Array(0.001, 0.01, 0.5, 0.99, 0.999), 0.0001)
      println(s"label=$lbl score quantiles(0.1%,1%,50%,99%,99.9%): ${q.mkString(", ")}")
    }

    // evaluate the confusion at the profile being FITTED: in textonly mode
    // that is withoutMedia (bias −9.4), not the media-calibrated default —
    // otherwise the printed tp/fp/fn describe an operating point that will
    // never run on this corpus shape
    val w = if (textOnly) Scoring.Weights().withoutMedia else Scoring.Weights()
    println(s"=== confusion at profile: ${if (textOnly) "withoutMedia" else "default"} " +
      s"(bias ${w.bias}, threshold ${w.threshold})")
    // scores above were computed at bias −11 (threshold 1e-12 scorer); shift
    // by the profile's bias delta in logit space before thresholding
    val biasDelta = w.bias - Scoring.Weights().bias
    val z = log(col("score") / (lit(1.0) - col("score"))) + lit(biasDelta)
    val profScore = lit(1.0) / (lit(1.0) + exp(-z))
    val conf = scored.withColumn("score", profScore).agg(
      sum(when($"score" >= w.threshold && $"label" === 1, 1).otherwise(0)).as("tp"),
      sum(when($"score" >= w.threshold && $"label" === 0, 1).otherwise(0)).as("fp"),
      sum(when($"score" < w.threshold && $"label" === 1, 1).otherwise(0)).as("fn"),
      sum(when($"score" < w.threshold && $"label" === 0, 1).otherwise(0)).as("tn")
    ).collect()(0)
    println(s"=== at threshold ${w.threshold}: tp=${conf.getLong(0)} fp=${conf.getLong(1)} " +
      s"fn=${conf.getLong(2)} tn=${conf.getLong(3)}")
    spark.stop()
  }
}
