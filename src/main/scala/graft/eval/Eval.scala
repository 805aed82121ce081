package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.{LabeledPair, PairMetrics}

/** Stage 4: pairwise evaluation against the labeled pair table — the
  * reference's held-out precision/recall/F1 evaluation (train_deeper.py:36-39,
  * 357-361; sklearn confusion counts) as one conditional aggregation. A pair
  * is predicted positive iff both urls land in the same final cluster. */
object Eval {

  /** AUROC via the Mann-Whitney rank statistic over (score, label) rows with
    * MIDRANKS for ties (sklearn semantics — the reference reports sklearn
    * AUROC on held-out pairs, train_deeper.py:357-361; saturated logistic
    * scores tie often, and arbitrary tie ranks bias the statistic).
    *
    * Distributed: aggregate per distinct score (count, positives), range-sort,
    * then a two-pass partition prefix-sum — per-partition totals to the driver
    * (numPartitions rows), cumulative offsets back out. No global window, no
    * row collect. */
  def auroc(scoredLabeled: DataFrame): Double = {
    val agg = scoredLabeled.select(col("score").cast("double").as("s"), col("label").cast("int").as("l"))
      .groupBy("s").agg(count(lit(1)).as("c"), sum(col("l")).as("p"))
      .orderBy("s") // range-partitioned: partition i holds scores < partition i+1
    val rdd = agg.select("c", "p").rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-partition (rows, positives) totals
      val totals = rdd.mapPartitionsWithIndex { (i, it) =>
        var c = 0L; var p = 0L
        it.foreach { case (ci, pi) => c += ci; p += pi }
        Iterator.single((i, c, p))
      }.collect().sortBy(_._1)
      val nPos = totals.map(_._3).sum
      val nAll = totals.map(_._2).sum
      val nNeg = nAll - nPos
      if (nPos == 0 || nNeg == 0) return 1.0
      val offsets = totals.map(_._2).scanLeft(0L)(_ + _) // rows before partition i
      // pass 2: midrank(s) = rowsBefore(s) + (count(s) + 1) / 2
      val posRankSum = rdd.mapPartitionsWithIndex { (i, it) =>
        var cum = offsets(i)
        it.map { case (c, p) =>
          val mid = cum + (c + 1) / 2.0
          cum += c
          p * mid
        }
      }.sum()
      (posRankSum - nPos.toDouble * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg)
    } finally rdd.unpersist(blocking = false)
  }

  def pairwise(assignments: DataFrame, labeled: Dataset[LabeledPair]): PairMetrics = {
    val a = assignments.select(col("url").as("url1"), col("cluster_id").as("c1"))
    val b = assignments.select(col("url").as("url2"), col("cluster_id").as("c2"))
    val joined = labeled.toDF()
      .join(a, Seq("url1"), "left")
      .join(b, Seq("url2"), "left")
      .withColumn("pred",
        (col("c1").isNotNull && col("c2").isNotNull && col("c1") === col("c2")).cast("int"))
    val row = joined.agg(
      sum(when(col("pred") === 1 && col("label") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") === 1 && col("label") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("pred") === 0 && col("label") === 1, 1L).otherwise(0L)).as("fn"),
      sum(when(col("pred") === 0 && col("label") === 0, 1L).otherwise(0L)).as("tn")
    ).collect()(0)
    PairMetrics(row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }
}
