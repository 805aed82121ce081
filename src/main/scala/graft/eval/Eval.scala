package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.{LabeledPair, PairMetrics}

/** Stage 4: pairwise evaluation against the labeled pair table — the
  * reference's held-out precision/recall/F1 evaluation (train_deeper.py:36-39,
  * 357-361; sklearn confusion counts) as one conditional aggregation. A pair
  * is predicted positive iff both urls land in the same final cluster. */
object Eval {

  /** AUROC via the Mann-Whitney rank statistic over (score, label) rows —
    * distributed sort + zipWithIndex, no global window (the reference reports
    * sklearn AUROC on held-out pairs, train_deeper.py:357-361). */
  def auroc(scoredLabeled: DataFrame): Double = {
    val ranked = scoredLabeled.select(col("score").cast("double"), col("label").cast("int"))
      .orderBy("score").rdd.zipWithIndex()
    val (posRankSum, nPos, nNeg) = ranked.map { case (row, idx) =>
      if (row.getInt(1) == 1) (idx.toDouble + 1.0, 1L, 0L) else (0.0, 0L, 1L)
    }.fold((0.0, 0L, 0L)) { case ((r1, p1, n1), (r2, p2, n2)) => (r1 + r2, p1 + p2, n1 + n2) }
    if (nPos == 0 || nNeg == 0) return 1.0
    (posRankSum - nPos.toDouble * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg)
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
