package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.{LabeledPair, PairMetrics}

/** Stage 4: pairwise evaluation against the labeled pair table — the
  * reference's held-out precision/recall/F1 evaluation (train_deeper.py:36-39,
  * 357-361; sklearn confusion counts) as one conditional aggregation. A pair
  * is predicted positive iff both urls land in the same final cluster. */
object Eval {

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
