package graft.clustering

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 3: transitive clustering via the alternating large-star / small-star
  * connected-components algorithm (Kiveris et al., "Connected Components in
  * MapReduce and Beyond" — public algorithm), expressed entirely in DataFrame
  * ops: each round is two groupBy-min aggregations + joins; O(log n) rounds.
  *
  * The reference has no clustering (pairs are given — SURVEY §0); this stage
  * is the north-star addition that turns above-threshold pairs into entity
  * clusters. cluster_id = lexicographic min url of the component.
  */
object ConnectedComponents {

  /** assignments: (node, root) — root is the component minimum. */
  case class Result(assignments: DataFrame, iterations: Int, mergesApplied: Long)

  /** Edges after each phase are kept canonical: (node, root) with root < node.
    * NOT deduped here: [[smallStar]]'s min-aggregation is duplicate-blind and
    * its own final distinct canonicalizes the iteration's output, so a
    * distinct at this seam was one full exchange + hash aggregate per
    * iteration spent collapsing rows the next operator collapses anyway
    * (duplicates entering smallStar at most double its input — bounded by
    * parallel (node, root) derivations, and partial map-side aggregation
    * absorbs them before they shuffle). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("node").as("u"), col("root").as("v"))
      .unionByName(e.select(col("root").as("u"), col("node").as("v")))
    val m = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("mu"))
    sym.join(m, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("node"), col("mu").as("root"))
      .where(col("node") =!= col("root"))
  }

  private def smallStar(e: DataFrame): DataFrame = {
    // edges are already (node, root) with root < node
    val m = e.groupBy("node").agg(min("root").as("mr"))
    val moved = e.join(m, "node")
      .select(col("root").as("node"), col("mr").as("root"))
      .where(col("node") =!= col("root"))
    val self = m.select(col("node"), col("mr").as("root"))
    moved.unionByName(self).distinct()
  }

  /** Convergence signature (edge count, order-independent hash) — and, when
    * the input carries a `changed` column, the merges-applied counter — are
    * collected as `observe` side effects of the checkpoint materialization:
    * zero extra jobs per iteration, no driver collect of the edge set
    * (SURVEY §7.5.5; merges fold VERDICT r1 §perf). */
  private def checkpointWithSignature(df: DataFrame): (DataFrame, (Long, Long), Long) = {
    val hasChanged = df.columns.contains("changed")
    val base = Seq(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(node, root))"), lit(0L)).as("h"))
    val metrics = base ++
      (if (hasChanged) Seq(coalesce(sum(col("changed")), lit(0L)).as("m")) else Nil)
    val observed = df.observe("cc_sig", metrics.head, metrics.tail: _*)
    val projected = if (hasChanged) observed.select("node", "root") else observed
    val materialized = projected.localCheckpoint() // action: runs + records metrics
    val row = projected.queryExecution.observedMetrics("cc_sig")
    (materialized, (row.getLong(0), row.getLong(1)), if (hasChanged) row.getLong(2) else 0L)
  }

  /**
    * @param edges         (src, dst) above-threshold pairs, any orientation
    * @param nodes         optional universe of nodes (single column "node",
    *                      any orderable type); singletons get root = self
    * @param checkpointDir if set, each iteration's edge table is written as a
    *                      Parquet snapshot (north rule: checkpointed
    *                      per-iteration edge tables)
    * @param trackMerges   count root-pointer rewrites per iteration (lineage
    *                      counter "merges applied"; a left join against the
    *                      previous — already checkpointed — edge table that
    *                      rides the SAME checkpoint job via observe: no extra
    *                      action per iteration)
    * @param roundsPerMaterialize large/small-star rounds chained per
    *                      checkpoint/convergence-check (each materialization
    *                      is one Spark job — a serial-latency floor at small
    *                      edge counts; 2 halves the job count at the cost of
    *                      possibly one extra round after convergence)
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      nodes: Option[DataFrame] = None,
      maxIter: Int = 30,
      checkpointDir: Option[String] = None,
      trackMerges: Boolean = true,
      roundsPerMaterialize: Int = 1): Result = {
    var (e, sig, _) = checkpointWithSignature(edges
      .select(greatest(col("src"), col("dst")).as("node"), least(col("src"), col("dst")).as("root"))
      .where(col("node") =!= col("root"))
      .distinct())

    var iter = 0
    var merges = 0L
    var converged = sig._1 == 0L
    while (!converged && iter < maxIter) {
      iter += 1
      val stepped = (1 to roundsPerMaterialize)
        .foldLeft(e)((acc, _) => smallStar(largeStar(acc)))
      // merges applied this round = root pointers created or rewritten =
      // (node, root) rows absent from the previous edge table. The diff
      // joins on BOTH columns — e's rows are distinct, so the left join can
      // never fan out a stepped row (a node legitimately carries several
      // roots mid-convergence; joining on node alone would DUPLICATE edges).
      // Summed by the checkpoint's observe — no extra job.
      val diffed =
        if (trackMerges)
          stepped.join(e.withColumn("existed", lit(1L)), Seq("node", "root"), "left")
            .withColumn("changed", when(col("existed").isNull, 1L).otherwise(0L))
            .select("node", "root", "changed")
        else stepped
      val (next, nextSig, m) = checkpointWithSignature(diffed)
      merges += m
      checkpointDir.foreach { dir =>
        next.write.mode("overwrite").parquet(s"$dir/edges_iter_$iter")
      }
      converged = nextSig == sig
      sig = nextSig
      e = next
    }

    val assign = e.select(col("node"), col("root"))
    val result = nodes match {
      case Some(n) =>
        n.select("node").join(assign, Seq("node"), "left")
          .select(col("node"), coalesce(col("root"), col("node")).as("root"))
      case None =>
        assign.unionByName(
          e.select(col("root").as("node"), col("root")).distinct())
    }
    Result(result, iter, merges)
  }
}
