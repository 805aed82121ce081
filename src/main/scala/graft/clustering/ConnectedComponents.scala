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

  /** Edges after each phase are kept canonical: (node, root) with root < node. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("node").as("u"), col("root").as("v"))
      .unionByName(e.select(col("root").as("u"), col("node").as("v")))
    val m = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("mu"))
    sym.join(m, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("node"), col("mu").as("root"))
      .where(col("node") =!= col("root"))
      .distinct()
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

  /** Convergence signature (edge count, order-independent hash) is collected
    * as an `observe` side effect of the checkpoint materialization — zero
    * extra jobs per iteration, no driver collect of the edge set
    * (SURVEY §7.5.5). */
  private def checkpointWithSignature(df: DataFrame): (DataFrame, (Long, Long)) = {
    val observed = df.observe("cc_sig",
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(node, root))"), lit(0L)).as("h"))
    val materialized = observed.localCheckpoint() // action: runs + records metrics
    val row = observed.queryExecution.observedMetrics("cc_sig")
    (materialized, (row.getLong(0), row.getLong(1)))
  }

  /**
    * @param edges         (src, dst) above-threshold pairs, any orientation
    * @param nodes         optional universe of nodes (single column "node",
    *                      any orderable type); singletons get root = self
    * @param checkpointDir if set, each iteration's edge table is written as a
    *                      Parquet snapshot (north rule: checkpointed
    *                      per-iteration edge tables)
    * @param trackMerges   count root-pointer rewrites per iteration (lineage
    *                      counter "merges applied"; one extra join/iteration)
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      nodes: Option[DataFrame] = None,
      maxIter: Int = 30,
      checkpointDir: Option[String] = None,
      trackMerges: Boolean = true): Result = {
    var (e, sig) = checkpointWithSignature(edges
      .select(greatest(col("src"), col("dst")).as("node"), least(col("src"), col("dst")).as("root"))
      .where(col("node") =!= col("root"))
      .distinct())

    var iter = 0
    var merges = 0L
    var converged = sig._1 == 0L
    while (!converged && iter < maxIter) {
      iter += 1
      val (next, nextSig) = checkpointWithSignature(smallStar(largeStar(e)))
      checkpointDir.foreach { dir =>
        next.write.mode("overwrite").parquet(s"$dir/edges_iter_$iter")
      }
      if (trackMerges) {
        // merges applied this round = root pointers created or rewritten
        merges += next.join(e.withColumnRenamed("root", "prev"), Seq("node"), "left")
          .where(col("prev").isNull || col("prev") =!= col("root")).count()
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
