package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blocking.Blocking
import graft.clustering.ConnectedComponents
import graft.core.ScoreAttrs
import graft.lineage.SnapshotStore
import graft.scoring.Scoring

/** The three-stage record-linkage pipeline (north star):
  *   ingest(manifest-only) → attrs → blocks → pairs → scored → clusters
  * Every stage is an Iceberg-style Parquet snapshot + JSON manifest with
  * lineage counters; a rerun with resume=true picks up after the last
  * complete stage. The per-row invariant (byte-identical text per url,
  * evidenced by an order-independent hash-sum of sha256(text)) is recorded at
  * ingest and re-verifiable at any point.
  */
object Linkage {

  case class Config(
      blocking: Blocking.Config = Blocking.Config(),
      weights: Scoring.Weights = Scoring.Weights(),
      workDir: String,
      resume: Boolean = false,
      trackMerges: Boolean = true,
      checkpointCC: Boolean = true)

  case class Result(
      clusters: DataFrame,
      counters: Map[String, Long],
      resumedStages: Seq[String])

  /** Stable fingerprint of the run configuration (keys resume validity). */
  def fingerprint(cfg: Config): String = {
    val s = s"b=${cfg.blocking.bands},r=${cfg.blocking.rows},seed=${cfg.blocking.seed}," +
      s"cap=${cfg.blocking.cap},max=${cfg.blocking.maxBlock},dom=${cfg.blocking.domainKey}," +
      s"w=${cfg.weights}"
    java.lang.Long.toHexString(
      org.apache.spark.unsafe.types.UTF8String.fromString(s).hashCode.toLong & 0xFFFFFFFFL)
  }

  def run(spark: SparkSession, pages: DataFrame, cfg: Config): Result = {
    import spark.implicits._
    val store = new SnapshotStore(spark, cfg.workDir, cfg.resume)
    val fp = fingerprint(cfg)
    var resumed = Vector.empty[String]
    var counters = Map.empty[String, Long]
    def track(name: String, o: graft.lineage.Snapshots.StageOutcome): DataFrame = {
      if (o.resumed) resumed :+= name
      counters ++= o.counters.map { case (k, v) => s"$name.$k" -> v }
      o.df
    }

    // stage 0: ingest — record count + text invariant hash, copy nothing
    counters ++= store.recordOnly("ingest", fp, pages, shaCol = Some("text"))
      .map { case (k, v) => s"ingest.$k" -> v }

    // stage 1a: per-page scoring attributes (frozen-embedding composition)
    val attrs = track("attrs", store.stage("attrs", fp) {
      Scoring.attrs(spark, pages).toDF()
    })

    // stage 1b: salted block table
    val blocks = track("blocks", store.stage("blocks", fp,
      countersFromWritten = w => Blocking.blockStats(w, cfg.blocking)) {
      Blocking.blockTable(pages, cfg.blocking)
    })

    // stage 2a: block-local self-join → candidate pairs
    val pairs = track("pairs", store.stage("pairs", fp) {
      Blocking.candidatePairs(blocks, cfg.blocking)
    })

    // stage 2b: fused pairwise scoring kernel
    val pairsScored = spark.sparkContext.longAccumulator("pairs_scored")
    val scored = track("scored", store.stage("scored", fp,
      countersFromWritten = _ => Map("pairs_scored" -> pairsScored.value)) {
      Scoring.score(spark, pairs, attrs.as[ScoreAttrs], cfg.weights, Some(pairsScored)).toDF()
    })

    // stage 3: transitive clustering (large-star/small-star)
    val edges = scored.where(col("score") >= cfg.weights.threshold)
      .select(col("url1").as("src"), col("url2").as("dst"))
    val ccDir = if (cfg.checkpointCC) Some(s"${cfg.workDir}/cc") else None
    var ccIters = 0L
    var ccMerges = 0L
    val clusters = track("clusters", store.stage("clusters", fp,
      countersFromWritten = _ =>
        Map("cc_iterations" -> ccIters, "merges_applied" -> ccMerges)) {
      val cc = ConnectedComponents.run(spark, edges, nodes = Some(pages.select("url")),
        checkpointDir = ccDir, trackMerges = cfg.trackMerges)
      ccIters = cc.iterations.toLong
      ccMerges = cc.mergesApplied
      cc.assignments
    })

    Result(clusters, counters, resumed)
  }
}
