package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR plus the
  * end-to-end record-linkage pipeline (in-memory, no snapshot I/O) on a
  * deterministic 100k-page fixture. Prints ONE JSON line. */
object Bench {

  /** Headline subset: one per operator family (scan-agg, join-agg, window,
    * time-bucket, text, dedup, ANN, vectors). */
  val headline: Seq[String] = Seq(
    "q02_group_agg", "q03_join_agg", "q07_window_topk", "q12_time_buckets",
    "q17_doc_frequency", "q21_ngram_jaccard", "q24_ann_brute",
    "q25_embedding_neardup", "q28_quality", "q33_vector_norms")

  /** In-memory 3-stage linkage; returns (seconds, pairsScored, assignments). */
  def erPipeline(spark: SparkSession, nPages: Long): (Double, Long, Long) = {
    val t0 = System.nanoTime()
    val pages = graft.fixtures.Fixture.pages(spark, nPages).toDF()
    val acc = spark.sparkContext.longAccumulator("bench_pairs")
    val assignments = graft.pipeline.Linkage
      .runLight(spark, pages, pairsScored = Some(acc)).count()
    ((System.nanoTime() - t0) / 1e9, acc.value, assignments)
  }

  /** Fixed-quantum CPU control (same protocol as the scaling CLIs): 8
    * independent CPU-bound processes, wall seconds to finish. This VM's
    * throughput swings ±2× across windows (BENCH.md environment note §2), so
    * every bench line carries the substrate reading taken right before it —
    * ~10 s = healthy window, 12–16 s = degraded; compare times ACROSS runs
    * only after comparing their controls. Returns -1 if python3 is absent. */
  private def cpuControl(): Double =
    try {
      val work = "i=0\nwhile i<120000000: i+=1"
      val t0 = System.nanoTime()
      val ps = (1 to 8).map(_ => new ProcessBuilder("python3", "-c", work).start())
      ps.foreach(_.waitFor())
      (System.nanoTime() - t0) / 1e9
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val erPages = sys.env.getOrElse("SPARK_GRAFT_ER_PAGES", "100000").toLong
    val ctl = cpuControl()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (erSecs, pairsScored, clusters) = erPipeline(spark, erPages)
    val all = results :+ ("er_pipeline" -> erSecs)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${all.map(_._2).sum}%.3f"
    val pps = if (erSecs > 0) (pairsScored / erSecs).round else 0L
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","er_pages":$erPages,"er_pairs_scored":$pairsScored,""" +
      s""""er_pairs_per_sec":$pps,"er_clusters":$clusters,"cpus":$cpus,""" +
      f""""cpu_ctl_sec":$ctl%.2f}""")
    spark.stop()
  }
}
