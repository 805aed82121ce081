package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.eval.Eval
import graft.fixtures.Fixture
import graft.lineage.SnapshotStore
import graft.pipeline.Linkage

/** The correctness gate (BASELINE.md): full 3-stage run on 10k synthetic
  * pages, pairwise F1 ≥ 0.99 vs labeled pairs, byte-identity invariant,
  * kill/resume equivalence. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val n = 10000L
  private lazy val workDir = Files.createTempDirectory("graft-e2e").toString
  private lazy val pt = Fixture.pagesWithTruth(spark, n).cache()
  private lazy val pages = pt.drop("entity_id").cache()
  private lazy val labeled = Fixture.labeledPairs(spark, pt).cache()
  private lazy val result = Linkage.run(spark, pages, Linkage.Config(workDir = workDir))

  test("pairwise F1 >= 0.99 on labeled pairs (north-rule gate)") {
    val m = Eval.pairwise(result.clusters, labeled)
    info(s"tp=${m.tp} fp=${m.fp} fn=${m.fn} tn=${m.tn} " +
      f"P=${m.precision}%.4f R=${m.recall}%.4f F1=${m.f1}%.4f")
    assert(m.f1 >= 0.99, s"F1 ${m.f1} below gate")
  }

  test("clusters match planted entities exactly (stronger than the gate)") {
    val truth = pt.select($"url", $"entity_id")
    val joined = result.clusters.join(truth, "url")
    // every cluster maps to exactly one entity and vice versa
    assert(joined.groupBy("cluster_id").agg(countDistinct("entity_id").as("d"))
      .where($"d" > 1).count() == 0)
    assert(joined.groupBy("entity_id").agg(countDistinct("cluster_id").as("d"))
      .where($"d" > 1).count() == 0)
  }

  test("per-row invariant: text sha unchanged through the run") {
    result.clusters.count() // force pipeline
    val store = new SnapshotStore(spark, workDir, resume = true)
    val recorded = store.counter("ingest", "sha_sum")
    val now = pages.agg(expr("bit_xor(xxhash64(sha2(text, 256)))")).as[Long].collect()(0)
    assert(recorded.contains(now))
  }

  test("lineage counters present and plausible") {
    result.clusters.count()
    val store = new SnapshotStore(spark, workDir, resume = true)
    assert(store.counter("blocks", "blocks_built").exists(_ > 0))
    assert(store.counter("scored", "pairs_scored").exists(_ > 0))
    assert(store.counter("clusters", "merges_applied").isDefined)
    assert(store.counter("blocks", "blocks_dropped").contains(0L))
  }

  test("resume: a rerun recomputes nothing and yields identical clusters") {
    val before = result.clusters.orderBy("url").collect()
    val resumed = Linkage.run(spark, pages,
      Linkage.Config(workDir = workDir, resume = true))
    assert(resumed.resumedStages ==
      Seq("projected", "attrs", "blocks", "pairs", "scored", "clusters"))
    assert(resumed.clusters.orderBy("url").collect().sameElements(before))
  }

  test("resume is scan-free: zero data rows read until an action on the result (counter-carried guard)") {
    result.clusters.count() // ensure the workdir is complete
    // a resume still runs small parquet FOOTER jobs (schema inference per
    // snapshot read) — the claim is no DATA scan: round 4 paid a full
    // count+countDistinct aggregate over the attrs snapshot per rerun; the
    // guard now reads manifest counters
    val rowsRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        rowsRead.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val resumed = Linkage.run(spark, pages,
        Linkage.Config(workDir = workDir, resume = true))
      assert(resumed.resumedStages.size == 6)
      Thread.sleep(1000) // let in-flight stage-completed events drain
      assert(rowsRead.get() == 0L,
        s"resume read ${rowsRead.get()} data rows; the id guard must read manifest counters, not re-scan")
      assert(resumed.counters.get("attrs.distinct_ids").exists(_ > 0))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("id-uniqueness guard fires on duplicated input urls (from stage counters)") {
    val dir = Files.createTempDirectory("graft-e2e-dup").toString
    val small = pages.limit(200).cache()
    small.count() // pin the limit's choice — the union must truly duplicate
    val dup = small.unionAll(small)
    val e = intercept[IllegalArgumentException] {
      Linkage.run(spark, dup, Linkage.Config(workDir = dir))
    }
    assert(e.getMessage.contains("duplicate page id"), e.getMessage)
  }

  test("kill/resume: only missing stages recompute after partial run") {
    val dir2 = Files.createTempDirectory("graft-e2e-partial").toString
    val cfg = Linkage.Config(workDir = dir2)
    // simulate a killed run: copy completed early stages only
    val full = new java.io.File(workDir)
    for (stage <- Seq("ingest", "projected", "attrs", "blocks")) {
      val src = new java.io.File(full, stage)
      val dst = new java.io.File(dir2, stage)
      org.apache.commons.io.FileUtils.copyDirectory(src, dst)
    }
    val resumed = Linkage.run(spark, pages, cfg.copy(resume = true))
    assert(resumed.resumedStages == Seq("projected", "attrs", "blocks"))
    val m = Eval.pairwise(resumed.clusters, labeled)
    assert(m.f1 >= 0.99)
  }

  test("counter-less attrs manifest: backfilled once on resume; guard fires on a doctored snapshot") {
    result.clusters.count()
    val dir = Files.createTempDirectory("graft-e2e-backfill").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(workDir), new java.io.File(dir))
    val store = new SnapshotStore(spark, dir, resume = true)
    val manifestPath = s"$dir/attrs/manifest.json"
    def stripCounters(keys: Set[String]): Unit = {
      val fields = Seq("stage", "fingerprint", "status", "format")
        .flatMap(k => graft.lineage.Snapshots.readManifestField(manifestPath, k)
          .map(k -> _)).toMap
      graft.lineage.Snapshots.writeManifest(manifestPath, fields,
        store.counters("attrs") -- keys, Seq.empty)
    }
    // 1) pre-upgrade manifest (no distinct_ids): the resume backfills the
    // counter INTO the manifest (one distinct aggregate, once) and succeeds
    stripCounters(Set("distinct_ids"))
    assert(store.counter("attrs", "distinct_ids").isEmpty)
    val resumed = Linkage.run(spark, pages, Linkage.Config(workDir = dir, resume = true))
    assert(resumed.counters.get("attrs.distinct_ids").contains(n))
    assert(store.counter("attrs", "distinct_ids").contains(n),
      "backfill must write the counter back into the manifest")
    // pairs manifest carries the abandoned-cache-release lineage counter
    // (round-5 VERDICT ask #7) — zero on this clean staged run
    assert(resumed.counters.get("pairs.abandoned_releases").contains(0L))
    // 2) doctored snapshot under a counter-less manifest: backfill re-derives
    // rows AND distinct ids from the snapshot itself — the guard fires
    // instead of silently no-opping (round-5 "What's wrong" #2)
    val attrsPath = s"$dir/attrs/data.parquet"
    val attrsDf = spark.read.parquet(attrsPath)
    val doctoredRows = attrsDf.unionByName(attrsDf.limit(1)).collect()
    val tmpOut = Files.createTempDirectory("graft-e2e-doctor").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(doctoredRows.toIndexedSeq), attrsDf.schema)
      .write.mode("overwrite").parquet(tmpOut)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(attrsPath))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(tmpOut), new java.io.File(attrsPath))
    stripCounters(Set("distinct_ids", "rows"))
    val e = intercept[IllegalArgumentException] {
      Linkage.run(spark, pages, Linkage.Config(workDir = dir, resume = true))
    }
    assert(e.getMessage.contains("duplicate page id"), e.getMessage)
  }

  test("re-threshold resume: data stages incl. the pair join resume; only scoring/clustering recompute") {
    // the deployment tuning loop: same corpus, different weights/threshold.
    // Data stages key on the weights-INDEPENDENT fingerprint, so everything
    // up to the expensive pair join resumes; at 100 TB that is a scoring
    // pass instead of a full recompute. (Copied workdir: the new scored/
    // clusters snapshots must not clobber the sibling tests' manifests.)
    result.clusters.count()
    val dir3 = Files.createTempDirectory("graft-e2e-rethresh").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(workDir), new java.io.File(dir3))
    val strict = Linkage.run(spark, pages, Linkage.Config(workDir = dir3,
      resume = true,
      weights = graft.scoring.Scoring.Weights(threshold = 0.999)))
    assert(strict.resumedStages == Seq("projected", "attrs", "blocks", "pairs"),
      s"got ${strict.resumedStages}")
    // the stricter threshold really re-clustered: only saturated near-exact
    // copies stay linked, so the cluster count rises well above the default
    // run's — proof that scored/clusters recomputed under the new weights
    val nDefault = result.clusters.select("cluster_id").distinct().count()
    val nStrict = strict.clusters.select("cluster_id").distinct().count()
    assert(nStrict > nDefault + 1000,
      s"strict threshold produced $nStrict clusters vs default $nDefault — scored/clusters not recomputed?")
  }
}
