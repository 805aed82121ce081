package graft.cli

import org.apache.spark.sql.functions._

/** Dev probe: what Catalyst sizeInBytes estimates report for the pair-grid
  * input frames in each calling context (localCheckpoint, parquet scan,
  * derived lineage) — sizing evidence for a stats-derived gridPartitions. */
object StatsProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32, "graft-statsprobe")
    def stat(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val s = df.queryExecution.optimizedPlan.stats
      println(s"[stats] $name sizeInBytes=${s.sizeInBytes} rowCount=${s.rowCount}")
    }
    val pages = graft.fixtures.Fixture.pages(spark, 100000).toDF().localCheckpoint()
    stat("pages(localCheckpoint)", pages)
    val pre = graft.scoring.Scoring.projected(pages).localCheckpoint()
    val blocks = graft.blocking.Blocking.blockTableFromProjected(pre).localCheckpoint()
    stat("blocks(localCheckpoint)", blocks)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    stat("documents(parquet)", docs)
    val entries = docs.select(col("doc_id").as("id"),
      explode(graft.functions.GraftFunctions.minhash_token_bands(lower(col("text")), 32, 4, 42L))
        .as("block_key"))
    stat("q22-entries(derived)", entries)
    stat("q22-entries(persisted)",
      entries.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    spark.stop()
  }
}
