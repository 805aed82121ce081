package graft.cli

import org.apache.spark.sql.functions._

import graft.blocking.Blocking
import graft.core.Sessions

/** Dev tool: block-size distribution + salting replication cost at n pages. */
object BlockStatsMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = Sessions.local(16, "graft-blockstats")
    val pages = graft.fixtures.Fixture.pages(spark, n).toDF().localCheckpoint()
    val counts = Blocking.blockTable(pages, Blocking.Config())
      .groupBy("block_key").count().localCheckpoint()
    counts.agg(
      count(lit(1)).as("blocks"),
      sum("count").as("entries"),
      max("count").as("max_n"),
      sum(when(col("count") > 1,
        (col("count") * ceil(col("count") / cap)).cast("long")).otherwise(0L)).as("bucketed_rows"),
      sum(when(col("count") > 1,
        (col("count") * (col("count") - 1) / 2).cast("long")).otherwise(0L)).as("raw_pairs")
    ).show(false)
    counts.select(
      when(col("count") === 1, "1").when(col("count") <= 8, "2-8")
        .when(col("count") <= 64, "9-64").when(col("count") <= 512, "65-512")
        .when(col("count") <= 4096, "513-4096").otherwise(">4096").as("size_band"))
      .groupBy("size_band").count().orderBy("size_band").show(false)
    spark.stop()
  }
}
