package graft.cli

import org.apache.spark.sql.SparkSession

/** Dev probe: ER wall time at FIXED cores across `spark.sql.shuffle.partitions`
  * values, all in one JVM/session (the conf is runtime-settable), so the
  * partition-count cost is isolated from this box's window drift. Motivated by
  * the round-6 scaling-gate read: the shuffle_hash pair grid builds a
  * per-partition HashedRelation over exploded corpus-scale inputs, so
  * partitions must track DATA size, not core count — partitions=cores at
  * local[2]/800k pages means half the 99M-row grid in one build map.
  * Run: sbt "runMain graft.cli.ShufflePartsProbeMain [cores] [nPages] [p1 p2 ...]".
  */
object ShufflePartsProbeMain {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val nPages = args.drop(1).headOption.map(_.toLong).getOrElse(800000L)
    val parts: Seq[Int] =
      if (args.length > 2) args.drop(2).toSeq.map(_.toInt) else Seq(8, 64, 8)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-parts-probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.erPipeline(spark, 100000L) // JIT/codegen warmup, discarded
    for (p <- parts) {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val (secs, pairs, clusters) = graft.Bench.erPipeline(spark, nPages)
      println(f"[parts] cores=$cores parts=$p%-4d $secs%7.2f s  " +
        f"${(pairs / secs).toLong}%,d pairs/s  clusters=$clusters")
    }
    spark.stop()
  }
}
