package graft.cli

/** Dev probe: ER wall time at fixed cores across `graft.blocking.gridPartitions`
  * values, one JVM/session (runtime-settable conf), interleaved to cancel this
  * box's window drift — sizes the pair-grid's cores×waves multiplier (the
  * round-6 wave-packing lever; default 8 × defaultParallelism).
  * Run: sbt "runMain graft.cli.GridPartsProbeMain [cores] [nPages] [g1 g2 ...]".
  */
object GridPartsProbeMain {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val nPages = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val grids: Seq[Int] =
      if (args.length > 2) args.drop(2).toSeq.map(_.toInt)
      else Seq(64, 128, 256, 512, 256, 128, 64)
    val spark = graft.core.Sessions.local(cores, s"graft-gridparts-$cores")
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.erPipeline(spark, math.min(nPages, 100000L)) // warmup, discarded
    for (g <- grids) {
      spark.conf.set("graft.blocking.gridPartitions", g.toString)
      val (secs, pairs, clusters) = graft.Bench.erPipeline(spark, nPages)
      println(f"[grid] cores=$cores gridParts=$g%-4d $secs%7.2f s  " +
        f"${(pairs / secs).toLong}%,d pairs/s  clusters=$clusters")
    }
    spark.stop()
  }
}
