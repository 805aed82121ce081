package graft.cli

import graft.core.Sessions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev tool: measures the embedding near-dup SCALE path against the exact
  * quadratic baseline on the same corpus. q25 (nBits = 0) is exact within
  * threshold — quadratic BY SPEC, the right correctness oracle but not the
  * 100-TB plan. The deployment shape is the same operator with SRP bucketing
  * (nBits > 0): only bucket-co-resident pairs are compared, so candidate
  * volume is bounded by bucket occupancy instead of n². This main reports
  * both runtimes plus the bucketed run's recall vs the exact pair set.
  *
  * Usage: sbt "runMain graft.cli.AnnScaleMain [sfDir] [nBits=8] [tau=0.4] [reps=3] [tables=12]"
  */
object AnnScaleMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBits = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val tau = args.drop(2).headOption.map(_.toDouble).getOrElse(0.4)
    val reps = args.drop(3).headOption.map(_.toInt).getOrElse(3)
    val tables = args.drop(4).headOption.map(_.toInt).getOrElse(12)
    val spark = Sessions.local(32, "graft-ann-scale")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

    def run(bits: Int): (Double, Long) = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Dedup.embeddingNearDup(emb, "vec_id", "embedding", tau = tau,
          nBits = bits, tables = tables).count()
        (System.nanoTime() - t0) / 1e9
      }
      val n = Dedup.embeddingNearDup(emb, "vec_id", "embedding", tau = tau,
        nBits = bits, tables = tables).count()
      (times.min, n)
    }

    val rows = emb.count()
    val (tExact, nExact) = run(0)
    val (tLsh, nLsh) = run(nBits)
    // recall: bucketed pairs are a subset of exact (same cosine filter), so
    // recall = |bucketed| / |exact| without a join
    val recall = if (nExact == 0) 1.0 else nLsh.toDouble / nExact
    println(f"""{"rows":$rows,"tau":$tau,"n_bits":$nBits,"tables":$tables,""" +
      f""""exact_sec":$tExact%.2f,"exact_pairs":$nExact,""" +
      f""""lsh_sec":$tLsh%.2f,"lsh_pairs":$nLsh,"recall":$recall%.4f,""" +
      f""""speedup":${tExact / tLsh}%.1f}""")
    spark.stop()
  }
}
