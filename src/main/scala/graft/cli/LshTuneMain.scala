package graft.cli

import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.fixtures.Fixture
import graft.normalize.Normalize

/** Dev tool: measures the char-3-gram Jaccard distribution of labeled
  * positive vs negative fixture pairs — the data that picks the LSH
  * (bands, rows) operating point on the s-curve. */
object LshTuneMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(3000L)
    val spark = Sessions.local(16, "graft-lsh-tune")
    import spark.implicits._

    val pt = Fixture.pagesWithTruth(spark, n).cache()
    val labeled = Fixture.labeledPairs(spark, pt)
    val norm = pt.select($"url", Normalize.normText($"text").as("nt"))

    val pairs = labeled.toDF()
      .join(norm.as("a"), $"url1" === $"a.url")
      .join(norm.as("b"), $"url2" === $"b.url")
      .select($"label", $"a.nt".as("t1"), $"b.nt".as("t2"))
      .as[(Int, String, String)]
      .map { case (label, t1, t2) =>
        def grams(s: String): Set[String] =
          (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
        val g1 = grams(t1); val g2 = grams(t2)
        val inter = g1.intersect(g2).size.toDouble
        val uni = g1.size + g2.size - inter
        (label, if (uni == 0) 1.0 else inter / uni)
      }.toDF("label", "jaccard").cache()

    for (lbl <- Seq(0, 1)) {
      val q = pairs.where($"label" === lbl).stat
        .approxQuantile("jaccard", Array(0.001, 0.01, 0.05, 0.5, 0.95, 0.99, 0.999), 0.0001)
      println(s"label=$lbl jaccard q(0.1,1,5,50,95,99,99.9%): " +
        q.map(v => f"$v%.3f").mkString(", "))
    }
    // s-curve: candidate probability 1-(1-J^r)^b at a given J
    for ((b, r) <- Seq((8, 2), (8, 4), (8, 6), (12, 6), (16, 6), (12, 8), (16, 8))) {
      def p(j: Double) = 1.0 - math.pow(1.0 - math.pow(j, r), b)
      println(f"b=$b%2d r=$r: P(0.5)=${p(0.5)}%.4f P(0.6)=${p(0.6)}%.4f P(0.7)=${p(0.7)}%.4f " +
        f"P(0.8)=${p(0.8)}%.4f P(0.85)=${p(0.85)}%.4f P(0.9)=${p(0.9)}%.4f")
    }
    spark.stop()
  }
}
