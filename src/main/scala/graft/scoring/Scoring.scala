package graft.scoring

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.core.{ScoreAttrs, ScoredPair}
import graft.fixtures.Fixture
import graft.functions.Similarity
import graft.normalize.Normalize

/** Stage 2: batched pairwise scoring inside blocks.
  *
  * The reference's learned matcher (embedding layer + composition + similarity
  * nodes + dense head, Deeper.py:209-377) is re-expressed as a deterministic
  * fused kernel: broadcast frozen embedding lookup + 'average' composition
  * (Deeper.py:233-236) happens ONCE per page (not per pair), then a single
  * mapPartitions pass over enriched candidate pairs computes Jaro-Winkler,
  * capped Levenshtein, embedding cosine (Deeper.py:296-298) and the numeric
  * similarity family (Deeper.py:327-343), fused by a frozen logistic
  * calibration (the Dense→softmax head, Deeper.py:356-377, with fixed weights).
  */
object Scoring {

  /** Frozen calibration weights (the reference's trained dense head replaced
    * by fixed coefficients fit offline on the labeled fixture). */
  case class Weights(
      jw: Double = 3.0,
      lev: Double = 3.0,
      cos: Double = 7.0,
      num: Double = 1.5,
      bias: Double = -9.0,
      threshold: Double = 0.5)

  val LevCap = 200 // chars of normalized prefix entering edit distance (cost control)

  /** Per-page scoring attributes, computed once: title proxy, normalized
    * prefix, dirty-numeric price, composed frozen-embedding vector. Doing the
    * embedding composition here (instead of per pair) cuts kernel work by the
    * average block multiplicity — the decisive optimization at 10^12 pairs. */
  def attrs(spark: SparkSession, pages: DataFrame): Dataset[ScoreAttrs] = {
    import spark.implicits._
    val projected = pages.select(
      col("url"),
      Normalize.title(col("text")).as("title"),
      Normalize.prefix(col("text"), LevCap).as("prefix"),
      Normalize.price(col("text")).as("price"),
      Normalize.tokens(col("text")).as("toks"))
    val bcVocab = spark.sparkContext.broadcast(Fixture.vocabIndex)
    val bcEmb = spark.sparkContext.broadcast(Fixture.embeddingMatrix)
    projected.as[(String, String, String, Double, Seq[String])].mapPartitions { it =>
      val vocab = bcVocab.value
      val emb = bcEmb.value
      val dim = emb(0).length
      it.map { case (url, title, prefix, price, toks) =>
        val acc = new Array[Float](dim)
        var found = 0
        toks.foreach { t =>
          // fallback chain per reference record2idx (conver_test.py:181-198):
          // as-is -> Capitalized -> UPPER; unknown -> 0 (masked)
          val id = vocab.getOrElse(t,
            vocab.getOrElse(t.capitalize, vocab.getOrElse(t.toUpperCase, 0)))
          if (id > 0) {
            val v = emb(id)
            var i = 0
            while (i < dim) { acc(i) += v(i); i += 1 }
            found += 1
          }
        }
        if (found > 0) {
          var i = 0
          while (i < dim) { acc(i) /= found; i += 1 }
        }
        ScoreAttrs(url, title, prefix, price, acc)
      }
    }
  }

  /** Enrich candidate pairs with both sides' attributes (the reference's
    * pair→record double left-join, split_data.py:77-99 — here a sort-merge
    * join on url, the natural shuffle key) and run the fused scoring kernel. */
  def score(
      spark: SparkSession,
      candidates: DataFrame, // url1, url2
      attrs: Dataset[ScoreAttrs],
      w: Weights = Weights(),
      pairsScored: Option[LongAccumulator] = None): Dataset[ScoredPair] = {
    import spark.implicits._
    val a = attrs.toDF()
    val enriched = candidates.select("url1", "url2")
      .join(a.as("a"), col("url1") === col("a.url"))
      .join(a.as("b"), col("url2") === col("b.url"))
      .select(
        col("url1"), col("url2"),
        col("a.title").as("t1"), col("b.title").as("t2"),
        col("a.prefix").as("p1"), col("b.prefix").as("p2"),
        col("a.price").as("n1"), col("b.price").as("n2"),
        col("a.vec").as("v1"), col("b.vec").as("v2"))
    enriched
      .as[(String, String, String, String, String, String, Double, Double, Array[Float], Array[Float])]
      .mapPartitions { it =>
        it.map { case (url1, url2, t1, t2, p1, p2, n1, n2, v1, v2) =>
          pairsScored.foreach(_.add(1))
          val jw = Similarity.jaroWinkler(t1, t2)
          val lev = Similarity.levenshteinSim(p1, p2, LevCap)
          val cos = Similarity.cosine(v1, v2)
          val num = Similarity.scaledInverseLp(n1, n2)
          val z = w.jw * jw + w.lev * lev + w.cos * cos + w.num * num + w.bias
          val s = 1.0 / (1.0 + math.exp(-z))
          ScoredPair(url1, url2, jw, lev, cos, num, s)
        }
      }
  }

  /** Above-threshold pairs as the edge table for clustering. */
  def edges(scored: Dataset[ScoredPair], threshold: Double): DataFrame =
    scored.toDF().where(col("score") >= threshold)
      .select(col("url1").as("src"), col("url2").as("dst"))
}
