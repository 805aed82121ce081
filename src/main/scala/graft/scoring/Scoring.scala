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
  * calibration (the Dense→softmax head, Deeper.py:356-377, fixed weights).
  * Kernel scratch buffers are allocated once per partition, not per pair —
  * at 10^9 pairs/executor the difference is the GC bill.
  */
object Scoring {

  /** Frozen calibration weights (the reference's trained dense head replaced
    * by fixed coefficients fit offline on the labeled fixture — CalibrateMain). */
  case class Weights(
      jw: Double = 3.0,
      lev: Double = 3.0,
      cos: Double = 7.0,
      num: Double = 1.5,
      bias: Double = -9.0,
      threshold: Double = 0.5)

  val LevCap = 200 // chars of normalized prefix entering edit distance (cost control)
  val TitleTokens = 8

  /** Per-page scoring attributes, computed once: title proxy, normalized
    * prefix, dirty-numeric price, composed frozen-embedding vector. Doing the
    * embedding composition here (instead of per pair) cuts kernel work by the
    * average block multiplicity — the decisive optimization at 10^12 pairs.
    * Tokenization runs inside the kernel (manual splitter, no per-row
    * Catalyst array materialization). */
  def attrs(spark: SparkSession, pages: DataFrame): Dataset[ScoreAttrs] = {
    import spark.implicits._
    val projected = pages.select(
      graft.blocking.Blocking.pageId.as("id"),
      col("url"),
      Normalize.normText(col("text")).as("norm"),
      Normalize.price(col("text")).as("price"))
    val bcVocab = spark.sparkContext.broadcast(Fixture.vocabIndex)
    val bcEmb = spark.sparkContext.broadcast(Fixture.embeddingMatrix)
    projected.as[(Long, String, String, Double)].mapPartitions { it =>
      val vocab = bcVocab.value
      val emb = bcEmb.value
      val dim = emb(0).length
      it.map { case (id, url, norm, price) =>
        val acc = new Array[Float](dim)
        var found = 0
        var nTok = 0
        var titleEnd = -1
        var start = 0
        var i = 0
        val n = norm.length
        // one pass: token walk → embedding accumulation + title boundary
        while (i <= n) {
          if (i == n || norm.charAt(i) == ' ') {
            if (i > start) {
              nTok += 1
              if (nTok == TitleTokens) titleEnd = i
              val tok = norm.substring(start, i)
              // fallback chain per reference record2idx (conver_test.py:181-198)
              val id0 = vocab.getOrElse(tok,
                vocab.getOrElse(tok.capitalize, vocab.getOrElse(tok.toUpperCase, 0)))
              if (id0 > 0) {
                val v = emb(id0)
                var j = 0
                while (j < dim) { acc(j) += v(j); j += 1 }
                found += 1
              }
            }
            start = i + 1
          }
          i += 1
        }
        if (found > 0) {
          var j = 0
          while (j < dim) { acc(j) /= found; j += 1 }
        }
        val title = if (titleEnd < 0) norm else norm.substring(0, titleEnd)
        val prefix = if (norm.length <= LevCap) norm else norm.substring(0, LevCap)
        ScoreAttrs(id, url, title, prefix, price, acc)
      }
    }
  }

  /** Per-partition scorer with reusable scratch (no per-pair allocation). */
  final class PairScorer(w: Weights, pairsScored: Option[LongAccumulator]) {
    private val prev = new Array[Int](LevCap + 1)
    private val cur = new Array[Int](LevCap + 1)

    private def lev(s1: String, s2: String): Double = {
      val n = math.min(s1.length, LevCap)
      val m = math.min(s2.length, LevCap)
      if (n == 0 && m == 0) return 1.0
      if (n == 0 || m == 0) return 0.0
      var j = 0
      while (j <= m) { prev(j) = j; j += 1 }
      var i = 1
      while (i <= n) {
        cur(0) = i
        val c1 = s1.charAt(i - 1)
        j = 1
        while (j <= m) {
          val cost = if (c1 == s2.charAt(j - 1)) 0 else 1
          var best = cur(j - 1) + 1
          val del = prev(j) + 1
          if (del < best) best = del
          val sub = prev(j - 1) + cost
          if (sub < best) best = sub
          cur(j) = best
          j += 1
        }
        System.arraycopy(cur, 0, prev, 0, m + 1)
        i += 1
      }
      1.0 - prev(m).toDouble / math.max(n, m)
    }

    def score(id1: Long, id2: Long, url1: String, url2: String,
              t1: String, t2: String, p1: String, p2: String,
              n1: Double, n2: Double,
              v1: Array[Float], v2: Array[Float]): ScoredPair = {
      pairsScored.foreach(_.add(1))
      val jw = Similarity.jaroWinkler(t1, t2)
      val lv = lev(p1, p2)
      val cos = Similarity.cosine(v1, v2)
      val num = Similarity.scaledInverseLp(n1, n2)
      val z = w.jw * jw + w.lev * lv + w.cos * cos + w.num * num + w.bias
      val s = 1.0 / (1.0 + math.exp(-z))
      // canonical url order (features are symmetric)
      if (url1 <= url2) ScoredPair(id1, id2, url1, url2, jw, lv, cos, num, s)
      else ScoredPair(id1, id2, url2, url1, jw, lv, cos, num, s)
    }
  }

  /** Enrich candidate pairs with both sides' attributes (the reference's
    * pair→record double left-join, split_data.py:77-99 — here two sort-merge
    * joins on the 64-bit id) and run the fused scoring kernel. */
  def score(
      spark: SparkSession,
      candidates: DataFrame, // id1, id2
      attrs: Dataset[ScoreAttrs],
      w: Weights = Weights(),
      pairsScored: Option[LongAccumulator] = None): Dataset[ScoredPair] = {
    import spark.implicits._
    val a = attrs.toDF()
    val enriched = candidates.select("id1", "id2")
      .join(a.as("a"), col("id1") === col("a.id"))
      .join(a.as("b"), col("id2") === col("b.id"))
      .select(
        col("id1"), col("id2"),
        col("a.url").as("u1"), col("b.url").as("u2"),
        col("a.title").as("t1"), col("b.title").as("t2"),
        col("a.prefix").as("p1"), col("b.prefix").as("p2"),
        col("a.price").as("n1"), col("b.price").as("n2"),
        col("a.vec").as("v1"), col("b.vec").as("v2"))
    enriched
      .as[(Long, Long, String, String, String, String, String, String, Double, Double, Array[Float], Array[Float])]
      .mapPartitions { it =>
        val scorer = new PairScorer(w, pairsScored)
        it.map { case (id1, id2, u1, u2, t1, t2, p1, p2, n1, n2, v1, v2) =>
          scorer.score(id1, id2, u1, u2, t1, t2, p1, p2, n1, n2, v1, v2)
        }
      }
  }

  /** Above-threshold pairs as the (numeric) edge table for clustering. */
  def edges(scored: Dataset[ScoredPair], threshold: Double): DataFrame =
    scored.toDF().where(col("score") >= threshold)
      .select(col("id1").as("src"), col("id2").as("dst"))
}
