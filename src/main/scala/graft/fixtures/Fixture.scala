package graft.fixtures

import java.sql.Timestamp
import java.util.Locale

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{LabeledPair, Page, PageTruth}
import graft.normalize.Normalize

/** Deterministic synthetic corpus per FIXTURES.md — single seed, no
  * wall-clock, generated *distributedly* (every row is a pure function of its
  * docId, so generation scales like a table scan instead of a driver loop).
  *
  * Mirrors the reference's table roles: record table (ItemInfo —
  * conver_test.py:22-41), labeled pair table (ItemPairs — split_data.py:47)
  * with 9:1 negative sampling + anti-join semantics
  * (scripts/make-splits.py:20-21,75-104), and the frozen embedding matrix
  * (create_map_matrix.py:10-39, row 0 = padding/unknown).
  */
object Fixture {
  val Seed = 42L
  val VocabSize = 5000
  val Dim = 32
  val NumDomains = 40

  /** Cluster sizes cycle (FIXTURES.md §2): most pages unique, tail up to 8. */
  val cycleSizes: Array[Int] = Array(1, 1, 1, 2, 2, 3, 5, 8)
  val bounds: Array[Int] = cycleSizes.scanLeft(0)(_ + _) // 0,1,2,3,5,7,10,15,23
  val CycleDocs: Int = bounds.last // 23
  val CycleEntities: Int = cycleSizes.length // 8

  private def mix(a: Long, b: Long): Long = {
    var x = a ^ (b * 0x9E3779B97F4A7C15L)
    x ^= (x >>> 32); x *= 0xFF51AFD7ED558CCDL; x ^= (x >>> 32)
    x
  }

  /** Seeded vocabulary of pronounceable lowercase words (normalization-stable). */
  lazy val vocab: Array[String] = {
    val r = new Random(Seed)
    val cons = Array("b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p", "r", "s", "t", "v", "w", "z")
    val vow = Array("a", "e", "i", "o", "u")
    val seen = mutable.LinkedHashSet.empty[String]
    while (seen.size < VocabSize) {
      val syll = 2 + r.nextInt(3)
      val sb = new StringBuilder
      var i = 0
      while (i < syll) { sb.append(cons(r.nextInt(cons.length))).append(vow(r.nextInt(vow.length))); i += 1 }
      if (r.nextBoolean()) sb.append(cons(r.nextInt(cons.length)))
      seen += sb.toString
    }
    seen.toArray
  }

  /** token string -> id (1-based; 0 reserved for unknown/padding). */
  lazy val vocabIndex: Map[String, Int] = vocab.zipWithIndex.map { case (w, i) => (w, i + 1) }.toMap

  /** Frozen embedding matrix (VocabSize+1 × Dim); row 0 all-zero (unknown).
    * Components iid uniform[-1,1) → zero-mean, so mean-composed vectors of
    * unrelated documents are near-orthogonal. */
  lazy val embeddingMatrix: Array[Array[Float]] = {
    val m = new Array[Array[Float]](VocabSize + 1)
    m(0) = new Array[Float](Dim)
    var i = 1
    while (i <= VocabSize) {
      val r = new Random(mix(Seed, 7919L * i))
      m(i) = Array.fill(Dim)((r.nextDouble() * 2 - 1).toFloat)
      i += 1
    }
    m
  }

  lazy val domains: Array[String] = (0 until NumDomains).map(i => s"site$i.example.com").toArray

  private def zipfIdx(r: Random, n: Int, alpha: Double = 2.0): Int =
    math.min(n - 1, (n * math.pow(r.nextDouble(), alpha)).toInt)

  private def entityOf(docId: Long): (Long, Int) = {
    val cycle = docId / CycleDocs
    val off = (docId % CycleDocs).toInt
    var idx = 0
    while (bounds(idx + 1) <= off) idx += 1
    (cycle * CycleEntities + idx, off - bounds(idx))
  }

  private def canonicalTokens(entityId: Long): Array[String] = {
    val er = new Random(mix(Seed, entityId * 2654435761L))
    val len = 30 + er.nextInt(91)
    Array.fill(len)(vocab(zipfIdx(er, VocabSize, 1.5)))
  }

  private def canonicalPrice(entityId: Long): Double = {
    val er = new Random(mix(Seed, entityId * 104729L + 13))
    (10 + er.nextInt(4990)) + er.nextInt(100) / 100.0
  }

  /** Perturbed copy: ≤3% token drop + ≤3% adjacent swap (FIXTURES.md §2). */
  private def perturb(tokens: Array[String], dr: Random): Array[String] = {
    val kept = tokens.filter(_ => dr.nextDouble() >= 0.03)
    val out = if (kept.length >= 20) kept.clone() else tokens.clone()
    var i = 0
    while (i < out.length - 1) {
      if (dr.nextDouble() < 0.03) { val t = out(i); out(i) = out(i + 1); out(i + 1) = t; i += 2 }
      else i += 1
    }
    out
  }

  /** Render tokens to text: sentence periods every ~12 tokens, casing noise on
    * duplicate copies, embedded dirty-numeric price field (format varies per
    * copy; value identical — exercises str_to_num semantics,
    * scripts/helpers.py:42-46). */
  private def render(tokens: Array[String], price: Double, copyIdx: Int, dr: Random): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < tokens.length) {
      var t = tokens(i)
      if (copyIdx > 0 && dr.nextDouble() < 0.05) t = t.capitalize
      sb.append(t)
      if (copyIdx > 0 && dr.nextDouble() < 0.04) sb.append(',')
      if ((i + 1) % 12 == 0) sb.append('.')
      if (i < tokens.length - 1) sb.append(' ')
      i += 1
    }
    val priceStr = copyIdx % 3 match {
      case 0 => String.format(Locale.US, "price $%.2f", Double.box(price))
      case 1 => String.format(Locale.US, "price %,.2f", Double.box(price))
      case _ => String.format(Locale.US, "price %.2f usd", Double.box(price))
    }
    sb.append(". ").append(priceStr).toString
  }

  private val BaseEpochMs = 1690000000000L

  /** Bytes of the planted per-entity "product photo" (embedded in html as a
    * base64 data URI). Canonical per entity; duplicate copies re-encode with
    * ~2% byte noise — so pooled features (Multimodal.imageVecFromHtml)
    * correlate strongly within an entity and are near-orthogonal across
    * entities: the fixture analog of the reference's per-item image set
    * (imagess/dir_image.py). */
  val ImgBytes = 1024
  private def entityImage(entityId: Long): Array[Byte] = {
    val r = new Random(mix(Seed, entityId * 7340033L + 5))
    val b = new Array[Byte](ImgBytes)
    r.nextBytes(b)
    b
  }

  /** n pages with planted ground truth, generated distributedly.
    *
    * Per-partition one-entity memo: docIds of the same entity are CONTIGUOUS
    * (entityOf is range arithmetic over the 23-doc cycle), so the canonical
    * tokens / price / image — pure functions of entityId — are computed once
    * per entity per partition instead of once per page copy (65% of pages
    * are copies). Outputs are byte-identical: the cached values are exactly
    * what the per-page recomputation produced, and the image is cloned
    * before the per-copy byte perturbation so the cached canonical bytes are
    * never mutated. */
  def pagesWithTruth(spark: SparkSession, n: Long, numPartitions: Int = 0): Dataset[PageTruth] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).mapPartitions { it =>
      var memoEntity = -1L
      var memoBase: Array[String] = null
      var memoPrice = 0.0
      var memoImg: Array[Byte] = null
      it.map { docId =>
        val (entityId, copyIdx) = entityOf(docId)
        if (entityId != memoEntity) {
          memoEntity = entityId
          memoBase = canonicalTokens(entityId)
          memoPrice = canonicalPrice(entityId)
          memoImg = entityImage(entityId)
        }
        val base = memoBase
        val price = memoPrice
        val dr = new Random(mix(Seed, docId * 0x9E3779B97F4A7C15L + 1))
        val tokens = if (copyIdx == 0) base else perturb(base, dr)
        val text = render(tokens, price, copyIdx, dr)
        val er = new Random(mix(Seed, entityId * 31L + 17))
        val domIdx = if (copyIdx == 0) zipfIdx(er, NumDomains)
                     else zipfIdx(dr, NumDomains) // re-hosted on a different (random) domain
        val url = s"https://${domains(domIdx)}/e$entityId/c$copyIdx"
        val ts = new Timestamp(BaseEpochMs + docId * 1000L)
        val img = if (copyIdx > 0) { // re-encoded copy: ~2% of bytes perturbed
          val c = memoImg.clone()
          var k = 0
          while (k < c.length) {
            if (dr.nextDouble() < 0.02) c(k) = dr.nextInt(256).toByte
            k += 1
          }
          c
        } else memoImg
        val imgB64 = java.util.Base64.getEncoder.encodeToString(img)
        val html = ("<html><body>" + text +
          "<img src=\"data:image/fake;base64," + imgB64 + "\"></body></html>")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val lang = if (entityId % 37 == 0) "ru" else "en"
        PageTruth(url, ts, html, text, lang, entityId)
      }
    }
  }

  def pages(spark: SparkSession, n: Long, numPartitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    pagesWithTruth(spark, n, numPartitions)
      .select("url", "warc_ts", "html", "text", "lang").as[Page]
  }

  /** Labeled pairs: all intra-cluster positives + deterministic 9:1 negatives
    * (same-domain where possible so the F1 gate evaluates the scorer, not the
    * blocker), anti-joined against positives (make-splits.py:75-104 semantics). */
  def labeledPairs(spark: SparkSession, pt: Dataset[PageTruth], negRatio: Int = 9): Dataset[LabeledPair] = {
    import spark.implicits._
    val urls = pt.select($"url", $"entity_id").cache()
    val pos = urls.as("a").join(urls.as("b"),
        $"a.entity_id" === $"b.entity_id" && $"a.url" < $"b.url")
      .select($"a.url".as("url1"), $"b.url".as("url2"))
    val nPos = pos.count()

    val withDom = urls.select($"url", Normalize.domain($"url").as("dom"),
      xxhash64($"url", lit(Seed)).as("r"))
    // pseudo-random pairing: within a hash-ordered window, pair each url with
    // its next `negRatio` successors (deterministic, distributed, no self-join)
    def windowPairs(partCol: org.apache.spark.sql.Column): DataFrame = {
      val w = Window.partitionBy(partCol).orderBy("r")
      // oversample leads (negRatio+4) so dedup/anti-join losses still leave
      // ≥ negRatio negatives per positive (make-splits.py:89-104 oversampling)
      val k = negRatio + 4
      val withLeads = withDom.select(
        ($"url" +: (1 to k).map(i => lead($"url", i).over(w).as(s"n$i"))): _*)
      withLeads
        .withColumn("nxt", explode(array((1 to k).map(i => col(s"n$i")): _*)))
        .where($"nxt".isNotNull && $"nxt" =!= $"url")
        .select(least($"url", $"nxt").as("url1"), greatest($"url", $"nxt").as("url2"))
    }
    val sameDom = windowPairs($"dom")
    val crossDom = windowPairs(pmod($"r", lit(16)))
    val negs = sameDom.unionByName(crossDom)
      .dropDuplicates("url1", "url2")
      .join(pos, Seq("url1", "url2"), "left_anti")
      .orderBy(xxhash64($"url1", $"url2", lit(Seed)))
      .limit((negRatio * nPos).toInt)
    pos.withColumn("label", lit(1))
      .unionByName(negs.withColumn("label", lit(0)))
      .select($"url1", $"url2", $"label".cast("int")).as[LabeledPair]
  }

  /** Embedding fixture as a table (token, id, vector) — parity with the
    * reference's pickled vocab+matrix artifact (create_map_matrix.py:10-39). */
  def embeddingsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    vocab.zipWithIndex.map { case (w, i) => (w, i + 1, embeddingMatrix(i + 1)) }
      .toSeq.toDF("token", "id", "vector")
  }
}
