package graft.core

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Core typed schemas of the linkage engine.
  *
  * Input row shape follows the engine contract (Common-Crawl-style web page);
  * the reference's record table is the analogous `itemID/title/description/...`
  * frame (reference: conver_test.py:22-41, split_data.py:46-59).
  */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** Page plus planted ground-truth entity (fixture-only; never read by the pipeline). */
case class PageTruth(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String,
                     entity_id: Long)

/** Labeled evaluation pair (reference: ItemPairs_train.csv — split_data.py:47,63-65). */
case class LabeledPair(url1: String, url2: String, label: Int)

/** One (block key, member) entry of the salted block table. */
case class BlockEntry(block_key: String, url: String)

/** Candidate pair emitted by block-local self-join, canonical url1 < url2. */
case class CandidatePair(url1: String, url2: String)

/** 128-bit page id: two independent xxhash64 lanes over the url. 64 bits is
  * birthday-bound at the 10^12-page north star (collisions EXPECTED, silently
  * merging clusters); 128 bits keeps P(any collision) < 10^-14 while the
  * struct still hashes/compares natively in shuffles, joins, and CC. */
case class PageId(hi: Long, lo: Long)

/** Per-page scoring attributes, computed once (not per pair). `id` is the
  * 128-bit page id ([[PageId]]); `vec` is the composed frozen-embedding
  * vector (reference composition 'average', Deeper.py:233-236, via broadcast
  * lookup). `price_isna` / `text_isna` are the P7 missingness indicators the
  * scorer uses to gate the numeric and text/embedding similarity families
  * (the reference emits an isna column per converted field,
  * Deeper.py:139-149; text_isna = the page normalized to zero tokens). */
case class ScoreAttrs(id: PageId, url: String, title: String, prefix: String,
                      price: Double, price_isna: Int, text_isna: Int,
                      vec: Array[Float], img: Array[Float])

/** Scored candidate pair (FIXTURES.md §5 scored_pairs shape, plus the
  * numeric pair ids that downstream clustering shuffles instead of urls).
  * Feature family per the reference: jw/lev string sims (north-star), cosine
  * + inverse-L1 over composed embeddings (Deeper.py:296-305), scaled-inverse
  * + min-max-ratio numeric sims on price (Deeper.py:327-343), cosine +
  * inverse-L1 + inverse-L2 over pooled media vectors (the image-augmented
  * head, deeper_models.py:632-655; zero when either side lacks media). */
case class ScoredPair(id1: PageId, id2: PageId, url1: String, url2: String,
                      jaro_winkler: Double, levenshtein_sim: Double,
                      cosine: Double, inv_l1: Double,
                      num_sim: Double, mmr: Double,
                      img_cos: Double, img_l1: Double, img_l2: Double,
                      score: Double)

case class Edge(src: String, dst: String)

/** Final transitive-cluster assignment; cluster_id = min url in the cluster. */
case class ClusterAssignment(url: String, cluster_id: String)

/** Pairwise evaluation result (reference metric semantics: train_deeper.py:36-39). */
case class PairMetrics(tp: Long, fp: Long, fn: Long, tn: Long) {
  def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
  def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
  def f1: Double = {
    val p = precision; val r = recall
    if (p + r == 0) 0.0 else 2 * p * r / (p + r)
  }
}

object Sessions {
  /** Local session sized to the sandbox: shuffle partitions = cores (not 200),
    * AQE on (runtime coalesce + skew-join backstop). */
  def local(cores: Int, appName: String = "graft"): SparkSession =
    build(Some(cores), appName)

  /** spark-submit-aware session: if a master was provided externally
    * (spark-submit --master / --num-executors), respect it and its
    * parallelism; otherwise fall back to local[cores]. */
  def auto(cores: Int, appName: String = "graft"): SparkSession =
    build(if (sys.props.contains("spark.master")) None else Some(cores), appName)

  private def build(localCores: Option[Int], appName: String): SparkSession = {
    val b0 = SparkSession.builder().appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val b = localCores match {
      case Some(c) => b0.master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.ui.enabled", "false")
      case None => b0 // cluster: let spark-submit set master/partitions/UI
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    spark
  }
}

object Tables {
  /** Read one of the driver-generated testdata tables. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
