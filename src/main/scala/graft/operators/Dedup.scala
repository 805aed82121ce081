package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deduplication operators for large-scale training-data pipelines.
  * All are DataFrame-native (shuffle on content keys, no driver loops):
  *
  *  - exact:       hash-groupBy on text (one shuffle)
  *  - MinHash-LSH: shingle→minhash→band→bucket-join (the ER blocking path,
  *                 generalized to any id/text pair)
  *  - SimHash:     64-bit fingerprint, banded into 16-bit chunks for
  *                 hamming-distance blocking
  *  - n-gram Jaccard: token-set overlap verification within blocks
  *  - embedding cosine: SRP-LSH bucketed near-duplicate vectors
  */
object Dedup {

  /** Exact duplicate groups: every row mapped to its group representative
    * (min id), plus the group size. One hash-partitioned aggregation. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_key"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("group_size"))

  /** Summary counters of exact dedup (groups, duplicate rows removable). */
  def exactSummary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(df, idCol, textCol).agg(
      count(lit(1)).as("n_groups"),
      sum(col("group_size") - 1).as("n_dup_rows"))

  /** MinHash-LSH candidate pairs over character 3-gram shingles: rows
    * sharing any LSH band key become a candidate (id1 < id2, deduped). */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        bands: Int = 16, rows: Int = 6, seed: Long = 42L): DataFrame = {
    val blocks = df.select(col(idCol).as("id"),
      explode(GraftFunctions.minhash_bands(lower(col(textCol)), bands, rows, seed))
        .as("band_key"))
    val l = blocks.as("l"); val r = blocks.as("r")
    l.join(r, col("l.band_key") === col("r.band_key") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .dropDuplicates("id1", "id2")
  }

  /** Token n-gram Jaccard similarity column between two token-array columns
    * (distinct-set semantics, matching both engines' intersect). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - inter
    when(union === 0, lit(1.0)).otherwise(inter / union)
  }

  private def tokenNgrams(textCol: Column, n: Int): Column = {
    val toks = split(lower(textCol), " ")
    if (n == 1) array_distinct(toks)
    else {
      // sliding token windows joined by ''
      val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
      array_distinct(transform(idx, i =>
        concat_ws("", slice(toks, i + 1, lit(n)))))
    }
  }

  /** Near-duplicate pairs by token n-gram Jaccard ≥ tau, blocked by
    * `blockCols` (never all-pairs: the self-join is block-local). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], n: Int, tau: Double): DataFrame = {
    val withSets = df.select((col(idCol).as("id") +:
      tokenNgrams(col(textCol), n).as("grams") +:
      blockCols.map(col)): _*)
    val joinCond = blockCols.map(c => col(s"l.$c") === col(s"r.$c"))
      .reduceOption(_ && _).getOrElse(lit(true)) && col("l.id") < col("r.id")
    withSets.as("l").join(withSets.as("r"), joinCond)
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        jaccard(col("l.grams"), col("r.grams")).as("jaccard"))
      .where(col("jaccard") >= tau)
  }

  /** SimHash near-duplicate candidates: 64-bit simhash banded into four
    * 16-bit chunks — any pair within hamming distance ≤ 3 of each other
    * shares at least one chunk (pigeonhole), then exact hamming filter. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3, seed: Long = 0L): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding guarantees recall only for hamming <= 3")
    val withSim = df.select(col(idCol).as("id"),
      GraftFunctions.simhash64(lower(col(textCol)), seed).as("simhash"))
    val banded = withSim.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL)).as("v"))): _*))
        .as("band"))
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        col("l.simhash").as("s1"), col("r.simhash").as("s2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .where(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Embedding near-duplicate pairs: SRP-LSH bucket join (scale path — a
    * bucketed shuffle instead of an all-pairs cross join), exact-cosine
    * verified. `nBits = 0` degrades to brute force (testing / tiny inputs). */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       tau: Double, nBits: Int = 12, seed: Long = 42L): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val bucketed =
      if (nBits <= 0) base.withColumn("bucket", lit(0))
      else base.withColumn("bucket", GraftFunctions.srp_bucket(col("v"), nBits, seed))
    val l = bucketed.as("l"); val r = bucketed.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        GraftFunctions.cosine_sim(col("l.v"), col("r.v")).as("cosine"))
      .where(col("cosine") >= tau)
      .dropDuplicates("id1", "id2")
  }
}
