package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[bruteTopK]]: exact baseline — broadcast the (small) query set against
  *   the corpus, cosine via the codegen'd CosineSimExpr, per-query top-k via
  *   window. Corpus-side scan parallelism is preserved (no corpus shuffle
  *   until the final per-query top-k, which is k·|queries| rows).
  * - [[srpTopK]]: scale path — sign-random-projection buckets with
  *   multiprobe (hamming-1 neighbors), so each query only scores its bucket
  *   family instead of the full corpus.
  */
object Ann {

  /** Exact top-k neighbors per query by cosine (ties broken by corpus id). */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        GraftFunctions.cosine_sim(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Hamming-1 multiprobe buckets of an SRP code. */
  private def probes(bucket: org.apache.spark.sql.Column, nBits: Int) =
    array((bucket +: (0 until nBits).map(i =>
      bucket.bitwiseXOR(lit(1 << i)))): _*)

  private def bucketCol(t: Int, v: org.apache.spark.sql.Column, nBits: Int, seed: Long) =
    GraftFunctions.srp_bucket(v, nBits, seed + 7919L * t)

  /** Corpus entries exploded to one row per (table, bucket). */
  private def corpusEntries(corpus: DataFrame, idCol: String, vecCol: String,
                            nBits: Int, tables: Int, seed: Long): DataFrame =
    corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), bucketCol(t, col(vecCol), nBits, seed).as("b"))): _*)).as("bucket"))

  /** LSH-bucketed ANN: corpus rows land in one bucket per hash table; each
    * query probes its bucket plus all hamming-1 neighbors in every table
    * (`tables` independent SRP codes — the standard L-tables LSH recall
    * lever). Approximate — recall measured against [[bruteTopK]] in tests.
    *
    * `bucketCap` bounds corpus rows per (table, bucket): embeddings cluster
    * at web scale, and a dense corpus bucket crossed with ~(nBits+1) probe
    * rows per query otherwise concentrates in a handful of join tasks.
    * Oversized cells keep a deterministic hash-sampled ~cap subset (each of
    * the `tables` codes samples independently, so a row dropped from one
    * table's cell usually survives the others); drops are counted via
    * [[srpBucketStats]], never silent. 0 disables. */
  def srpTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nBits: Int = 8, tables: Int = 3, seed: Long = 42L,
              bucketCap: Int = 4096): DataFrame = {
    val c = corpusEntries(corpus, idCol, vecCol, nBits, tables, seed)
    // cap via partial-agg sizes + equi-join-back + hash filter (the blocking
    // pattern): no per-bucket sort, no window — nothing re-concentrates the
    // hot cell while bounding it
    val capped =
      if (bucketCap <= 0) c
      else {
        val sizes = c.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
        c.join(sizes, "bucket")
          .where(col("bucket_n") <= bucketCap ||
            pmod(xxhash64(col("corpus_id"), lit(seed)), col("bucket_n")) < bucketCap)
          .drop("bucket_n")
      }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(flatten(array((0 until tables).map(t =>
        transform(probes(bucketCol(t, col(vecCol), nBits, seed), nBits),
          b => struct(lit(t).as("t"), b.as("b")))): _*))).as("bucket"))
    // explicit broadcast of the QUERY side: both join inputs are
    // explode-replicated, so static size estimates are unreliable either way
    // (see saltedSelfJoinPairs' merge-hint note) — but here the intended
    // asymmetry is structural: queries × tables × (nBits+1) probes is small
    // by contract (bruteTopK already broadcasts q), while the capped corpus
    // entries are corpus-sized and must never be the build side
    val scored = capped.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        GraftFunctions.cosine_sim(col("qv"), col("cv")).as("cosine"))
      .dropDuplicates("query_id", "corpus_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Corpus-side bucket-occupancy lineage for [[srpTopK]] (the
    * Blocking.blockStats pattern): cells built, hottest cell, and the entries
    * the cap drops — so capped recall loss is observable, never silent. */
  def srpBucketStats(corpus: DataFrame, idCol: String, vecCol: String,
                     nBits: Int = 8, tables: Int = 3, seed: Long = 42L,
                     bucketCap: Int = 4096): Map[String, Long] = {
    val c = corpusEntries(corpus, idCol, vecCol, nBits, tables, seed)
    // ONE sizes aggregate, persisted for the (at most) two short actions
    // below — the round-3 version re-aggregated the corpus entries per
    // consumer; max() coalesces to 0 so an empty corpus reports zeros
    // instead of an NPE on the null aggregate
    val sizes = c.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val row = sizes.agg(
          count(lit(1)).as("buckets_built"),
          coalesce(max(col("bucket_n")), lit(0L)).as("max_bucket_size"))
        .collect()(0)
      val dropped =
        if (bucketCap <= 0) 0L
        else c.join(sizes, "bucket")
          .where(col("bucket_n") > bucketCap &&
            !(pmod(xxhash64(col("corpus_id"), lit(seed)), col("bucket_n")) < bucketCap))
          .count()
      Map(
        "buckets_built" -> row.getLong(0),
        "max_bucket_size" -> row.getLong(1),
        "entries_dropped" -> dropped)
    } finally sizes.unpersist(blocking = false)
  }
}
