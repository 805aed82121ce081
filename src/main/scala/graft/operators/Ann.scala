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

  /** LSH-bucketed ANN: corpus rows land in one bucket per hash table; each
    * query probes its bucket plus all hamming-1 neighbors in every table
    * (`tables` independent SRP codes — the standard L-tables LSH recall
    * lever). Approximate — recall measured against [[bruteTopK]] in tests. */
  def srpTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nBits: Int = 8, tables: Int = 3, seed: Long = 42L): DataFrame = {
    def bucketCol(t: Int, v: org.apache.spark.sql.Column) =
      GraftFunctions.srp_bucket(v, nBits, seed + 7919L * t)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), bucketCol(t, col(vecCol)).as("b"))): _*)).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(flatten(array((0 until tables).map(t =>
        transform(probes(bucketCol(t, col(vecCol)), nBits),
          b => struct(lit(t).as("t"), b.as("b")))): _*))).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        GraftFunctions.cosine_sim(col("qv"), col("cv")).as("cosine"))
      .dropDuplicates("query_id", "corpus_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
