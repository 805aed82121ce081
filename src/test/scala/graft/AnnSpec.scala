package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    .select($"vec_id", $"embedding").cache()

  test("brute-force top-k: k rows per query, descending cosine, no self") {
    val queries = emb.where($"vec_id" < 5)
    val got = Ann.bruteTopK(emb, queries, "vec_id", "embedding", k = 5).cache()
    assert(got.groupBy("query_id").count().where($"count" =!= 5).count() == 0)
    assert(got.where($"query_id" === $"corpus_id").count() == 0)
    // ranks are ordered by cosine desc within each query
    val bad = got.as("a").join(got.as("b"),
      $"a.query_id" === $"b.query_id" && $"a.rank" < $"b.rank" &&
        $"a.cosine" < $"b.cosine")
    assert(bad.count() == 0)
  }

  test("SRP-LSH top-k: recall@5 vs brute force is meaningfully high") {
    val queries = emb.where($"vec_id" < 20)
    val brute = Ann.bruteTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id")
    val lsh = Ann.srpTopK(emb, queries, "vec_id", "embedding", k = 5, nBits = 6)
      .select("query_id", "corpus_id")
    val hits = brute.join(lsh, Seq("query_id", "corpus_id"), "left_semi").count()
    val total = brute.count()
    val recall = hits.toDouble / total
    info(f"SRP recall@5 = $recall%.3f ($hits/$total)")
    // random vectors are a worst case for LSH; still must beat random scan
    assert(recall >= 0.3, f"recall $recall%.3f too low")
  }

  test("SRP-LSH bucket cap bounds a planted dense bucket, drops counted") {
    val n = 500
    val cap = 50
    // identical-direction corpus: one dense (table, bucket) cell per table
    val dense = (0 until n).map(i => (i.toLong, Array.tabulate(8)(j => (j + 1).toFloat)))
    val corpus = dense.toDF("vec_id", "v")
    val queries = dense.take(3).toDF("vec_id", "v")
    val stats = Ann.srpBucketStats(corpus, "vec_id", "v",
      nBits = 8, tables = 3, seed = 42L, bucketCap = cap)
    assert(stats("max_bucket_size") == n.toLong) // the hot cell is real...
    assert(stats("entries_dropped") > 0) // ...and the cap visibly drops
    // hash sampling keeps ~cap per cell (allow variance, never ~n)
    val kept = 3L * n - stats("entries_dropped")
    assert(kept <= 3L * 3 * cap, s"kept $kept of ${3 * n} (cap=$cap)")
    // the operator still returns k rows per query out of the sampled cell
    val topk = Ann.srpTopK(corpus, queries, "vec_id", "v", k = 5,
      nBits = 8, tables = 3, bucketCap = cap)
    assert(topk.groupBy("query_id").count().where($"count" =!= 5).count() == 0)
  }

  test("srpBucketStats on an empty corpus reports zeros (no NPE)") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "v")
    val stats = Ann.srpBucketStats(empty, "vec_id", "v", bucketCap = 10)
    assert(stats("buckets_built") == 0L)
    assert(stats("max_bucket_size") == 0L)
    assert(stats("entries_dropped") == 0L)
  }

  test("srp_bucket on array<double> matches the float buckets (typed kernel)") {
    // double vectors must route to the double kernel: an unconditional
    // getFloat over double storage reads 4-byte halves of 8-byte lanes and
    // yields garbage buckets (silent recall loss on the public surface)
    val both = emb.select(
      graft.functions.GraftFunctions.srp_bucket($"embedding".cast("array<float>"), 8, 42L).as("bf"),
      graft.functions.GraftFunctions.srp_bucket($"embedding".cast("array<double>"), 8, 42L).as("bd"))
    assert(both.where($"bf" =!= $"bd").count() == 0)
    // and the bucketed ANN path stays functional end-to-end on doubles
    val dEmb = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val queries = dEmb.where($"vec_id" < 10)
    val brute = Ann.bruteTopK(dEmb, queries, "vec_id", "v", k = 5)
      .select("query_id", "corpus_id")
    val lsh = Ann.srpTopK(dEmb, queries, "vec_id", "v", k = 5, nBits = 6)
      .select("query_id", "corpus_id")
    val recall = brute.join(lsh, Seq("query_id", "corpus_id"), "left_semi").count()
      .toDouble / brute.count()
    info(f"double-vector SRP recall@5 = $recall%.3f")
    assert(recall >= 0.3, f"recall $recall%.3f too low — double lane broken?")
  }

  test("vector kernels reject non-float/double array inputs at ANALYSIS time (round-5 ADVICE)") {
    // srp_bucket over array<int> previously routed to the double kernel —
    // getDouble over int storage reads garbage lanes and emits deterministic
    // wrong buckets (silent recall loss); now a checkInputDataTypes failure
    import graft.functions.GraftFunctions
    val ints = spark.range(4).select(array($"id".cast("int")).as("v"))
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(GraftFunctions.srp_bucket($"v", 8, 42L)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(GraftFunctions.cosine_sim($"v", $"v")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(GraftFunctions.inverse_l1($"v", $"v")).collect()
    }
    // the two legitimate element types still analyze and run
    val fl = spark.range(4).select(array($"id".cast("float")).as("v"))
    val db = spark.range(4).select(array($"id".cast("double")).as("v"))
    assert(fl.select(GraftFunctions.srp_bucket($"v", 8, 42L)).count() == 4)
    assert(db.select(GraftFunctions.cosine_sim($"v", $"v")).count() == 4)
  }

  test("multi-table embedding near-dup: recall >= 0.9 at tau=0.9 where single-table cliffs") {
    // planted near-dup corpus: 200 base vectors (dim 32), each with one noisy
    // copy at cosine >= 0.9 — the regime embedding near-dup exists for. The
    // analytical candidate recall at tau = 0.9 (p = 1 - acos(.9)/pi = .856):
    // single table nBits=12 -> p^12 = 0.16; nBits=8 x 12 tables -> 0.98.
    val rnd = new scala.util.Random(20260817L)
    val dim = 32
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = (0 until 200).flatMap { i =>
      val base = unit(Array.fill(dim)(rnd.nextGaussian()))
      // perturb along a random orthogonal-ish direction, then renormalize;
      // eps chosen so cosine lands in [0.9, 0.98]
      val eps = 0.25 + rnd.nextDouble() * 0.15
      val noise = Array.fill(dim)(rnd.nextGaussian() * eps / math.sqrt(dim))
      val copy = unit(base.zip(noise).map { case (a, b) => a + b })
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, copy))
    }
    val df = rows.toDF("vec_id", "embedding")
    val exact = graft.operators.Dedup
      .embeddingNearDup(df, "vec_id", "embedding", tau = 0.9, nBits = 0)
      .select("id1", "id2").cache()
    val nExact = exact.count()
    assert(nExact >= 150, s"planted corpus only produced $nExact pairs >= 0.9")
    def recallOf(nBits: Int, tables: Int): Double = {
      val got = graft.operators.Dedup.embeddingNearDup(
        df, "vec_id", "embedding", tau = 0.9, nBits = nBits, tables = tables)
        .select("id1", "id2")
      got.intersect(exact).count().toDouble / nExact
    }
    val single = recallOf(12, 1)
    val multi = recallOf(8, 12)
    info(f"recall tau=0.9: single-table(12 bits)=$single%.3f multi(8x12)=$multi%.3f")
    assert(multi >= 0.9, f"multi-table recall $multi%.3f below gate")
    assert(multi > single, "tables lever did not raise recall")
    // precision is structural: same exact-cosine filter on both paths
    val lsh = graft.operators.Dedup.embeddingNearDup(
      df, "vec_id", "embedding", tau = 0.9, nBits = 8, tables = 12)
      .select("id1", "id2")
    assert(lsh.except(exact).count() == 0, "LSH emitted a pair the exact path lacks")
  }

  test("SRP-LSH scans far fewer candidates than brute force") {
    // bucket histogram: no bucket should hold a large fraction of the corpus
    val bucketed = emb.select(
      graft.functions.GraftFunctions.srp_bucket($"embedding", 6, 42L).as("b"))
      .groupBy("b").count()
    val maxBucket = bucketed.agg(max("count")).as[Long].collect()(0)
    val totalRows = emb.count()
    assert(maxBucket < totalRows / 2, s"degenerate SRP bucketing: $maxBucket/$totalRows")
  }
}
