package graft

import org.apache.spark.sql.functions._

import graft.blocking.Blocking

class BlockingSpec extends SparkSpec {
  import spark.implicits._

  /** Exhaustive pair coverage under salting: an oversized block must emit
    * every unordered pair exactly once (SURVEY §7.5.1 — the subtle part). */
  test("salted self-join: full pair coverage, each pair exactly once") {
    val n = 300 // with cap=64 → k=5 salt buckets
    val blocks = (0 until n).map(i => ("B", f"url$i%04d")).toDF("block_key", "url")
    val cfg = Blocking.Config(cap = 64, maxBlock = 4096)
    val pairs = Blocking.candidatePairs(blocks, cfg).collect()
    assert(pairs.length == n * (n - 1) / 2, s"expected ${n * (n - 1) / 2}, got ${pairs.length}")
    // canonical order and uniqueness
    val asSet = pairs.map(r => (r.getString(0), r.getString(1))).toSet
    assert(asSet.size == pairs.length)
    assert(pairs.forall(r => r.getString(0) < r.getString(1)))
  }

  test("small blocks (n <= cap) take the k=1 fast path") {
    val blocks = Seq(("A", "u1"), ("A", "u2"), ("A", "u3")).toDF("block_key", "url")
    val got = Blocking.candidatePairs(blocks, Blocking.Config(cap = 64))
      .select("url1", "url2").as[(String, String)].collect().toSet
    assert(got == Set(("u1", "u2"), ("u1", "u3"), ("u2", "u3")))
  }

  test("pairs found via multiple blocks are deduped") {
    val blocks = Seq(("A", "u1"), ("A", "u2"), ("B", "u1"), ("B", "u2"))
      .toDF("block_key", "url")
    val got = Blocking.candidatePairs(blocks, Blocking.Config())
      .select("url1", "url2").as[(String, String)].collect().toSeq
    assert(got == Seq(("u1", "u2")))
  }

  test("singleton blocks emit nothing; oversized blocks are dropped (not silent)") {
    val big = (0 until 50).map(i => ("BIG", s"u$i"))
    val blocks = (Seq(("S", "solo")) ++ big).toDF("block_key", "url")
    val cfg = Blocking.Config(cap = 8, maxBlock = 20)
    assert(Blocking.candidatePairs(blocks, cfg).count() == 0)
    val stats = Blocking.blockStats(blocks, cfg)
    assert(stats("blocks_dropped") == 1)
    assert(stats("blocks_built") == 2)
    assert(stats("max_block_size") == 50)
  }

  test("block table: duplicates share all minhash bands; unrelated do not") {
    val text = "the quick brown fox jumps over the lazy dog and runs far away home"
    val pages = Seq(
      ("https://a.com/1", text),
      ("https://b.com/2", text), // identical text, different host
      ("https://c.com/3", "completely unrelated content about database query engines")
    ).toDF("url", "text")
    val cfg = Blocking.Config()
    val bt = Blocking.blockTable(pages, cfg)
    val mh = bt.where($"block_key".startsWith("mh:"))
      .groupBy("block_key").agg(collect_set("url").as("urls"))
    val shared12 = mh.where(array_contains($"urls", "https://a.com/1") &&
      array_contains($"urls", "https://b.com/2")).count()
    val shared13 = mh.where(array_contains($"urls", "https://a.com/1") &&
      array_contains($"urls", "https://c.com/3")).count()
    assert(shared12 == cfg.bands.toLong) // identical text → all bands shared
    assert(shared13 == 0L)
  }

  test("pair budget bounded: 10k fixture pages yield < 60k candidates") {
    val pages = graft.fixtures.Fixture.pages(spark, 10000).toDF()
    val cfg = Blocking.Config()
    val nPairs = Blocking.candidatePairs(Blocking.blockTable(pages, cfg), cfg).count()
    assert(nPairs < 60000, s"candidate blowup: $nPairs")
    assert(nPairs > 10000, s"suspiciously few candidates: $nPairs")
  }
}
