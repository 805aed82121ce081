package graft

import org.apache.spark.sql.functions._

import graft.fixtures.Fixture

class FixtureSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic: two generations are byte-identical") {
    val a = Fixture.pages(spark, 1000).agg(expr("bit_xor(xxhash64(url, text, lang))"))
      .as[Long].collect()(0)
    val b = Fixture.pages(spark, 1000).agg(expr("bit_xor(xxhash64(url, text, lang))"))
      .as[Long].collect()(0)
    assert(a == b)
  }

  test("partitioning-independent: same rows at different parallelism") {
    val a = Fixture.pages(spark, 1000, numPartitions = 2)
      .agg(expr("bit_xor(xxhash64(url, text, lang))")).as[Long].collect()(0)
    val b = Fixture.pages(spark, 1000, numPartitions = 16)
      .agg(expr("bit_xor(xxhash64(url, text, lang))")).as[Long].collect()(0)
    assert(a == b)
  }

  test("cluster size histogram follows the {1,1,1,2,2,3,5,8} cycle") {
    val n = 23 * 40L // exactly 40 cycles
    val hist = Fixture.pagesWithTruth(spark, n)
      .groupBy("entity_id").count()
      .groupBy("count").count()
      .as[(Long, Long)].collect().toMap
    assert(hist == Map(1L -> 120L, 2L -> 80L, 3L -> 40L, 5L -> 40L, 8L -> 40L))
  }

  test("urls unique; html wraps text; lang mostly en") {
    val pt = Fixture.pagesWithTruth(spark, 2000).cache()
    assert(pt.select("url").distinct().count() == 2000)
    val bad = pt.where(decode($"html", "UTF-8") =!= concat(lit("<html><body>"), $"text", lit("</body></html>")))
    assert(bad.count() == 0)
    val langs = pt.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(langs("en") > 1800)
    assert(langs.getOrElse("ru", 0L) > 0)
  }

  test("labeled pairs: positives complete, negatives ~9:1, no overlap, canonical order") {
    val pt = Fixture.pagesWithTruth(spark, 23 * 20).cache()
    val lp = Fixture.labeledPairs(spark, pt).cache()
    val nPos = lp.where($"label" === 1).count()
    val nNeg = lp.where($"label" === 0).count()
    assert(nPos == 43L * 20) // 0+0+0+1+1+3+10+28 per cycle
    assert(nNeg >= 8 * nPos && nNeg <= 9 * nPos, s"neg ratio off: $nNeg vs $nPos")
    assert(lp.where($"url1" >= $"url2").count() == 0)
    // no pair is both positive and negative
    assert(lp.groupBy("url1", "url2").count().where($"count" > 1).count() == 0)
    // every positive joins two pages of the same entity
    val truth = pt.select($"url", $"entity_id")
    val wrong = lp.where($"label" === 1)
      .join(truth.as("a"), $"url1" === $"a.url")
      .join(truth.as("b"), $"url2" === $"b.url")
      .where($"a.entity_id" =!= $"b.entity_id")
    assert(wrong.count() == 0)
  }

  test("duplicate copies keep the same extractable price value") {
    val pt = Fixture.pagesWithTruth(spark, 23 * 10)
    val prices = pt.select($"entity_id", graft.normalize.Normalize.price($"text").as("p"))
      .groupBy("entity_id").agg(countDistinct("p").as("d"))
    assert(prices.where($"d" > 1).count() == 0)
  }
}
