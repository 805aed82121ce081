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

  test("urls unique; html wraps text + a data-uri image; lang mostly en") {
    val pt = Fixture.pagesWithTruth(spark, 2000).cache()
    assert(pt.select("url").distinct().count() == 2000)
    val h = decode($"html", "UTF-8")
    val bad = pt.where(!(h.startsWith(concat(lit("<html><body>"), $"text")) &&
      h.rlike("data:image/fake;base64,[A-Za-z0-9+/=]+")))
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

  test("planted media: same-entity images correlate, cross-entity near-orthogonal") {
    val pt = Fixture.pagesWithTruth(spark, 23 * 5).cache()
    val feats = pt.select($"url", $"entity_id",
      graft.operators.Multimodal.imageVecFromHtml($"html").as("img")).cache()
    val pairs = feats.as("a").join(feats.as("b"), $"a.url" < $"b.url")
      .select(($"a.entity_id" === $"b.entity_id").as("same"),
        graft.functions.GraftFunctions.cosine_sim($"a.img", $"b.img").as("c"))
    val sameMin = pairs.where($"same").agg(min("c")).as[Double].collect()(0)
    val diffAvg = pairs.where(!$"same").agg(avg(abs($"c"))).as[Double].collect()(0)
    // two noisy copies compound the ~2% byte noise: floor ≈ 0.83 at 5k pages
    assert(sameMin > 0.8, f"same-entity image cosine floor $sameMin%.3f")
    assert(diffAvg < 0.3, f"cross-entity |cosine| mean $diffAvg%.3f")
  }

  test("duplicate copies keep the same extractable price value") {
    val pt = Fixture.pagesWithTruth(spark, 23 * 10)
    val prices = pt.select($"entity_id", graft.normalize.Normalize.price($"text").as("p"))
      .groupBy("entity_id").agg(countDistinct("p").as("d"))
    assert(prices.where($"d" > 1).count() == 0)
  }
}
