package graft

import org.apache.spark.sql.functions._

import graft.normalize.Normalize

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("text").select(Normalize.normText($"text")).as[String].collect()(0)

  test("golden: punctuation padded, lowered, whitespace collapsed") {
    assert(norm("Hello,World!  Great") == "hello , world ! great")
    assert(norm("a(b)c") == "a ( b ) c")
    assert(norm("  many   spaces\t\tand\ntabs ") == "many spaces and tabs")
  }

  test("golden: html entities unescaped (clean_text semantics)") {
    assert(norm("a &amp; b") == "a & b")
    assert(norm("x &lt;tag&gt;") == "x < tag >")
    assert(norm("it&#39;s") == "it 's")
  }

  test("golden: possessive 's split like the reference") {
    assert(norm("John's book") == "john 's book")
  }

  test("idempotence: normalizing twice equals once") {
    val samples = Seq("Hello, World!", "a&amp;b (c)", "John's  dog&#39;s", "x.y.z;q",
      "price $1,234.56 usd", "ALL CAPS!!!")
    val once = samples.toDF("text").select(Normalize.normText($"text").as("n")).as[String].collect()
    val twice = once.toSeq.toDF("text").select(Normalize.normText($"text").as("n")).as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("price extraction: dirty numeric formats parse to the same value") {
    val df = Seq("xx price $1,234.56", "yy price 1,234.56", "zz price 1234.56 usd",
      "no price here at all", "price garbage").toDF("text")
    val got = df.select(Normalize.price($"text")).as[Double].collect().toSeq
    assert(got == Seq(1234.56, 1234.56, 1234.56, 0.0, 0.0))
  }

  test("invariant: normalization never mutates the raw text column") {
    val pages = graft.fixtures.Fixture.pages(spark, 500)
    val before = pages.agg(expr("bit_xor(xxhash64(sha2(text, 256)))")).as[Long].collect()(0)
    val derived = pages.withColumn("norm", Normalize.normText($"text"))
      .withColumn("toks", Normalize.tokens($"text"))
      .withColumn("price", Normalize.price($"text"))
    val after = derived.agg(expr("bit_xor(xxhash64(sha2(text, 256)))")).as[Long].collect()(0)
    assert(before == after)
  }

  test("single-pass norm expression ≡ the regex-chain form on fixture corpus") {
    val pages = graft.fixtures.Fixture.pages(spark, 2000)
    val diff = pages.select(
        Normalize.normText($"text").as("fast"),
        Normalize.normTextRegex($"text").as("ref"))
      .where($"fast" =!= $"ref")
    assert(diff.count() == 0)
  }

  test("domain: normalized url host") {
    val got = Seq("https://Site3.Example.com/p/x?q=1").toDF("url")
      .select(Normalize.domain($"url")).as[String].collect()(0)
    assert(got == "site3.example.com")
  }
}
